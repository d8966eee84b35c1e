"""Training steps: EnCodec reconstruction (with distributed EMA codebooks) and
LM cross-entropy — global-view jitted code that shards over a mesh.

This rebuilds, minimally, the role of the reference's stripped
``audiocraft/solvers`` (SURVEY.md §7 M7): enough of a training loop to
exercise the distributed EMA path for real.  Under a ``('data',)`` mesh with
the batch sharded, XLA turns the RVQ one-hot count / embed-sum reductions into
all-reduces over ICI — the TPU-native equivalent of the reference's
local-EMA + broadcast-at-init/expiry design (core_vq.py:140,158,205-217).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import optax

from ..codec.encodec import EncodecModel
from ..lm.model import LMModel


def encodec_loss(model: EncodecModel, grad_params: dict, ema_state, x: jax.Array,
                 key: jax.Array, commit_weight: float = 1.0,
                 expiry: str = 'effective',
                 compute_dtype: tp.Optional[str] = None
                 ) -> tp.Tuple[jax.Array, tp.Tuple]:
    """Reconstruction (L1 + L2) + commitment penalty.  The quantizer state is
    a non-differentiable side state updated by EMA inside the forward.

    Training defaults to expiry='effective' (dead codes resurrected): the
    reference's literal expiry is a no-op within a step (core_vq.py:205-217
    overwrites the replaced rows), which we found collapses codebook 0 when
    training from scratch on small corpora."""
    params = dict(grad_params)
    params['quantizer'] = ema_state
    q_res, new_params = model.forward(params, x, key=key, training=True,
                                      expiry=expiry,
                                      compute_dtype=compute_dtype)
    recon = q_res.x
    l1 = jnp.mean(jnp.abs(recon - x))
    l2 = jnp.mean(jnp.square(recon - x))
    loss = l1 + l2 + commit_weight * q_res.penalty
    return loss, (new_params['quantizer'], l1, l2, q_res.penalty)


def make_encodec_train_step(model: EncodecModel,
                            optimizer: optax.GradientTransformation,
                            compute_dtype: tp.Optional[str] = None):
    """Returns jittable ``step(grad_params, ema_state, opt_state, x, key)``.

    Shard ``x`` over the 'data' mesh axis and keep params replicated; GSPMD
    handles gradient and EMA-statistic all-reduces.

    ``compute_dtype='bfloat16'`` = mixed precision: master params, optimizer
    state, losses, and the RVQ EMA stay fp32; the SEANet conv forward and
    backward run bf16 (the MXU-native dtype).  bf16's 8-bit mantissa adds
    noise ~1e-2 relative on the reconstruction — far below the codec's own
    quantization error — and the gradient path upcasts at the fp32 leaves,
    so optimizer math is exact.
    """

    def step(grad_params, ema_state, opt_state, x, key):
        (loss, (new_ema, l1, l2, penalty)), grads = jax.value_and_grad(
            encodec_loss, argnums=1, has_aux=True)(
                model, grad_params, ema_state, x, key,
                compute_dtype=compute_dtype)
        updates, opt_state = optimizer.update(grads, opt_state, grad_params)
        grad_params = optax.apply_updates(grad_params, updates)
        metrics = {'loss': loss, 'l1': l1, 'l2': l2, 'penalty': penalty}
        return grad_params, new_ema, opt_state, metrics

    return step


def make_encodec_gan_train_step(model: EncodecModel, disc,
                                g_optimizer: optax.GradientTransformation,
                                d_optimizer: optax.GradientTransformation,
                                balancer=None,
                                commit_weight: float = 1.0,
                                expiry: str = 'effective',
                                compute_dtype: tp.Optional[str] = None):
    """Full EnCodec training recipe: reconstruction + multi-scale mel +
    hinge adversarial + feature matching, combined by the gradient balancer,
    against the MS-STFT discriminator (the role of the upstream solvers +
    losses + adversarial packages the reference fork stripped).

    Per step: (1) the discriminator updates on hinge(real, stop-grad(fake));
    (2) the generator's balanced cotangent is assembled at the
    reconstruction (one cheap grad per loss w.r.t. the waveform, NO
    generator backward each — adv + feature-matching share one
    discriminator forward via a grouped vjp) and pulled back through the
    generator with ONE vjp that carries the commitment penalty's cotangent
    alongside, so the generator runs exactly one forward and one backward
    per step.

    Returns jittable ``step(g_params, ema_state, g_opt, d_params, d_opt,
    bal_state, x, key) -> (g_params, ema_state, g_opt, d_params, d_opt,
    bal_state, metrics)``.
    """
    from ..adversarial import (feature_matching_loss, hinge_d_loss,
                               hinge_g_loss)
    from ..losses import (Balancer, MultiScaleMelSpectrogramLoss,
                          balanced_cotangent)

    if balancer is None:
        # EnCodec paper effort shares: adversarial dominates, spectra and
        # time-domain reconstruction share the rest
        balancer = Balancer(weights={'l1': 0.1, 'l2': 1.0, 'msspec': 3.0,
                                     'adv': 4.0, 'feat': 4.0})
    msspec = MultiScaleMelSpectrogramLoss(sample_rate=model.sample_rate)

    def recon_fn(grad_params, ema_state, x, key):
        params = dict(grad_params)
        params['quantizer'] = ema_state
        q_res, new_params = model.forward(params, x, key=key, training=True,
                                          expiry=expiry,
                                          compute_dtype=compute_dtype)
        # recon AND penalty are differentiable outputs of the same forward:
        # one vjp pulls back both (penalty does not flow through recon, so
        # it rides the generator backward as a second cotangent instead of
        # costing its own forward+backward).
        return (q_res.x, q_res.penalty), new_params['quantizer']

    def d_loss_fn(d_params, x, recon):
        real_logits, _ = disc(d_params, x)
        fake_logits, _ = disc(d_params, recon)
        return hinge_d_loss(real_logits, fake_logits)

    def step(g_params, ema_state, g_opt_state, d_params, d_opt_state,
             bal_state, x, key):
        # ---- generator forward (once) --------------------------------
        (recon, penalty), g_vjp, new_ema = jax.vjp(
            lambda gp: recon_fn(gp, ema_state, x, key), g_params,
            has_aux=True)

        # ---- discriminator update on stop-grad(recon) ----------------
        recon_sg = jax.lax.stop_gradient(recon)
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params, x,
                                                        recon_sg)
        d_updates, d_opt_state = d_optimizer.update(d_grads, d_opt_state,
                                                    d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        # ---- balanced generator cotangent at the waveform ------------
        real_logits, real_feats = disc(d_params, x)
        real_feats = jax.lax.stop_gradient(real_feats)

        def disc_group(r):
            # adv + feat share one discriminator forward (grouped vjp)
            fake_logits, fake_feats = disc(d_params, r)
            return {'adv': hinge_g_loss(fake_logits),
                    'feat': feature_matching_loss(real_feats, fake_feats)}

        loss_fns = {
            'l1': lambda r: jnp.mean(jnp.abs(r - x)),
            'l2': lambda r: jnp.mean(jnp.square(r - x)),
            'msspec': lambda r: msspec(r, x),
        }
        cot, bal_state, metrics = balanced_cotangent(
            balancer, recon, loss_fns, bal_state, grouped_fns=(disc_group,))
        g_grads = g_vjp((cot, jnp.asarray(commit_weight, penalty.dtype)))[0]
        g_updates, g_opt_state = g_optimizer.update(g_grads, g_opt_state,
                                                    g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        metrics = {**metrics, 'd_loss': d_loss, 'penalty': penalty}
        return (g_params, new_ema, g_opt_state, d_params, d_opt_state,
                bal_state, metrics)

    return step


def lm_loss(model: LMModel, params: dict, codes: jax.Array,
            condition_tensors: dict,
            compute_dtype: tp.Optional[str] = None
            ) -> tp.Tuple[jax.Array, dict]:
    """Masked cross-entropy over the delay-pattern-aligned logits
    (the role of the stripped solvers' CE, cf. lm.py compute_predictions).

    With ``compute_dtype`` the transformer forward/backward runs in that
    dtype (params cast in-graph; fp32 master copies keep the gradients and
    optimizer exact) while the softmax/CE reduction stays fp32.
    """
    if compute_dtype is not None:
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        params = cast(params)
        condition_tensors = {
            name: (cast(c), m) for name, (c, m) in condition_tensors.items()}
    out = model.compute_predictions(params, codes, condition_tensors)
    logits = jnp.where(out.mask[..., None],
                       jnp.nan_to_num(out.logits), 0.0).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jax.nn.one_hot(codes, model.card, dtype=logp.dtype)
    ce = -jnp.sum(logp * tgt, axis=-1)  # [B, K, T]
    mask = out.mask.astype(logp.dtype)
    loss = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1)
    return loss, {'ce': loss}


def make_lm_train_step(model: LMModel, optimizer: optax.GradientTransformation,
                       compute_dtype: tp.Optional[str] = None,
                       grad_accum: int = 1):
    """``compute_dtype='bfloat16'`` = mixed-precision CE training (see
    :func:`make_encodec_train_step`; same fp32-master / bf16-compute split).

    ``grad_accum=A`` splits the batch into A sequential microbatches inside
    one compiled step (``lax.scan``), averaging the gradients — activation
    memory drops A× at the same effective batch.  This is THE way to scale
    effective batch at 30 s segments, where activations bound the per-pass
    batch at 4 and per-layer remat measured slower (PERF.md).  Exact: the
    delay-pattern CE mask is batch-independent, so the mean of microbatch
    losses equals the full-batch loss (up to fp reduction order).  LM-only:
    the EnCodec step's in-forward EMA state update is not a mean over
    microbatches, so accumulation there would change semantics.
    """
    def grads_of(params, codes, condition_tensors):
        return jax.value_and_grad(
            lm_loss, argnums=1, has_aux=True)(model, params, codes,
                                              condition_tensors,
                                              compute_dtype=compute_dtype)

    def step(params, opt_state, codes, condition_tensors):
        loss, grads = _accumulated_grads(grads_of, params, codes,
                                         condition_tensors, grad_accum)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {'loss': loss, 'ce': loss}

    return step


def _accumulated_grads(grads_of, params, codes, condition_tensors,
                       grad_accum: int):
    """Mean loss + gradients over ``grad_accum`` sequential microbatches
    (``lax.scan``; one pass when grad_accum == 1)."""
    if grad_accum == 1:
        (loss, _), grads = grads_of(params, codes, condition_tensors)
        return loss, grads

    B = codes.shape[0]
    assert B % grad_accum == 0, (B, grad_accum)
    mb = B // grad_accum

    def split(t):
        return t.reshape(grad_accum, mb, *t.shape[1:])

    xs = (split(codes),
          {name: (split(c), split(m))
           for name, (c, m) in condition_tensors.items()})

    def body(carry, x):
        gsum, lsum = carry
        (l, _), g = grads_of(params, x[0], x[1])
        return (jax.tree.map(jnp.add, gsum, g), lsum + l), ()

    # Accumulate in the gradient's own dtype (= params dtype): an fp32
    # accumulator for bf16 masters costs 2x params bytes and OOMed
    # MusicGen-medium on one chip (26.7 G vs 15.75 G HBM, PERF.md); fp32
    # params keep an fp32 accumulator, so the exactness tests are unchanged.
    zeros = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), params)
    (gsum, lsum), _ = jax.lax.scan(body, (zeros, jnp.zeros(())), xs)
    return lsum / grad_accum, jax.tree.map(lambda g: g / grad_accum, gsum)


def make_lm_train_step_dp(model: LMModel,
                          optimizer: optax.GradientTransformation,
                          mesh, axis: str = 'data',
                          compute_dtype: tp.Optional[str] = None,
                          grad_accum: int = 1):
    """Explicit-SPMD (``shard_map``) data-parallel LM train step.

    The global-view GSPMD step (:func:`make_lm_train_step`) cannot partition
    a ``pallas_call``, so flash-attention training — the only route that
    compiles at 30 s segments (PERF.md) — is single-device there.  This
    variant shards the batch over ``mesh[axis]`` with ``shard_map``: every
    device runs the full per-shard forward/backward (the Pallas kernel sees
    only its local microbatch), gradients and loss ``pmean`` over ICI, and
    the optimizer update runs replicated.  ``grad_accum`` composes: each
    shard scans its local microbatches, so the effective batch is
    ``n_devices × per_shard_batch`` per optimizer step.

    Exact vs the global-view step (up to fp reduction order): the
    delay-pattern CE mask is batch-independent, so per-shard mask sums are
    equal and the mean of shard losses equals the global-batch loss.

    Call with ``codes``/``condition_tensors`` sharded ``P(axis)`` and
    params/opt_state replicated; returns replicated params/opt_state.
    """
    import dataclasses

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if model.attn_kernel == 'auto':
        # inside the shard_map body the kernel sees only its own shard, so
        # 'auto' drops the single-device requirement (attention_pallas)
        model = dataclasses.replace(model, attn_kernel='auto_local')

    def grads_of(params, codes, condition_tensors):
        return jax.value_and_grad(
            lm_loss, argnums=1, has_aux=True)(model, params, codes,
                                              condition_tensors,
                                              compute_dtype=compute_dtype)

    def local_step(params, opt_state, codes, condition_tensors):
        loss, grads = _accumulated_grads(grads_of, params, codes,
                                         condition_tensors, grad_accum)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {'loss': loss, 'ce': loss}

    return shard_map(local_step, mesh=mesh,
                     in_specs=(P(), P(), P(axis), P(axis)),
                     out_specs=(P(), P(), P()),
                     check_vma=False)
