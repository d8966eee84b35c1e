"""Mixed-precision (bf16-compute / fp32-master) training steps.

The forward/backward runs in bf16 (MXU-native); master params, optimizer
state, losses, and the RVQ EMA statistics stay fp32.  These tests pin the
contract: dtypes preserved, loss tracks the fp32 step closely, training
still converges.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from audiocraft_tpu.builders import (get_debug_compression_model,
                                     init_debug_compression_model)
from audiocraft_tpu.dist.train import (make_encodec_train_step,
                                       make_lm_train_step)


def _all_dtypes(tree):
    return {leaf.dtype for leaf in jax.tree.leaves(tree)
            if hasattr(leaf, 'dtype')}


def test_encodec_bf16_step_matches_fp32_closely():
    model = get_debug_compression_model(32000)
    params = init_debug_compression_model(model, jax.random.PRNGKey(0))
    ema0 = params.pop('quantizer')
    opt = optax.adam(3e-4)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 1, 16000).astype(np.float32) * 0.3)

    losses = {}
    for dtype in (None, 'bfloat16'):
        step = jax.jit(make_encodec_train_step(model, opt,
                                               compute_dtype=dtype))
        p, ema, s = params, ema0, opt.init(params)
        for i in range(3):
            p, ema, s, metrics = step(p, ema, s, x, jax.random.PRNGKey(i))
        losses[dtype] = float(metrics['loss'])
        # master params and EMA statistics stay fp32 under bf16 compute
        assert np.dtype('float32') in _all_dtypes(p)
        assert jnp.dtype(jnp.bfloat16) not in _all_dtypes(p)
        assert jnp.dtype(jnp.bfloat16) not in _all_dtypes(ema)
        assert np.isfinite(losses[dtype])
    # bf16 noise is ~1e-2 relative on this loss, far under its magnitude
    assert abs(losses['bfloat16'] - losses[None]) < 0.05 * abs(losses[None])


def test_lm_bf16_step_matches_fp32_closely():
    from audiocraft_tpu.builders import get_debug_musicgen_lm

    lm, provider = get_debug_musicgen_lm()
    params = lm.init(jax.random.PRNGKey(1))
    cond_params = provider.init(jax.random.PRNGKey(2))
    cond = provider.as_dict['description']
    tokens = cond.tokenize(["an upbeat tune", "slow sad strings"])
    c, m = cond(cond_params['description'], tokens)
    condition_tensors = {'description': (c, m)}
    codes = jnp.asarray(np.random.RandomState(3)
                        .randint(0, lm.card, size=(2, lm.n_q, 12)))
    opt = optax.adamw(1e-3)

    losses = {}
    for dtype in (None, 'bfloat16'):
        step = jax.jit(make_lm_train_step(lm, opt, compute_dtype=dtype))
        p, s = params, opt.init(params)
        first = None
        for _ in range(4):
            p, s, metrics = step(p, s, codes, condition_tensors)
            first = first if first is not None else float(metrics['loss'])
        losses[dtype] = (first, float(metrics['loss']))
        assert jnp.dtype(jnp.bfloat16) not in _all_dtypes(p)
        assert np.isfinite(losses[dtype][1])
        # CE decreases over a few steps in either dtype
        assert losses[dtype][1] < losses[dtype][0]
    f32, bf16 = losses[None], losses['bfloat16']
    assert abs(bf16[0] - f32[0]) < 0.02 * abs(f32[0])


def test_lm_grad_accum_matches_full_batch():
    """grad_accum=A microbatch accumulation is exact: same params and loss
    as the single full-batch step (the delay-pattern CE mask is
    batch-independent, so the mean of microbatch losses == batch loss)."""
    from audiocraft_tpu.builders import get_debug_musicgen_lm

    lm, provider = get_debug_musicgen_lm()
    params = lm.init(jax.random.PRNGKey(1))
    cond_params = provider.init(jax.random.PRNGKey(2))
    cond = provider.as_dict['description']
    tokens = cond.tokenize(["a", "b", "c", "d"])
    c, m = cond(cond_params['description'], tokens)
    condition_tensors = {'description': (c, m)}
    codes = jnp.asarray(np.random.RandomState(3)
                        .randint(0, lm.card, size=(4, lm.n_q, 12)))
    # SGD: the update is linear in the gradients, so param agreement bounds
    # the gradient difference directly (adam would amplify the fp-reduction
    # noise of near-zero grads into full +/-lr sign flips).
    opt = optax.sgd(1e-2)

    out = {}
    for accum in (1, 2, 4):
        step = jax.jit(make_lm_train_step(lm, opt, grad_accum=accum))
        p, s, metrics = step(params, opt.init(params), codes,
                             condition_tensors)
        out[accum] = (p, float(metrics['loss']))
    for accum in (2, 4):
        np.testing.assert_allclose(out[accum][1], out[1][1], rtol=1e-5)
        for a, b in zip(jax.tree.leaves(out[accum][0]),
                        jax.tree.leaves(out[1][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=2e-4)


def test_encodec_forward_compute_dtype_keeps_quantizer_fp32():
    """forward(compute_dtype=bf16): EMA update still happens in fp32 and the
    reconstructed waveform comes back fp32."""
    model = get_debug_compression_model(32000)
    params = init_debug_compression_model(model, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(2, 1, 8000).astype(np.float32) * 0.3)
    q_res, new_params = model.forward(params, x, key=jax.random.PRNGKey(5),
                                      training=True,
                                      compute_dtype=jnp.bfloat16)
    assert q_res.x.dtype == jnp.float32
    assert q_res.x.shape == x.shape
    assert jnp.dtype(jnp.bfloat16) not in _all_dtypes(new_params['quantizer'])
    # the EMA state moved (training side effect preserved under bf16)
    before = jax.tree.leaves(params['quantizer'])
    after = jax.tree.leaves(new_params['quantizer'])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))
