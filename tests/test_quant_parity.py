"""RVQ encode/decode parity vs the reference torch implementation."""

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax
import jax.numpy as jnp

from audiocraft_tpu.quant.vq import ResidualVectorQuantizer, RVQState
from audiocraft_tpu.ckpt.torch_import import import_rvq


def _make_ref_rvq(dimension, n_q, bins, seed=0):
    import torch
    ref_vq = ref_module("audiocraft.quantization.vq")
    torch.manual_seed(seed)
    ref = ref_vq.ResidualVectorQuantizer(
        dimension=dimension, n_q=n_q, bins=bins, kmeans_init=False)
    ref.eval()
    # give the random-uniform codebooks realistic scale relative to inputs
    return ref


def _state_from_ref(ref) -> RVQState:
    sd = {k: to_np(v) for k, v in ref.state_dict().items()}
    raw = import_rvq(sd, ref.n_q)
    return RVQState(**{k: jnp.asarray(v) for k, v in raw.items()})


@pytest.mark.parametrize("dimension,n_q,bins,T", [
    (32, 4, 64, 50), (16, 8, 100, 37), (128, 4, 2048, 75),
])
def test_rvq_encode_decode_parity(dimension, n_q, bins, T):
    import torch
    ref = _make_ref_rvq(dimension, n_q, bins)
    x = np.random.RandomState(0).randn(2, dimension, T).astype(np.float32)
    with torch.no_grad():
        codes_ref = to_np(ref.encode(to_torch(x)))
        dec_ref = to_np(ref.decode(to_torch(codes_ref)))

    ours = ResidualVectorQuantizer(dimension=dimension, n_q=n_q, bins=bins,
                                   kmeans_init=False)
    state = _state_from_ref(ref)
    codes = np.asarray(ours.encode(state, jnp.asarray(x)))
    assert codes.shape == codes_ref.shape
    match = (codes == codes_ref).mean()
    assert match == 1.0, f"token match {match:.4f} != 1.0"

    dec = np.asarray(ours.decode(state, jnp.asarray(codes)))
    np.testing.assert_allclose(dec, dec_ref, atol=1e-5, rtol=1e-5)

    dec_oh = np.asarray(ours.decode_one_hot(state, jnp.asarray(codes)))
    np.testing.assert_allclose(dec_oh, dec_ref, atol=1e-4, rtol=1e-4)


def test_rvq_fused_kernel_interpret_matches_scan():
    from audiocraft_tpu.ops.rvq_pallas import rvq_encode_fused, _xla_fallback
    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (300, 48))
    embeds = jax.random.normal(jax.random.PRNGKey(1), (4, 200, 48))
    c1 = np.asarray(_xla_fallback(flat, embeds))
    c2 = np.asarray(rvq_encode_fused(flat, embeds, force_pallas=True,
                                     interpret=True, block_rows=128))
    assert (c1 == c2).all()


def test_rvq_forward_eval_matches_reference_quantized_output():
    import torch
    dimension, n_q, bins, T = 32, 4, 64, 40
    ref = _make_ref_rvq(dimension, n_q, bins)
    x = np.random.RandomState(5).randn(3, dimension, T).astype(np.float32)
    with torch.no_grad():
        res_ref = ref(to_torch(x), frame_rate=50)

    ours = ResidualVectorQuantizer(dimension=dimension, n_q=n_q, bins=bins,
                                   kmeans_init=False)
    state = _state_from_ref(ref)
    res, _ = ours.forward(state, jnp.asarray(x), frame_rate=50,
                          key=jax.random.PRNGKey(0), training=False)
    np.testing.assert_allclose(np.asarray(res.x), to_np(res_ref.x),
                               atol=1e-5, rtol=1e-5)
    assert (np.asarray(res.codes) == to_np(res_ref.codes)).all()
    np.testing.assert_allclose(float(res.bandwidth), float(res_ref.bandwidth),
                               rtol=1e-6)


def test_ema_training_step_matches_reference():
    """One EMA update step (no kmeans, no dead-code expiry) must match torch."""
    import torch
    dimension, n_q, bins, T = 16, 2, 32, 64
    ref_vq = ref_module("audiocraft.quantization.vq")
    torch.manual_seed(3)
    ref = ref_vq.ResidualVectorQuantizer(
        dimension=dimension, n_q=n_q, bins=bins, kmeans_init=False,
        threshold_ema_dead_code=0)
    ref.train()
    x = np.random.RandomState(7).randn(4, dimension, T).astype(np.float32)

    ours = ResidualVectorQuantizer(dimension=dimension, n_q=n_q, bins=bins,
                                   kmeans_init=False, threshold_ema_dead_code=0,
                                   decay=0.99)
    state = _state_from_ref(ref)

    with torch.no_grad():
        ref(to_torch(x), frame_rate=50)
    sd_after = {k: to_np(v) for k, v in ref.state_dict().items()}

    _, new_state = ours.forward(state, jnp.asarray(x), frame_rate=50,
                                key=jax.random.PRNGKey(0), training=True)
    for q in range(n_q):
        base = f"vq.layers.{q}._codebook"
        np.testing.assert_allclose(
            np.asarray(new_state.cluster_size[q]), sd_after[f"{base}.cluster_size"],
            atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(new_state.embed_avg[q]), sd_after[f"{base}.embed_avg"],
            atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(new_state.embed[q]), sd_after[f"{base}.embed"],
            atol=1e-4, rtol=1e-4)


def test_effective_expiry_resurrects_dead_codes():
    """The reference's literal expiry is inert within a step (embed is
    overwritten by embed_normalized right after, core_vq.py:205-217); the
    'effective' mode actually replaces dead codes.  On clusterable data the
    effective mode must keep more of the codebook alive."""
    rng = np.random.RandomState(0)
    rvq = ResidualVectorQuantizer(dimension=8, n_q=1, bins=32,
                                  kmeans_init=False, decay=0.8,
                                  threshold_ema_dead_code=2.0)
    # data drawn from 16 well-separated clusters
    centers = rng.randn(16, 8).astype(np.float32) * 5

    def run(expiry):
        state = rvq.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        for step in range(30):
            batch = centers[rng.randint(0, 16, 256)] \
                + 0.05 * rng.randn(256, 8).astype(np.float32)
            x = jnp.asarray(batch.T[None])  # [1, D, T]
            key, sub = jax.random.split(key)
            _, state = rvq.forward(state, x, frame_rate=1, key=sub,
                                   training=True, expiry=expiry)
        codes = rvq.encode(state, jnp.asarray(centers.T[None]))
        return len(np.unique(np.asarray(codes)))

    used_ref = run('reference')
    used_eff = run('effective')
    assert used_eff >= used_ref
    assert used_eff >= 8, f"effective expiry should keep codes alive, got {used_eff}"
