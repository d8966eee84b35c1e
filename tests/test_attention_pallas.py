"""Fused (flash) attention wrapper: exactness of the padding/masking
adaptation and the model-level routing.

The Mosaic kernel itself runs under the TPU interpreter on CPU
(pltpu.force_tpu_interpret_mode via attention_pallas.INTERPRET); the
compiled path is measured on the real chip (scripts/perf_attention.py,
PERF.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.ops import attention_pallas
from audiocraft_tpu.ops.attention_pallas import _xla_attention, fused_attention


@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setattr(attention_pallas, 'INTERPRET', True)


def _qkv(B, T, H, D, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize('causal', [True, False])
@pytest.mark.parametrize('T', [128, 130, 250])
def test_fused_matches_xla(interpret_kernel, causal, T):
    """Ragged T (pad + causal or segment masking) and padded head_dim must be
    exact vs the einsum reference."""
    q, k, v = _qkv(2, T, 2, 32)
    out = fused_attention(q, k, v, causal=causal)
    ref = _xla_attention(q, k, v, causal=causal,
                         sm_scale=1.0 / np.sqrt(32))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_grad_matches_xla(interpret_kernel):
    q, k, v = _qkv(1, 130, 2, 32, seed=3)

    def loss(fn, q, k, v):
        return (fn(q, k, v) * jnp.arange(32)).sum()

    from jax.experimental.pallas import tpu as pltpu

    fused = lambda q, k, v: fused_attention(q, k, v, causal=True)
    ref = lambda q, k, v: _xla_attention(q, k, v, causal=True,
                                         sm_scale=1.0 / np.sqrt(32))
    with pltpu.force_tpu_interpret_mode():  # covers the flash-VJP bwd kernel
        g_f = jax.grad(lambda *a: loss(fused, *a), argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(lambda *a: loss(ref, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_auto_routing(interpret_kernel):
    from audiocraft_tpu.ops.attention_pallas import (AUTO_MIN_SEQ,
                                                     resolve_kernel_route)
    assert resolve_kernel_route('auto', AUTO_MIN_SEQ)
    assert not resolve_kernel_route('auto', AUTO_MIN_SEQ - 1)
    assert resolve_kernel_route(True, 2)
    assert not resolve_kernel_route(False, 10 * AUTO_MIN_SEQ)


def test_auto_routing_off_tpu_without_interpret():
    from audiocraft_tpu.ops.attention_pallas import (AUTO_MIN_SEQ,
                                                     resolve_kernel_route)
    # on CPU (no interpreter) 'auto' must keep the XLA path
    assert not resolve_kernel_route('auto', 4 * AUTO_MIN_SEQ)


def test_xla_fallback_off_tpu():
    """Without INTERPRET on CPU the wrapper must route to plain XLA."""
    q, k, v = _qkv(1, 64, 2, 16)
    out = fused_attention(q, k, v, causal=True)
    ref = _xla_attention(q, k, v, causal=True, sm_scale=1.0 / np.sqrt(16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def _debug_conds(B, dim, seed=1):
    rng = np.random.RandomState(seed)
    cond = jnp.asarray(rng.randn(B, 3, dim).astype(np.float32))
    return {'description': (cond, jnp.ones((B, 3), jnp.int32))}


def test_lm_forward_routes_kernel(interpret_kernel):
    """LMModel(attn_kernel=True) training-path logits match the einsum path
    (full-sequence causal self-attention routes through the kernel)."""
    import dataclasses
    from audiocraft_tpu.builders import get_debug_musicgen_lm

    lm, _ = get_debug_musicgen_lm()
    params = lm.init(jax.random.PRNGKey(0))
    B, K, T = 2, lm.n_q, 9
    codes = jnp.asarray(np.random.RandomState(0).randint(
        0, lm.card, size=(B, K, T)), jnp.int32)
    conds = _debug_conds(B, lm.dim)

    base = lm.compute_predictions(params, codes, conds)
    lm_k = dataclasses.replace(lm, attn_kernel=True)
    fast = lm_k.compute_predictions(params, codes, conds)
    np.testing.assert_allclose(np.asarray(fast.logits),
                               np.asarray(base.logits), rtol=2e-4, atol=2e-4)


def test_magnet_noncausal_routes_kernel(interpret_kernel):
    """Non-causal full-sequence attention (MAGNeT stage 0: attn_mask=None)
    is exact through the segment-id padding path at the model level."""
    import dataclasses
    from audiocraft_tpu.cond.fuser import ConditionFuser
    from audiocraft_tpu.lm.magnet import MagnetLMModel
    from audiocraft_tpu.patterns import DelayedPatternProvider

    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    lm = MagnetLMModel(pattern_provider=DelayedPatternProvider(4),
                       fuser=fuser, n_q=4, card=64, dim=16, num_heads=4,
                       num_layers=2, cross_attention=True, causal=False,
                       norm_first=True)
    params = lm.init(jax.random.PRNGKey(0))
    B, K, T = 1, lm.n_q, 9
    seq = jnp.asarray(np.random.RandomState(0).randint(
        0, lm.card, size=(B, K, T)), jnp.int32)
    conds = _debug_conds(B, lm.dim)

    base, _ = lm.forward(params, seq, conds)          # stage-0 mask is None
    lm_k = dataclasses.replace(lm, attn_kernel=True)
    fast, _ = lm_k.forward(params, seq, conds)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
    # banded stages (attn_mask set) must stay on the einsum path: identical
    mask = lm.stage_attn_mask(1, T)
    a, _ = lm.forward(params, seq, conds, attn_mask=mask)
    b, _ = lm_k.forward(params, seq, conds, attn_mask=mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
