"""Fused SEANet encoder-stage Pallas kernel vs the XLA layer stack.

Runs in interpret mode on CPU (the compiled path is exercised on the real
chip by scripts/perf and the bench).  Parity must hold to bf16 tolerance
including the reflect-padded sequence edges.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.nn.seanet import SEANetEncoder
from audiocraft_tpu.ops.seanet_pallas import (StageSpec, fused_stage,
                                              nwc_input_conv,
                                              stage_params_from_tree)


def _xla_layers(enc, params, x_tc, lo, hi, dtype=jnp.bfloat16):
    """Run layers [lo, hi] through the XLA modules ([B,T,C] in/out)."""
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    y = jnp.swapaxes(x_tc, 1, 2)
    for i, (kind, mod) in enumerate(enc._layers()):
        if i < lo or i > hi:
            continue
        if kind == 'act':
            y = jax.nn.elu(y)
        else:
            y = mod(cast(params[f'layer{i}']), y.astype(dtype))
    return jnp.swapaxes(y, 1, 2)


def _rel_err(out, ref):
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    return d.max() / max(np.abs(np.asarray(ref, np.float32)).max(), 1e-6)


@pytest.mark.parametrize("stride", [4, 5, 8])
def test_fused_stage_parity(stride):
    """Interior stage (c_in = 128 = full lane tile) vs XLA, all strides."""
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=128,
                        n_residual_layers=1, ratios=(8, 5, 4, stride),
                        norm='none', lstm=0)
    params = enc.init(jax.random.PRNGKey(3))
    layers = enc._layers()
    down_ids = [i for i, (k, m) in enumerate(layers)
                if k == 'conv' and i > 0 and getattr(m, 'stride', 1) > 1]
    target = next(i for i in down_ids if layers[i][1].stride == stride)
    c = layers[target][1].in_channels
    spec = StageSpec(c_in=c, c_out=2 * c, stride=stride)
    layer_ids = [target - 2, target]
    if spec.c_in != spec.c_pad:
        pytest.skip("stage channels not a lane tile at this position")

    kp = stage_params_from_tree(params, spec, layer_ids)
    B, L = 2, 64 * stride * 4
    x = jnp.asarray(np.random.RandomState(0).randn(B, L, c) * 0.5,
                    jnp.bfloat16)
    out = fused_stage(x, kp, spec, tile=64, interpret=True)
    assert out is not None, "shape should be eligible"
    ref = _xla_layers(enc, params, x, layer_ids[0], layer_ids[-1])
    assert out.shape == ref.shape == (B, L // stride, spec.c_out)
    assert _rel_err(out, ref) < 2e-2
    assert _rel_err(out[:, :4], ref[:, :4]) < 2e-2     # reflect edges
    assert _rel_err(out[:, -4:], ref[:, -4:]) < 2e-2


def test_stage_a_padded_input_parity():
    """conv0 (NWC, lane-padded channels) + padded-input stage kernel ==
    XLA layers 0..3 — the production stage-A path."""
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=64,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='none', lstm=0)
    params = enc.init(jax.random.PRNGKey(5))
    spec = StageSpec(c_in=64, c_out=128, stride=4, input_padded=True)
    kp = stage_params_from_tree(params, spec, [1, 3])

    B, L = 2, 4 * 64 * 4
    x = jnp.asarray(np.random.RandomState(2).randn(B, 1, L) * 0.4,
                    jnp.bfloat16)
    a = nwc_input_conv(jnp.swapaxes(x, 1, 2),
                       jnp.asarray(params['layer0']['weight']),
                       jnp.asarray(params['layer0']['bias']), spec.c_pad)
    assert a.shape == (B, L, 128)
    assert np.asarray(a[..., 64:].astype(np.float32)).max() == 0.0
    out = fused_stage(a, kp, spec, tile=64, interpret=True)
    assert out is not None
    ref = _xla_layers(enc, params, jnp.swapaxes(x, 1, 2), 0, 3)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 2e-2
    assert _rel_err(out[:, :4], ref[:, :4]) < 2e-2
    assert _rel_err(out[:, -4:], ref[:, -4:]) < 2e-2


def test_fused_stage_ineligible_shapes():
    spec = StageSpec(c_in=128, c_out=256, stride=4)
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=128,
                        n_residual_layers=1, ratios=(8, 5, 4, 4), norm='none')
    params = enc.init(jax.random.PRNGKey(0))
    kp = stage_params_from_tree(params, spec, [1, 3])
    x = jnp.zeros((1, 30, 128), jnp.bfloat16)  # not divisible by stride
    assert fused_stage(x, kp, spec, interpret=True) is None
    # 64-lane input without the padded-input guarantee is ineligible
    spec64 = StageSpec(c_in=64, c_out=128, stride=4)
    assert fused_stage(jnp.zeros((1, 1024, 128), jnp.bfloat16),
                       stage_params_from_tree(params, spec, [1, 3]),
                       spec64, interpret=True) is None


def test_full_encoder_fused_prefix_parity():
    """encoder(..., fused_stages=2) == plain XLA encoder (bf16, interpret),
    at the production channel widths (64 -> 128 -> 256)."""
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=64,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='none', lstm=0)
    params = enc.init(jax.random.PRNGKey(1))
    bf16 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    p16 = bf16(params)
    x = jnp.asarray(np.random.RandomState(7).randn(2, 1, 640 * 8) * 0.3,
                    jnp.bfloat16)
    y_fused = enc(p16, x, fused_stages=2, interpret=True)
    y_ref = enc(p16, x)
    assert y_fused.shape == y_ref.shape
    assert _rel_err(y_fused, y_ref) < 3e-2


def test_mono_input_conv_parity():
    """Pallas conv0 kernel vs the XLA module conv (bf16, interpret)."""
    from audiocraft_tpu.ops.seanet_pallas import mono_input_conv
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=64,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='none', lstm=0)
    params = enc.init(jax.random.PRNGKey(9))
    mod0 = enc._layers()[0][1]
    p0 = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      params['layer0'])
    x = jnp.asarray(np.random.RandomState(4).randn(2, 1, 128 * 64) * 0.4,
                    jnp.bfloat16)
    out = mono_input_conv(x, p0['weight'], p0['bias'], tile_rows=16,
                          interpret=True)
    assert out is not None
    ref = mod0(p0, x)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 1e-2
    assert _rel_err(out[..., :8], ref[..., :8]) < 1e-2       # reflect edges
    assert _rel_err(out[..., -8:], ref[..., -8:]) < 1e-2

    # ineligible: length not a lane multiple
    assert mono_input_conv(jnp.zeros((1, 1, 100), jnp.bfloat16),
                           p0['weight'], p0['bias'], interpret=True) is None


def test_mono_input_conv_nondivisible_length():
    """T/128 not divisible by the tile: the padded grid still yields exact
    output (e.g. the production T=320000 -> R=2500 case)."""
    from audiocraft_tpu.ops.seanet_pallas import mono_input_conv
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=64,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='none', lstm=0)
    params = enc.init(jax.random.PRNGKey(11))
    mod0 = enc._layers()[0][1]
    p0 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params['layer0'])
    T = 128 * 25  # 25 rows: not divisible by 8
    x = jnp.asarray(np.random.RandomState(6).randn(1, 1, T) * 0.4,
                    jnp.bfloat16)
    out = mono_input_conv(x, p0['weight'], p0['bias'], tile_rows=16,
                          interpret=True)
    assert out is not None and out.shape == (1, 64, T)
    ref = mod0(p0, x)
    assert _rel_err(out, ref) < 1e-2
    assert _rel_err(out[..., -16:], ref[..., -16:]) < 1e-2


def test_banded_mono_conv_parity():
    """Banded-matmul conv0 kernel (v2, (B,C) grid) vs the XLA module conv
    (bf16, interpret), including the encoder conv0_kernel=True route."""
    from audiocraft_tpu.ops.seanet_pallas import banded_mono_conv
    from audiocraft_tpu.nn.conv import pad1d
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=64,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='none', lstm=0)
    params = enc.init(jax.random.PRNGKey(13))
    mod0 = enc._layers()[0][1]
    p0 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params['layer0'])
    T = 128 * 25  # R = 25: not a multiple of 8 (exercises scratch padding)
    x = jnp.asarray(np.random.RandomState(8).randn(2, 1, T) * 0.4,
                    jnp.bfloat16)
    xp = pad1d(x, (3, 3), mode='reflect')
    out = banded_mono_conv(xp, p0['weight'], p0['bias'], interpret=True)
    assert out is not None and out.shape == (2, 64, T)
    ref = mod0(p0, x)
    assert _rel_err(out, ref) < 1e-2
    assert _rel_err(out[..., :8], ref[..., :8]) < 1e-2       # reflect edges
    assert _rel_err(out[..., -8:], ref[..., -8:]) < 1e-2

    # ineligible: T not a lane multiple (would force a 1.3 GB slice copy)
    assert banded_mono_conv(jnp.zeros((1, 1, 106), jnp.bfloat16),
                            p0['weight'], p0['bias'], interpret=True) is None

    # full-encoder route falls back cleanly and stays numerically equal
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    y_k = enc(p16, x, conv0_kernel=True, interpret=True)
    y_ref = enc(p16, x)
    assert y_k.shape == y_ref.shape
    assert _rel_err(y_k, y_ref) < 3e-2


def test_conv0_kernel_with_fused_stages_does_not_double_apply():
    """conv0_kernel=True consumes layer0; the fused stage kernel (which runs
    its own input conv on the raw signal) must then be skipped rather than
    re-applying layer0 to the 64-channel output (regression: trace-time
    shape crash)."""
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=64,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='none', lstm=0)
    params = enc.init(jax.random.PRNGKey(17))
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 1, 128 * 20) * 0.3,
                    jnp.bfloat16)
    y = enc(p16, x, conv0_kernel=True, fused_stages=2, interpret=True)
    y_ref = enc(p16, x)
    assert y.shape == y_ref.shape
    assert _rel_err(y, y_ref) < 3e-2
