"""Transformer parity vs reference StreamingTransformer (custom backend)."""

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax
import jax.numpy as jnp

from audiocraft_tpu.nn.transformer import (StreamingTransformer,
                                           create_sin_embedding)
from audiocraft_tpu.ckpt.torch_import import import_transformer


def _sd(mod):
    return {k: to_np(v) for k, v in mod.state_dict().items()}


def test_sin_embedding_matches():
    import torch
    ref_tr = ref_module("audiocraft.modules.transformer")
    positions = np.arange(20).reshape(1, -1, 1).astype(np.int64)
    ref = to_np(ref_tr.create_sin_embedding(to_torch(positions), 64))
    ours = np.asarray(create_sin_embedding(jnp.asarray(positions), 64))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("pos", ["sin", "rope"])
def test_transformer_forward_parity(causal, pos):
    import torch
    ref_tr = ref_module("audiocraft.modules.transformer")
    torch.manual_seed(5)
    d_model, heads, layers, T, B = 32, 4, 2, 12, 2
    ref = ref_tr.StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, dropout=0.0,
        custom=True, causal=causal, positional_embedding=pos)
    ref.eval()
    x = np.random.RandomState(0).randn(B, T, d_model).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(x)))

    ours = StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, causal=causal,
        positional_embedding=pos, norm_first=False, activation='relu')
    params = jax.tree.map(jnp.asarray, import_transformer(_sd(ref), layers))
    y, _ = ours(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5, rtol=1e-4)


def test_transformer_cross_attention_parity():
    import torch
    ref_tr = ref_module("audiocraft.modules.transformer")
    torch.manual_seed(6)
    d_model, heads, layers, T, B, Tc = 32, 4, 2, 10, 2, 7
    ref = ref_tr.StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, dropout=0.0,
        custom=True, causal=True, cross_attention=True)
    ref.eval()
    x = np.random.RandomState(1).randn(B, T, d_model).astype(np.float32)
    src = np.random.RandomState(2).randn(B, Tc, d_model).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(x), cross_attention_src=to_torch(src)))

    ours = StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, causal=True,
        cross_attention=True, norm_first=False, activation='relu')
    params = jax.tree.map(jnp.asarray, import_transformer(_sd(ref), layers))
    y, _ = ours(params, jnp.asarray(x), cross_attention_src=jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5, rtol=1e-4)

    # precomputed cross-KV path gives identical results
    cross_kv = ours.precompute_cross_kv(params, jnp.asarray(src))
    y2, _ = ours(params, jnp.asarray(x), cross_kv=cross_kv)
    np.testing.assert_allclose(np.asarray(y2), y_ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("pos", ["sin", "rope"])
def test_streaming_decode_equals_batch(pos):
    """Step-by-step cached decode must match the full batch forward.
    This is the core invariant the reference tests at
    tests/modules/test_transformer.py:38-48."""
    d_model, heads, layers, T, B = 32, 4, 2, 9, 2
    ours = StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, causal=True,
        positional_embedding=pos, norm_first=True, activation='gelu')
    params = ours.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, d_model))

    y_full, _ = ours(params, x)

    caches = ours.init_cache(B, T)
    outs = []
    for t in range(T):
        y_t, caches = ours(params, x[:, t:t + 1], caches=caches)
        outs.append(y_t)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_full),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("pos", ["sin", "rope"])
def test_streaming_decode_int8_kv_close_to_float(pos):
    """int8 KV-cache decode (the serving-batch bandwidth lever) tracks the
    float-cache decode within quantization noise, prefill included."""
    d_model, heads, layers, T, B = 32, 4, 2, 12, 2
    ours = StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, causal=True,
        positional_embedding=pos, norm_first=True, activation='gelu')
    params = ours.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, d_model))
    y_full, _ = ours(params, x)

    caches = ours.init_cache(B, T, kv_dtype='int8')
    assert caches[0].k.dtype == jnp.int8 and caches[0].k_scale is not None
    # prefill 5 steps at once, then step one at a time
    y0, caches = ours(params, x[:, :5], caches=caches)
    outs = [y0]
    for t in range(5, T):
        y_t, caches = ours(params, x[:, t:t + 1], caches=caches)
        outs.append(y_t)
    y_stream = jnp.concatenate(outs, axis=1)
    err = np.abs(np.asarray(y_stream) - np.asarray(y_full))
    ref_scale = np.abs(np.asarray(y_full)).mean()
    assert err.mean() / ref_scale < 0.02, (err.mean(), ref_scale)
    assert err.max() / ref_scale < 0.2, (err.max(), ref_scale)


def test_streaming_decode_with_past_context():
    d_model, heads, layers, T, B = 16, 2, 1, 12, 1
    ours = StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, causal=True,
        past_context=4, norm_first=True)
    params = ours.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, d_model))
    y_full, _ = ours(params, x)
    caches = ours.init_cache(B, T)
    outs = []
    for t in range(T):
        y_t, caches = ours(params, x[:, t:t + 1], caches=caches)
        outs.append(y_t)
    y_stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_full),
                               atol=1e-4, rtol=1e-4)


def test_streaming_decode_parity_vs_reference_streaming():
    """Our cached decode matches the reference's streaming() context decode."""
    import torch
    ref_tr = ref_module("audiocraft.modules.transformer")
    torch.manual_seed(8)
    d_model, heads, layers, T, B = 32, 4, 2, 8, 1
    ref = ref_tr.StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, dropout=0.0,
        custom=True, causal=True)
    ref.eval()
    x = np.random.RandomState(3).randn(B, T, d_model).astype(np.float32)
    outs_ref = []
    with torch.no_grad(), ref.streaming():
        for t in range(T):
            outs_ref.append(to_np(ref(to_torch(x[:, t:t + 1]))))
    y_ref = np.concatenate(outs_ref, axis=1)

    ours = StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, causal=True,
        norm_first=False, activation='relu')
    params = jax.tree.map(jnp.asarray, import_transformer(_sd(ref), layers))
    caches = ours.init_cache(B, T)
    outs = []
    for t in range(T):
        y_t, caches = ours(params, jnp.asarray(x[:, t:t + 1]), caches=caches)
        outs.append(y_t)
    y = np.concatenate([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(y, y_ref, atol=2e-5, rtol=1e-4)


def test_transformer_musicgen_config_parity():
    """The real MusicGen transformer shape: pre-norm, gelu, biasless FF/attn."""
    import torch
    ref_tr = ref_module("audiocraft.modules.transformer")
    torch.manual_seed(31)
    d_model, heads, layers, T, B = 64, 4, 3, 10, 2
    ref = ref_tr.StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, dropout=0.0,
        custom=True, causal=True, cross_attention=True, norm_first=True,
        bias_ff=False, bias_attn=False, activation=torch.nn.functional.gelu)
    ref.eval()
    x = np.random.RandomState(5).randn(B, T, d_model).astype(np.float32)
    src = np.random.RandomState(6).randn(B, 4, d_model).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(x), cross_attention_src=to_torch(src)))

    ours = StreamingTransformer(
        d_model=d_model, num_heads=heads, num_layers=layers, causal=True,
        cross_attention=True, norm_first=True, bias_ff=False, bias_attn=False,
        activation='gelu')
    params = jax.tree.map(jnp.asarray, import_transformer(_sd(ref), layers))
    y, _ = ours(params, jnp.asarray(x), cross_attention_src=jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-5, rtol=1e-4)

    # and the streaming decode still matches batch in this config
    caches = ours.init_cache(B, T)
    outs = []
    for t in range(T):
        y_t, caches = ours(params, jnp.asarray(x[:, t:t + 1]), caches=caches,
                           cross_attention_src=jnp.asarray(src))
        outs.append(np.asarray(y_t))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), y_ref,
                               atol=5e-5, rtol=1e-4)
