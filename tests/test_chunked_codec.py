"""Single-chip chunked codec (codec/chunked.py): exact vs the monolithic
encode/decode on CPU.  This is the long-form memory path (720 s decode OOMs
a single 16 GB chip as one XLA program — PERF.md round-2f)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.codec.chunked import chunked_decode, chunked_encode
from audiocraft_tpu.codec.encodec import EncodecModel
from audiocraft_tpu.nn.seanet import SEANetDecoder, SEANetEncoder
from audiocraft_tpu.quant.vq import ResidualVectorQuantizer


def _model(lstm=2, causal=False, n_filters=8):
    enc = SEANetEncoder(channels=1, dimension=32, n_filters=n_filters,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='weight_norm', lstm=lstm, causal=causal)
    dec = SEANetDecoder(channels=1, dimension=32, n_filters=n_filters,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='weight_norm', lstm=lstm, causal=causal)
    q = ResidualVectorQuantizer(dimension=32, n_q=4, bins=64,
                                kmeans_init=False)
    return EncodecModel(encoder=enc, decoder=dec, quantizer=q,
                        frame_rate=50, sample_rate=32000, channels=1,
                        causal=causal)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t_f", [97, 120])
def test_chunked_decode_matches_whole(causal, t_f):
    model = _model(causal=causal)
    params = model.init(jax.random.PRNGKey(0))
    codes = jnp.asarray(np.random.RandomState(3).randint(
        0, 64, (2, 4, t_f)), jnp.int32)
    ref = model.decode(params, codes)
    out = chunked_decode(model, params, codes, chunk_frames=40)
    assert out.shape == ref.shape
    # exact to float rounding (XLA transposed-conv blocking varies with
    # spatial length — same contract as dist/pod.pod_decode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=0)


def test_chunked_decode_short_falls_back():
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    codes = jnp.asarray(np.random.RandomState(0).randint(
        0, 64, (1, 4, 30)), jnp.int32)
    ref = model.decode(params, codes)
    out = chunked_decode(model, params, codes, chunk_frames=1500)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("per_timestep", [False, True])
def test_chunked_decode_stereo(per_timestep):
    from audiocraft_tpu.codec.stereo import InterleaveStereoCompressionModel
    mono = _model()
    model = InterleaveStereoCompressionModel(mono, per_timestep=per_timestep)
    params = model.init(jax.random.PRNGKey(0))
    t = 180 if per_timestep else 90  # stereo per-timestep doubles T
    codes = jnp.asarray(np.random.RandomState(5).randint(
        0, 64, (1, model.num_codebooks, t)), jnp.int32)
    ref = model.decode(params, codes)
    out = chunked_decode(model, params, codes, chunk_frames=40)
    assert out.shape == ref.shape and out.shape[1] == 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=0)


@pytest.mark.parametrize("causal", [False, True])
def test_chunked_encode_token_exact(causal):
    model = _model(causal=causal)
    params = model.init(jax.random.PRNGKey(0))
    hop = model.encoder.hop_length
    T = hop * 103  # hop-multiple: exact contract
    x = jnp.asarray(np.random.RandomState(1).randn(2, 1, T)
                    .astype(np.float32) * 0.3)
    ref, _ = model.encode(params, x)
    codes, scale = chunked_encode(model, params, x, chunk_frames=40)
    assert scale is None
    assert codes.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref))


def test_chunked_encode_ragged_length_pads():
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    hop = model.encoder.hop_length
    T = hop * 55 + 17
    x = jnp.asarray(np.random.RandomState(2).randn(1, 1, T)
                    .astype(np.float32) * 0.3)
    T_pad = -(-T // hop) * hop
    x_pad = jnp.pad(x, ((0, 0), (0, 0), (0, T_pad - T)))
    ref, _ = model.encode(params, x_pad)
    codes, _ = chunked_encode(model, params, x, chunk_frames=24)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref))
