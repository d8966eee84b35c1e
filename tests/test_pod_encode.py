"""Time-parallel pod encode (dist/pod.py): token-exact vs whole-signal
encode on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.codec.encodec import EncodecModel
from audiocraft_tpu.dist.mesh import make_mesh
from audiocraft_tpu.dist.pod import pod_encode
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


def test_corruption_radius_finite():
    m = _model()
    c_l, c_r = m.encoder.front_corruption_radius()
    assert 0 <= c_l <= 4 and 0 <= c_r <= 4
    # causal stacks pad fully on the left: radius moves there
    mc = _model(causal=True)
    cc_l, cc_r = mc.encoder.front_corruption_radius()
    assert cc_l >= c_l and cc_r <= c_r


@pytest.mark.parametrize("causal", [False, True])
def test_pod_encode_token_exact(causal):
    model = _model(causal=causal)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)
    hop = model.encoder.hop_length
    T = hop * 8 * 12  # 12 frames/shard
    x = jnp.asarray(np.random.RandomState(1).randn(2, 1, T)
                    .astype(np.float32) * 0.3)
    ref, _ = model.encode(params, x)
    codes = pod_encode(model, params, x, mesh)
    assert codes.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref))


def test_pod_encode_pads_ragged_length():
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)
    hop = model.encoder.hop_length
    T = hop * 8 * 10 + 1234  # ragged: pod pads to the next shard multiple
    x = jnp.asarray(np.random.RandomState(2).randn(1, 1, T)
                    .astype(np.float32) * 0.3)
    T_pad = hop * 8 * 11
    ref, _ = model.encode(params, jnp.pad(x, ((0, 0), (0, 0),
                                              (0, T_pad - T))))
    codes = pod_encode(model, params, x, mesh)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref))


def test_pod_encode_no_lstm():
    """Without an LSTM the split sits at the final act+conv tail."""
    model = _model(lstm=0)
    params = model.init(jax.random.PRNGKey(3))
    mesh = make_mesh(n_data=4)
    hop = model.encoder.hop_length
    x = jnp.asarray(np.random.RandomState(4).randn(1, 1, hop * 4 * 10)
                    .astype(np.float32) * 0.3)
    ref, _ = model.encode(params, x)
    codes = pod_encode(model, params, x, mesh)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref))


@pytest.mark.parametrize("causal", [False, True])
def test_pod_decode_exact(causal):
    from audiocraft_tpu.dist.pod import pod_decode
    model = _model(causal=causal)
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)
    T_f = 8 * 12
    codes = jnp.asarray(np.random.RandomState(6).randint(
        0, 64, size=(2, 4, T_f)).astype(np.int32))
    ref = model.decode(params, codes)
    wav = pod_decode(model, params, codes, mesh)
    assert wav.shape == ref.shape
    # exact up to float rounding: XLA's transposed-conv blocking varies
    # with spatial length, so chunked runs differ by ~1 ulp (pod.py doc)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(ref), atol=1e-6,
                               rtol=0)


def test_pod_decode_ragged_and_jit():
    from audiocraft_tpu.dist.pod import pod_decode
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)
    T_f = 8 * 10 + 5  # ragged: pod pads with code 0 to a shard multiple
    codes = jnp.asarray(np.random.RandomState(7).randint(
        0, 64, size=(1, 4, T_f)).astype(np.int32))
    padded = jnp.pad(codes, ((0, 0), (0, 0), (0, 8 * 11 - T_f)))
    ref = model.decode(params, padded)
    fn = jax.jit(lambda p, c: pod_decode(model, p, c, mesh))
    wav = fn(params, codes)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(ref), atol=1e-6,
                               rtol=0)


def test_pod_encode_jit_compiles():
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)
    hop = model.encoder.hop_length
    x = jnp.asarray(np.random.RandomState(5).randn(1, 1, hop * 8 * 8)
                    .astype(np.float32) * 0.3)
    fn = jax.jit(lambda p, a: pod_encode(model, p, a, mesh))
    codes = fn(params, x)
    ref, _ = model.encode(params, x)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref))
