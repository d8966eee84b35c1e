"""Pallas LSTM recurrence kernel vs the lax.scan path.

Runs in interpret mode on CPU (the compiled path is measured on the real
chip by scripts/perf_lstm_kernel.py).  The kernel carries gates/cell state
in fp32, so fp32 parity is tight; bf16 parity is bounded by bf16 rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.nn.lstm import StreamableLSTM, lstm_layer
from audiocraft_tpu.ops.lstm_pallas import lstm_layer_pallas


def _params(key, H):
    return StreamableLSTM(H, num_layers=1).init(key)['l0']


@pytest.mark.parametrize("T,B,H", [(16, 8, 128), (13, 8, 128), (7, 16, 256),
                                   (80, 8, 128)])  # 80: multi-block grid —
# the h/c carry must persist across grid steps
def test_kernel_matches_scan_fp32(T, B, H):
    """fp32 path: kernel == scan to accumulation-order tolerance, including
    non-multiple T (pad + slice) and multi-block grids."""
    p = _params(jax.random.PRNGKey(0), H)
    x = jnp.asarray(np.random.RandomState(1).randn(T, B, H)
                    .astype(np.float32) * 0.5)
    ref = lstm_layer(x, p['w_ih'], p['w_hh'], p['b_ih'], p['b_hh'])
    out = lstm_layer_pallas(x, p['w_ih'], p['w_hh'], p['b_ih'], p['b_hh'],
                            interpret=True)
    assert out is not None and out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_bf16_close_to_fp32():
    """bf16 path: the kernel (fp32 gates/cell) is at least as close to the
    fp32 reference as the bf16 scan is."""
    T, B, H = 20, 8, 128
    p = _params(jax.random.PRNGKey(2), H)
    x32 = np.random.RandomState(3).randn(T, B, H).astype(np.float32) * 0.5
    ref = np.asarray(lstm_layer(jnp.asarray(x32), p['w_ih'], p['w_hh'],
                                p['b_ih'], p['b_hh']))
    cast = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)
    pb = cast(p)
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    scan_b = np.asarray(lstm_layer(xb, pb['w_ih'], pb['w_hh'], pb['b_ih'],
                                   pb['b_hh']), np.float32)
    kern_b = lstm_layer_pallas(xb, pb['w_ih'], pb['w_hh'], pb['b_ih'],
                               pb['b_hh'], interpret=True)
    assert kern_b is not None
    kern_b = np.asarray(kern_b, np.float32)
    err_scan = np.abs(scan_b - ref).max()
    err_kern = np.abs(kern_b - ref).max()
    assert err_kern <= err_scan * 1.5 + 1e-3, (err_kern, err_scan)
    # and the two bf16 paths agree to bf16 rounding
    np.testing.assert_allclose(kern_b, scan_b, atol=0.05)


def test_ineligible_shapes_fall_back():
    p = _params(jax.random.PRNGKey(4), 64)
    x = jnp.zeros((5, 8, 64), jnp.float32)
    assert lstm_layer_pallas(x, p['w_ih'], p['w_hh'], p['b_ih'],
                             p['b_hh']) is None  # H not lane-aligned
    p2 = _params(jax.random.PRNGKey(5), 128)
    x2 = jnp.zeros((5, 3, 128), jnp.float32)
    assert lstm_layer_pallas(x2, p2['w_ih'], p2['w_hh'], p2['b_ih'],
                             p2['b_hh']) is None  # B not sublane-aligned


def test_streamable_lstm_kernel_route():
    """StreamableLSTM(kernel=True) == default path (2 layers + skip)."""
    H = 128
    mod = StreamableLSTM(H, num_layers=2)
    params = mod.init(jax.random.PRNGKey(6))
    x = jnp.asarray(np.random.RandomState(7).randn(4, H, 30)
                    .astype(np.float32) * 0.5)  # [B, C, T], B=4 -> fallback
    ref = mod(params, x)
    # B=4 is sublane-ineligible: kernel route must silently fall back
    out = mod(params, x, kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
    x8 = jnp.asarray(np.random.RandomState(8).randn(8, H, 30)
                     .astype(np.float32) * 0.5)
    ref8 = mod(params, x8)
    out8 = mod(params, x8, kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref8),
                               rtol=1e-5, atol=1e-5)


def test_lstm_kernel_auto_policy():
    """'auto' resolves to kernel at serving batches only; explicit call
    arguments override the model default."""
    from audiocraft_tpu.builders import get_encodec_32khz
    model = get_encodec_32khz()
    assert model.lstm_kernel == 'auto'
    assert model._resolve_lstm_kernel(128) is True
    assert model._resolve_lstm_kernel(64) is True
    assert model._resolve_lstm_kernel(32) is False
    import dataclasses
    off = dataclasses.replace(model, lstm_kernel=False)
    assert off._resolve_lstm_kernel(128) is False


def test_encodec_encode_decode_lstm_kernel_route():
    """encode/decode(lstm_kernel=True) == default on an LSTM'd codec whose
    hidden dim is lane-aligned (n_filters=8 -> dim 128)."""
    from audiocraft_tpu.codec.encodec import EncodecModel
    from audiocraft_tpu.nn.seanet import SEANetDecoder, SEANetEncoder
    from audiocraft_tpu.quant.vq import ResidualVectorQuantizer

    enc = SEANetEncoder(channels=1, dimension=32, n_filters=8,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='none', lstm=1)
    dec = SEANetDecoder(channels=1, dimension=32, n_filters=8,
                        n_residual_layers=1, ratios=(8, 5, 4, 4),
                        norm='none', lstm=1)
    q = ResidualVectorQuantizer(dimension=32, n_q=2, bins=64,
                                kmeans_init=False)
    model = EncodecModel(encoder=enc, decoder=dec, quantizer=q,
                         frame_rate=50, sample_rate=32000, channels=1)
    params = model.init(jax.random.PRNGKey(9))
    x = jnp.asarray(np.random.RandomState(10).randn(8, 1, 6400)
                    .astype(np.float32) * 0.3)
    codes_ref, _ = model.encode(params, x)
    codes_k, _ = model.encode(params, x, lstm_kernel=True)
    # interpret flag is plumbed via the module call; on CPU the jit'd
    # pallas_call needs interpret, so call the encoder directly too
    emb_ref = enc(params['encoder'], x)
    emb_k = enc(params['encoder'], x, lstm_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(emb_k), np.asarray(emb_ref),
                               rtol=1e-4, atol=1e-4)
    wav_ref = model.decode(params, codes_ref)
    emb_d = model.decode_latent(params, codes_ref)
    wav_k = dec(params['decoder'], emb_d, lstm_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(wav_k), np.asarray(wav_ref),
                               rtol=1e-4, atol=1e-4)
    assert codes_ref.shape == codes_k.shape
