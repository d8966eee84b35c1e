"""SEANet encoder/decoder and full EnCodec model parity vs reference torch."""

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax
import jax.numpy as jnp

from audiocraft_tpu.nn.seanet import SEANetDecoder, SEANetEncoder
from audiocraft_tpu.ckpt.torch_import import import_seanet, import_encodec
from audiocraft_tpu.builders import get_debug_compression_model


def _sd(mod):
    return {k: to_np(v) for k, v in mod.state_dict().items()}


SEANET_KW = dict(channels=1, dimension=32, n_filters=4, n_residual_layers=1,
                 ratios=[10, 8, 16])


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("lstm", [0, 2])
def test_seanet_encoder_parity(causal, lstm):
    import torch
    ref_seanet = ref_module("audiocraft.modules.seanet")
    torch.manual_seed(11)
    ref = ref_seanet.SEANetEncoder(causal=causal, lstm=lstm, **SEANET_KW)
    ref.eval()
    T = 4000
    x = np.random.RandomState(0).randn(2, 1, T).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(x)))

    ours = SEANetEncoder(causal=causal, lstm=lstm,
                         **{**SEANET_KW, 'ratios': tuple(SEANET_KW['ratios'])})
    params = jax.tree.map(jnp.asarray, import_seanet(ours, _sd(ref)))
    y = np.asarray(ours(params, jnp.asarray(x)))
    assert y.shape == y_ref.shape
    assert ours.output_length(T) == y_ref.shape[-1]
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_seanet_decoder_parity(causal):
    import torch
    ref_seanet = ref_module("audiocraft.modules.seanet")
    torch.manual_seed(13)
    ref = ref_seanet.SEANetDecoder(causal=causal, **SEANET_KW)
    ref.eval()
    z = np.random.RandomState(1).randn(2, 32, 7).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(z)))

    ours = SEANetDecoder(causal=causal,
                         **{**SEANET_KW, 'ratios': tuple(SEANET_KW['ratios'])})
    params = jax.tree.map(jnp.asarray, import_seanet(ours, _sd(ref)))
    y = np.asarray(ours(params, jnp.asarray(z)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-4)


def test_seanet_encoder_weight_norm_lstm_parity():
    """Closer to the real EnCodec config: weight_norm + LSTM."""
    import torch
    ref_seanet = ref_module("audiocraft.modules.seanet")
    torch.manual_seed(17)
    kw = dict(channels=1, dimension=16, n_filters=4, n_residual_layers=1,
              ratios=[8, 5, 4, 4], norm='weight_norm', lstm=2)
    ref = ref_seanet.SEANetEncoder(**kw)
    ref.eval()
    x = np.random.RandomState(4).randn(1, 1, 3200).astype(np.float32)
    with torch.no_grad():
        y_ref = to_np(ref(to_torch(x)))

    ours = SEANetEncoder(**{**kw, 'ratios': (8, 5, 4, 4)})
    params = jax.tree.map(jnp.asarray, import_seanet(ours, _sd(ref)))
    y = np.asarray(ours(params, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-4)


def test_encodec_debug_model_token_parity():
    """End-to-end: reference debug compression model's encode tokens == ours
    with imported weights; decode waveform matches."""
    import torch
    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(23)
    ref = ref_builders.get_debug_compression_model(sample_rate=32000)

    ours = get_debug_compression_model(sample_rate=32000)
    params = import_encodec(ours, _sd(ref))
    params = jax.tree.map(jnp.asarray, params)

    sr = 32000
    wav = (np.random.RandomState(9).randn(2, 1, sr * 2) * 0.2).astype(np.float32)
    with torch.no_grad():
        codes_ref, scale_ref = ref.encode(to_torch(wav))
        out_ref = to_np(ref.decode(codes_ref, scale_ref))
        codes_ref = to_np(codes_ref)

    codes, scale = ours.encode(params, jnp.asarray(wav))
    codes = np.asarray(codes)
    assert codes.shape == codes_ref.shape
    match = (codes == codes_ref).mean()
    assert match == 1.0, f"token-id exact match {match:.6f} != 1.0"

    out = np.asarray(ours.decode(params, jnp.asarray(codes)))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, atol=1e-4, rtol=1e-4)


def test_encodec_renormalize_roundtrip():
    ours = get_debug_compression_model(sample_rate=32000)
    import dataclasses
    ours = dataclasses.replace(ours, renormalize=True)
    params = ours.init(jax.random.PRNGKey(0))
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 32000)) * 3.0
    codes, scale = ours.encode(params, wav)
    assert scale is not None and scale.shape == (2, 1)
    out = ours.decode(params, codes, scale)
    assert out.shape[0] == 2 and out.shape[1] == 1


def test_encodec_24khz_causal_config():
    """Causal streaming config (facebook/encodec_24khz shape)."""
    from audiocraft_tpu.builders import get_encodec_24khz
    model = get_encodec_24khz(n_filters=4)  # slim for test speed
    assert model.causal and model.frame_rate == 75
    params = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 1, 24000)
                      .astype(np.float32) * 0.1)
    codes, scale = model.encode(params, wav)
    assert codes.shape == (1, 8, 75)
    out = model.decode(params, codes)
    assert out.shape[-1] >= 24000
