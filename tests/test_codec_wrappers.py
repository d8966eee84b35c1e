"""DAC / HF-EnCodec wrapper parity (reference encodec.py:262-394).

The HF wrapper is tested against the *live* ``transformers`` torch
EncodecModel (random weights, small config): token parity on encode and
waveform parity on decode prove the HF-layout importer and config mapping.
The DAC wrapper is contract-tested with a fake backend (the real descript
model is unavailable here), mirroring the reference wrapper's bookkeeping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _hf_pair():
    """(torch HF model, our wrapper, imported params) on a small config."""
    import torch
    from transformers import EncodecConfig, EncodecModel as HFEncodec

    from audiocraft_tpu.codec.wrappers import HFEncodecCompressionModel

    torch.manual_seed(31)
    # frame_rate = 16000/8 = 2000; bw*1000/(2000*log2(64)) -> 1 and 2 books
    cfg = EncodecConfig(
        target_bandwidths=[12.0, 24.0], sampling_rate=16000, audio_channels=1,
        num_filters=4, upsampling_ratios=[4, 2], codebook_size=64,
        codebook_dim=16, hidden_size=16, num_lstm_layers=1,
        num_residual_layers=1, normalize=False, use_causal_conv=True)
    hf = HFEncodec(cfg).eval()
    ours = HFEncodecCompressionModel.from_hf_config(cfg.to_dict())
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, ours.import_hf_state(sd))
    return hf, ours, params


def test_hf_wrapper_contract():
    _, ours, _ = _hf_pair()
    assert ours.sample_rate == 16000
    assert ours.frame_rate == 2000.0
    assert ours.cardinality == 64
    assert ours.possible_num_codebooks == [1, 2]
    assert ours.total_codebooks == 2
    assert ours.num_codebooks == 2
    assert ours.set_num_codebooks(1).num_codebooks == 1
    with pytest.raises(ValueError):
        ours.set_num_codebooks(3)


def test_hf_wrapper_encode_token_parity():
    import torch
    hf, ours, params = _hf_pair()
    wav = np.random.RandomState(0).randn(2, 1, 16000).astype(np.float32) * 0.3
    with torch.no_grad():
        res = hf.encode(torch.from_numpy(wav), None, bandwidth=24.0)
    codes_ref = res[0][0].numpy()
    codes, scale = ours.encode(params, jnp.asarray(wav))
    assert scale is None
    assert codes_ref.shape == np.asarray(codes).shape
    assert (np.asarray(codes) == codes_ref).all()


def test_hf_wrapper_decode_parity():
    import torch
    hf, ours, params = _hf_pair()
    codes = np.random.RandomState(1).randint(0, 64, size=(2, 2, 50))
    with torch.no_grad():
        wav_ref = hf.decode(torch.from_numpy(codes)[None], [None])[0].numpy()
    wav = np.asarray(ours.decode(params, jnp.asarray(codes)))
    n = min(wav.shape[-1], wav_ref.shape[-1])
    assert np.allclose(wav[..., :n], wav_ref[..., :n], atol=2e-5)


class _FakeDAC:
    sample_rate = 44100
    hop_length = 512
    codebook_size = 1024
    n_codebooks = 9

    def encode(self, x):
        frames = x.shape[-1] // self.hop_length
        rng = np.random.RandomState(0)
        return jnp.asarray(rng.randint(0, self.codebook_size,
                                       size=(x.shape[0], self.n_codebooks,
                                             frames)))

    def decode_latent(self, codes):
        return jnp.zeros((codes.shape[0], 8, codes.shape[-1]))

    def decode(self, z_q):
        return jnp.zeros((z_q.shape[0], 1, z_q.shape[-1] * self.hop_length))


def test_dac_wrapper_contract():
    from audiocraft_tpu.codec.wrappers import DACCompressionModel

    dac = DACCompressionModel(backend=_FakeDAC())
    assert dac.num_codebooks == 9
    assert dac.total_codebooks == 9
    assert dac.cardinality == 1024
    assert dac.frame_rate == pytest.approx(44100 / 512)
    assert dac.channels == 1

    x = jnp.zeros((2, 1, 512 * 10))
    codes, scale = dac.encode(x)
    assert scale is None
    assert codes.shape == (2, 9, 10)

    dac4 = dac.set_num_codebooks(4)
    codes4, _ = dac4.encode(x)
    assert codes4.shape == (2, 4, 10)
    wav = dac4.decode(codes4)
    assert wav.shape == (2, 1, 512 * 10)
    with pytest.raises(AssertionError):
        dac.set_num_codebooks(10)
