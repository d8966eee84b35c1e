"""Parity at PUBLISHED model shapes (not toy configs).

Round-1 parity ran at debug scale (n_filters=4 codec, dim=16 LM); this module
pins the real production shapes:

* EnCodec 32 kHz at n_filters=64 / lstm=2 / ratios [8,5,4,4] / 4x2048 books —
  the facebook/encodec_32khz architecture (reference builders + HF config;
  the reference's *fallback* cfg at loaders.py:96-146 nominally says
  "stride: 320", which is the 24 kHz hop — the real 32 kHz hop is 640 as
  built by audiocraft's own builders and the HF checkpoint; we follow those).
* A dim=1024 / 16-head MusicGen-small-shaped LM stack (2 layers deep to keep
  CPU time sane — the layer math, not the depth, is what can diverge).

Config field cross-check vs reference values is in
test_config_fields_match_reference.
"""

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def real_codec_pair():
    import torch
    ref_seanet = ref_module("audiocraft.modules.seanet")
    ref_vq = ref_module("audiocraft.quantization.vq")
    ref_enc = ref_module("audiocraft.models.encodec")
    torch.manual_seed(42)
    kw = dict(channels=1, dimension=128, n_filters=64, n_residual_layers=1,
              ratios=[8, 5, 4, 4], norm='weight_norm', lstm=2)
    encoder = ref_seanet.SEANetEncoder(**kw)
    decoder = ref_seanet.SEANetDecoder(**kw)
    quantizer = ref_vq.ResidualVectorQuantizer(dimension=128, n_q=4, bins=2048)
    ref = ref_enc.EncodecModel(encoder, decoder, quantizer, frame_rate=50,
                               sample_rate=32000, channels=1).eval()

    from audiocraft_tpu.builders import get_encodec_32khz
    from audiocraft_tpu.ckpt.torch_import import import_encodec
    ours = get_encodec_32khz(compute_dtype=None)  # fp32 parity dtype
    sd = {k: to_np(v) for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, import_encodec(ours, sd))
    return ref, ours, params


def test_real_shape_codec_token_parity(real_codec_pair):
    import torch
    ref, ours, params = real_codec_pair
    wav = np.random.RandomState(0).randn(2, 1, 64000).astype(np.float32) * 0.2
    with torch.no_grad():
        codes_ref = to_np(ref.encode(to_torch(wav))[0])
    codes, scale = ours.encode(params, jnp.asarray(wav))
    assert scale is None
    assert codes_ref.shape == (2, 4, 100)
    match = (np.asarray(codes) == codes_ref).mean()
    assert match == 1.0, f"token match {match:.6f}"


def test_real_shape_codec_decode_parity(real_codec_pair):
    import torch
    ref, ours, params = real_codec_pair
    codes = np.random.RandomState(1).randint(0, 2048, size=(1, 4, 50))
    with torch.no_grad():
        wav_ref = to_np(ref.decode(to_torch(codes).long()))
    wav = np.asarray(ours.decode(params, jnp.asarray(codes)))
    assert wav.shape == wav_ref.shape == (1, 1, 32000)
    assert np.abs(wav - wav_ref).max() < 2e-4


def test_real_shape_lm_forward_parity():
    import torch
    ref_lm_mod = ref_module("audiocraft.models.lm")
    ref_pat = ref_module("audiocraft.modules.codebooks_patterns")
    ref_cond = ref_module("audiocraft.modules.conditioners")
    torch.manual_seed(3)
    n_q, card, dim, heads = 4, 2048, 1024, 16
    pattern = ref_pat.DelayedPatternProvider(n_q=n_q)
    fuser = ref_cond.ConditionFuser({"cross": ["description"], "prepend": [],
                                     "sum": [], "input_interpolate": []})
    ref = ref_lm_mod.LMModel(
        pattern, None, fuser, n_q=n_q, card=card, dim=dim, num_heads=heads,
        custom=True, num_layers=2, cross_attention=True, causal=True,
        norm_first=True, bias_proj=False, bias_ff=False, bias_attn=False,
        activation='gelu', dropout=0.0).eval()

    from audiocraft_tpu.cond.fuser import ConditionFuser
    from audiocraft_tpu.ckpt.torch_import import import_lm
    from audiocraft_tpu.lm.model import LMModel
    from audiocraft_tpu.patterns import DelayedPatternProvider
    ours = LMModel(pattern_provider=DelayedPatternProvider(n_q),
                   fuser=ConditionFuser.from_dict({'cross': ('description',)}),
                   n_q=n_q, card=card, dim=dim, num_heads=heads, num_layers=2,
                   cross_attention=True, causal=True, norm_first=True,
                   bias_proj=False, bias_ff=False, bias_attn=False,
                   activation='gelu')
    sd = {k: to_np(v) for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, import_lm(ours, sd))

    B, T, Tc = 2, 6, 5
    rng = np.random.RandomState(7)
    seq = rng.randint(0, card, size=(B, n_q, T))
    cond = rng.randn(B, Tc, dim).astype(np.float32)
    mask = np.ones((B, Tc), dtype=np.int64)

    with torch.no_grad():
        logits_ref = to_np(ref.forward(
            to_torch(seq).long(),
            conditions=[],
            condition_tensors={"description": (to_torch(cond),
                                               to_torch(mask))}))
    logits, _ = ours.forward(params, jnp.asarray(seq),
                             {'description': (jnp.asarray(cond),
                                              jnp.asarray(mask))})
    assert logits_ref.shape == logits.shape == (B, n_q, T, card)
    # fp32 at dim=1024: allow accumulated-sum noise, check argmax agreement
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=2e-3, rtol=1e-3)
    agree = (np.asarray(logits).argmax(-1) == logits_ref.argmax(-1)).mean()
    assert agree == 1.0


def test_config_fields_match_reference():
    """Field-by-field cross-check of our builder configs against the
    reference's own values (builders + musicgen size table)."""
    from audiocraft_tpu.builders import (_MUSICGEN_SIZES, get_encodec_32khz,
                                         get_musicgen_lm)

    codec = get_encodec_32khz()
    # facebook/encodec_32khz facts (also reference README.md:63: 50 Hz,
    # 4 codebooks)
    assert codec.sample_rate == 32000
    assert codec.frame_rate == 50
    assert codec.encoder.hop_length == 640           # NOT the fallback's 320
    assert tuple(codec.encoder.ratios) == (8, 5, 4, 4)
    assert codec.encoder.n_filters == 64
    assert codec.encoder.dimension == 128
    assert codec.encoder.lstm == 2
    assert codec.encoder.norm == 'weight_norm'
    assert codec.quantizer.n_q == 4
    assert codec.quantizer.bins == 2048
    assert codec.channels == 1

    # transformer shapes: 300M/1.5B/3.3B (reference README.md:197-206)
    assert _MUSICGEN_SIZES['small'] == dict(dim=1024, num_layers=24,
                                            num_heads=16)
    assert _MUSICGEN_SIZES['medium'] == dict(dim=1536, num_layers=48,
                                             num_heads=24)
    assert _MUSICGEN_SIZES['large'] == dict(dim=2048, num_layers=48,
                                            num_heads=32)

    lm, provider = get_musicgen_lm('small')
    assert lm.n_q == 4 and lm.card == 2048
    assert lm.norm_first and lm.causal and lm.cross_attention
    assert not lm.bias_proj and not lm.bias_ff and not lm.bias_attn
    assert lm.hidden_scale == 4
    conds = provider.as_dict
    assert 'description' in conds
    assert conds['description'].name == 't5-base'
    assert conds['description'].output_dim == 1024

    lm_mel, provider_mel = get_musicgen_lm('small', melody=True)
    mel = provider_mel.as_dict['self_wav']
    assert mel.n_chroma == 12 and mel.radix2_exp == 12
    assert mel.sample_rate == 32000 and mel.duration == 30.0


def test_real_shape_causal_24khz_parity():
    """The causal streaming config (facebook/encodec_24khz: n_filters=32,
    ratios [8,5,4,2], causal convs) at published shape: token parity."""
    import torch
    ref_seanet = ref_module("audiocraft.modules.seanet")
    ref_vq = ref_module("audiocraft.quantization.vq")
    ref_enc = ref_module("audiocraft.models.encodec")
    torch.manual_seed(13)
    kw = dict(channels=1, dimension=128, n_filters=32, n_residual_layers=1,
              ratios=[8, 5, 4, 2], norm='weight_norm', lstm=2, causal=True)
    ref = ref_enc.EncodecModel(
        ref_seanet.SEANetEncoder(**kw), ref_seanet.SEANetDecoder(**kw),
        ref_vq.ResidualVectorQuantizer(dimension=128, n_q=8, bins=1024),
        frame_rate=75, sample_rate=24000, channels=1).eval()

    from audiocraft_tpu.builders import get_encodec_24khz
    from audiocraft_tpu.ckpt.torch_import import import_encodec
    ours = get_encodec_24khz()
    sd = {k: to_np(v) for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, import_encodec(ours, sd))

    wav = np.random.RandomState(3).randn(1, 1, 24000).astype(np.float32) * 0.2
    with torch.no_grad():
        codes_ref = to_np(ref.encode(to_torch(wav))[0])
    codes, _ = ours.encode(params, jnp.asarray(wav))
    assert codes_ref.shape == (1, 8, 75)
    assert (np.asarray(codes) == codes_ref).all()


def test_get_magnet_lm_config_fields():
    """get_magnet_lm mirrors the published MAGNeT configs (reference
    magnet.py:30-58, loaders.py:217-240): MusicGen-size transformer,
    non-causal, parallel pattern, span/context from the masking cfg."""
    from audiocraft_tpu.builders import get_magnet_lm, _MUSICGEN_SIZES
    lm, provider = get_magnet_lm('small')
    assert lm.dim == _MUSICGEN_SIZES['small']['dim']
    assert lm.num_layers == _MUSICGEN_SIZES['small']['num_layers']
    assert lm.causal is False
    assert lm.span_len == 3 and lm.subcodes_context == 5
    assert lm.compression_model_framerate == 50
    assert lm.segment_duration == 10
    assert lm.card == 2048 and lm.n_q == 4
    assert type(lm.pattern_provider).__name__ == 'ParallelPatternProvider'
    assert 'description' in dict(provider.conditioners)
    lm30, _ = get_magnet_lm('medium', segment_duration=30)
    assert lm30.segment_duration == 30
    assert lm30.dim == _MUSICGEN_SIZES['medium']['dim']
