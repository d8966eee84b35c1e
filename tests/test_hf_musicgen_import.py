"""HF-format MusicGen checkpoint import parity.

Published MusicGen weights mostly circulate in the HF Transformers layout
(``MusicgenForCausalLM`` / ``MusicgenForConditionalGeneration``), not the
original audiocraft export.  These tests validate ``ckpt/hf_import.py``
against a *live* randomly-initialized HF model (transformers is in the
image; no weights download needed): same logits on the same inputs proves
the q/k/v re-fusion, norm renames, embedding/head stacking and
``enc_to_dec_proj`` routing are all correct — i.e. a real published
checkpoint would import correctly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.cond.fuser import ConditionFuser
from audiocraft_tpu.ckpt.hf_import import (
    HF_HARMLESS_PATTERNS, detect_lm_prefix, import_lm_hf, import_musicgen_hf)
from audiocraft_tpu.ckpt.torch_import import KeyTracker
from audiocraft_tpu.lm.model import LMModel
from audiocraft_tpu.patterns import DelayedPatternProvider

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

N_Q, CARD, DIM, HEADS, LAYERS, FFN = 4, 17, 32, 4, 2, 64


def _hf_decoder_config():
    from transformers.models.musicgen.configuration_musicgen import (
        MusicgenDecoderConfig)
    return MusicgenDecoderConfig(
        vocab_size=CARD, hidden_size=DIM, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, ffn_dim=FFN, num_codebooks=N_Q,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu", scale_embedding=False,
        max_position_embeddings=64, layerdrop=0.0, use_cache=False)


def _make_hf_lm(seed=11):
    from transformers.models.musicgen.modeling_musicgen import (
        MusicgenForCausalLM)
    torch.manual_seed(seed)
    model = MusicgenForCausalLM(_hf_decoder_config()).eval()
    return model


def _make_our_lm():
    fuser = ConditionFuser.from_dict(
        {"cross": ("description",), "prepend": (), "sum": (),
         "input_interpolate": ()})
    return LMModel(pattern_provider=DelayedPatternProvider(N_Q), fuser=fuser,
                   n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS,
                   num_layers=LAYERS, hidden_scale=FFN // DIM,
                   cross_attention=True, causal=True, norm_first=True,
                   bias_proj=False, bias_ff=False, bias_attn=False,
                   activation="gelu")


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_hf_causal_lm_logits_parity():
    ref = _make_hf_lm()
    ours = _make_our_lm()
    sd = KeyTracker(_sd(ref))
    params = jax.tree.map(jnp.asarray, import_lm_hf(ours, sd))
    assert sd.unused(ignore=HF_HARMLESS_PATTERNS) == []

    B, S, Tc = 2, 9, 5
    rng = np.random.RandomState(0)
    codes = rng.randint(0, CARD, (B, N_Q, S))
    enc = rng.randn(B, Tc, DIM).astype(np.float32)
    with torch.no_grad():
        out = ref(input_ids=torch.as_tensor(codes.reshape(B * N_Q, S)),
                  encoder_hidden_states=torch.as_tensor(enc))
    # HF flattens (B, K, S, V) -> (B*K, S, V) before returning
    logits_ref = out.logits.numpy().reshape(B, N_Q, S, CARD)

    mask = jnp.ones((B, Tc), dtype=jnp.int32)
    logits, _ = ours.forward(params, jnp.asarray(codes),
                             {"description": (jnp.asarray(enc), mask)})
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=5e-5, rtol=1e-4)


def test_hf_causal_lm_greedy_decode_matches():
    """Token-level check through our generate pipeline with imported HF
    weights: greedy tokens equal HF greedy tokens step-by-step."""
    ref = _make_hf_lm()
    ours = _make_our_lm()
    params = jax.tree.map(jnp.asarray, import_lm_hf(ours, _sd(ref)))

    B, S, Tc = 1, 6, 4
    rng = np.random.RandomState(2)
    codes = rng.randint(0, CARD, (B, N_Q, S))
    enc = rng.randn(B, Tc, DIM).astype(np.float32)

    with torch.no_grad():
        logits_ref = ref(input_ids=torch.as_tensor(codes.reshape(B * N_Q, S)),
                         encoder_hidden_states=torch.as_tensor(enc)).logits
    greedy_ref = logits_ref.argmax(-1).numpy().reshape(B, N_Q, S)[:, :, -1]

    mask = jnp.ones((B, Tc), dtype=jnp.int32)
    logits, _ = ours.forward(params, jnp.asarray(codes),
                             {"description": (jnp.asarray(enc), mask)})
    greedy = np.asarray(jnp.argmax(logits, -1))[:, :, -1]
    assert (greedy == greedy_ref).all()


def test_hf_safetensors_cli_roundtrip(tmp_path, monkeypatch):
    """End-to-end: an HF MusicgenForCausalLM saved as .safetensors imports
    through the CLI (layout auto-detected, no pickle involved) and the loaded
    checkpoint reproduces the HF logits."""
    from safetensors.numpy import save_file

    from audiocraft_tpu import builders
    from audiocraft_tpu.apps.import_checkpoint import main as import_main
    from audiocraft_tpu.ckpt.io import load_checkpoint
    from audiocraft_tpu.cond.conditioners import (ConditioningProvider,
                                                  LUTConditioner)

    ref = _make_hf_lm(seed=3)
    ckpt_file = tmp_path / "model.safetensors"
    save_file({k: np.ascontiguousarray(v) for k, v in _sd(ref).items()},
              str(ckpt_file))

    def _hf_shaped_debug():
        provider = ConditioningProvider.from_dict({
            'description': LUTConditioner(n_bins=8, dim=8, output_dim=DIM,
                                          tokenizer='whitespace')})
        return _make_our_lm(), provider

    monkeypatch.setattr(builders, 'get_debug_musicgen_lm', _hf_shaped_debug)
    out_dir = tmp_path / "converted"
    import_main(['lm', str(ckpt_file), '--out', str(out_dir),
                 '--size', 'debug'])

    bundle, params, meta = load_checkpoint(out_dir)
    assert meta['extra']['unmapped_keys'] == []
    lm = bundle['lm']
    lm_params = jax.tree.map(jnp.asarray, params['lm'])

    B, S, Tc = 2, 5, 3
    rng = np.random.RandomState(9)
    codes = rng.randint(0, CARD, (B, N_Q, S))
    enc = rng.randn(B, Tc, DIM).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref(
            input_ids=torch.as_tensor(codes.reshape(B * N_Q, S)),
            encoder_hidden_states=torch.as_tensor(enc),
        ).logits.numpy().reshape(B, N_Q, S, CARD)
    mask = jnp.ones((B, Tc), dtype=jnp.int32)
    logits, _ = lm.forward(lm_params, jnp.asarray(codes),
                           {"description": (jnp.asarray(enc), mask)})
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=5e-5, rtol=1e-4)


def test_hf_encodec_compression_cli(tmp_path):
    """kind=compression on a composite-prefixed HF EnCodec dump: the CLI
    strips `audio_encoder.`, detects the HF layout, builds from the provided
    config.json and the loaded checkpoint is token-exact vs live HF."""
    import json

    from safetensors.numpy import save_file
    from transformers import EncodecConfig, EncodecModel as HFEncodec

    from audiocraft_tpu.apps.import_checkpoint import main as import_main
    from audiocraft_tpu.ckpt.io import load_checkpoint

    torch.manual_seed(13)
    cfg = EncodecConfig(
        target_bandwidths=[12.0, 24.0], sampling_rate=16000, audio_channels=1,
        num_filters=4, upsampling_ratios=[4, 2], codebook_size=64,
        codebook_dim=16, hidden_size=16, num_lstm_layers=1,
        num_residual_layers=1, normalize=False, use_causal_conv=True)
    hf = HFEncodec(cfg).eval()

    ckpt_file = tmp_path / "composite.safetensors"
    save_file({f"audio_encoder.{k}": np.ascontiguousarray(v.numpy())
               for k, v in hf.state_dict().items()}, str(ckpt_file))
    cfg_file = tmp_path / "config.json"
    cfg_file.write_text(json.dumps({"audio_encoder": cfg.to_dict()},
                                   default=str))

    out_dir = tmp_path / "converted_codec"
    import_main(['compression', str(ckpt_file), '--out', str(out_dir),
                 '--hf-config', str(cfg_file)])

    model, params, meta = load_checkpoint(out_dir)
    assert meta['extra']['unmapped_keys'] == []
    params = jax.tree.map(jnp.asarray, params)
    wav = np.random.RandomState(4).randn(2, 1, 16000).astype(np.float32) * 0.3
    with torch.no_grad():
        codes_ref = hf.encode(torch.from_numpy(wav), None,
                              bandwidth=24.0)[0][0].numpy()
    codes, scale = model.encode(params, jnp.asarray(wav))
    assert scale is None
    assert (np.asarray(codes) == codes_ref.reshape(np.asarray(codes).shape)).all()


def test_hf_snapshot_get_pretrained(tmp_path):
    """A raw HF hub snapshot dir (config.json + model.safetensors) is
    auto-converted and served by ckpt.loaders.get_pretrained: the model is
    built FROM the HF config (no --size guesswork) and the decoder weights
    land logits-exact."""
    import json

    from safetensors.numpy import save_file
    from transformers import T5Config
    from transformers.models.encodec.configuration_encodec import EncodecConfig
    from transformers.models.musicgen.configuration_musicgen import MusicgenConfig
    from transformers.models.musicgen.modeling_musicgen import (
        MusicgenForConditionalGeneration)

    from audiocraft_tpu.ckpt.loaders import clear_model_cache, get_pretrained

    torch.manual_seed(17)
    t5 = T5Config(vocab_size=50, d_model=24, d_kv=6, d_ff=32, num_layers=2,
                  num_heads=4)
    t5._name_or_path = "t5-small"     # name known, tower shapes tiny -> skip
    enc = EncodecConfig(audio_channels=1, num_filters=4, num_residual_layers=1,
                        upsampling_ratios=[4, 2], codebook_size=CARD + 15,
                        codebook_dim=DIM, hidden_size=DIM, num_lstm_layers=1,
                        target_bandwidths=[12.0, 24.0], sampling_rate=16000,
                        normalize=False, use_causal_conv=True)
    cfg = MusicgenConfig.from_sub_models_config(t5, enc, _hf_decoder_config())
    model = MusicgenForConditionalGeneration(cfg).eval()

    src = tmp_path / "snapshot"
    src.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in _sd(model).items()},
              str(src / "model.safetensors"))
    (src / "config.json").write_text(json.dumps(cfg.to_dict(), default=str))

    clear_model_cache()
    mg = get_pretrained(str(src), cache_dir=str(tmp_path / "cache"))
    assert mg.lm.card == CARD and mg.lm.num_layers == LAYERS
    assert mg.compression_model.sample_rate == 16000

    # decoder logits parity through the served facade's params
    B, S, Tc = 2, 5, 3
    rng = np.random.RandomState(21)
    codes = rng.randint(0, CARD, (B, N_Q, S))
    ench = rng.randn(B, Tc, DIM).astype(np.float32)
    with torch.no_grad():
        logits_ref = model.decoder(
            input_ids=torch.as_tensor(codes.reshape(B * N_Q, S)),
            encoder_hidden_states=torch.as_tensor(ench)
        ).logits.numpy().reshape(B, N_Q, S, CARD)
    mask = jnp.ones((B, Tc), dtype=jnp.int32)
    lm_params = jax.tree.map(jnp.asarray, mg.lm_params)
    logits, _ = mg.lm.forward(lm_params, jnp.asarray(codes),
                              {"description": (jnp.asarray(ench), mask)})
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=5e-5, rtol=1e-4)

    # the trained enc_to_dec_proj must ride along into the conditioner
    proj = mg.cond_params['description']['output_proj']
    np.testing.assert_array_equal(
        np.asarray(proj['weight']),
        model.enc_to_dec_proj.weight.detach().numpy())

    # second call must hit the already-converted checkpoint (no re-import)
    mg2 = get_pretrained(str(src), cache_dir=str(tmp_path / "cache"))
    assert mg2.lm.card == CARD


def test_hf_stereo_snapshot(tmp_path):
    """musicgen-stereo-* layout: mono codec + decoder audio_channels=2 with
    2x interleaved codebooks -> codec auto-wrapped in
    InterleaveStereoCompressionModel, LM built at n_q=8."""
    import json

    from safetensors.numpy import save_file
    from transformers import T5Config
    from transformers.models.encodec.configuration_encodec import EncodecConfig
    from transformers.models.musicgen.configuration_musicgen import (
        MusicgenConfig, MusicgenDecoderConfig)
    from transformers.models.musicgen.modeling_musicgen import (
        MusicgenForConditionalGeneration)

    from audiocraft_tpu.ckpt.loaders import clear_model_cache, get_pretrained
    from audiocraft_tpu.codec.stereo import InterleaveStereoCompressionModel

    torch.manual_seed(29)
    t5 = T5Config(vocab_size=50, d_model=24, d_kv=6, d_ff=32, num_layers=2,
                  num_heads=4)
    enc = EncodecConfig(audio_channels=1, num_filters=4, num_residual_layers=1,
                        upsampling_ratios=[4, 2], codebook_size=32,
                        codebook_dim=DIM, hidden_size=DIM, num_lstm_layers=1,
                        target_bandwidths=[40.0], sampling_rate=16000,
                        normalize=False, use_causal_conv=True)
    dec = MusicgenDecoderConfig(
        vocab_size=CARD, hidden_size=DIM, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, ffn_dim=FFN, num_codebooks=2 * N_Q,
        audio_channels=2, dropout=0.0, scale_embedding=False,
        max_position_embeddings=64, use_cache=False)
    cfg = MusicgenConfig.from_sub_models_config(t5, enc, dec)
    model = MusicgenForConditionalGeneration(cfg).eval()

    src = tmp_path / "stereo_snapshot"
    src.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in _sd(model).items()},
              str(src / "model.safetensors"))
    (src / "config.json").write_text(json.dumps(cfg.to_dict(), default=str))

    clear_model_cache()
    mg = get_pretrained(str(src), cache_dir=str(tmp_path / "cache"))
    assert mg.lm.n_q == 2 * N_Q
    # stereo applies delay k to the interleaved channel PAIR (2k, 2k+1):
    # HF build_delay_pattern_mask works over num_codebooks//2 channel books
    assert mg.lm.pattern_provider.delays == [k // 2 for k in range(2 * N_Q)]
    assert isinstance(mg.compression_model, InterleaveStereoCompressionModel)
    assert mg.compression_model.channels == 2
    assert mg.compression_model.num_codebooks == 2 * N_Q

    codec_params = jax.tree.map(jnp.asarray, mg.codec_params)
    wav = np.random.RandomState(3).randn(1, 2, 8000).astype(np.float32) * 0.2
    codes, scale = mg.compression_model.encode(codec_params, jnp.asarray(wav))
    assert np.asarray(codes).shape[1] == 2 * N_Q
    out = mg.compression_model.decode(codec_params, codes, scale)
    assert np.asarray(out).shape[1] == 2


def test_hf_composite_import():
    """Full MusicgenForConditionalGeneration dump: decoder prefix detection,
    LM parity, and enc_to_dec_proj -> conditioner output_proj routing."""
    from transformers import T5Config
    from transformers.models.encodec.configuration_encodec import EncodecConfig
    from transformers.models.musicgen.configuration_musicgen import MusicgenConfig
    from transformers.models.musicgen.modeling_musicgen import (
        MusicgenForConditionalGeneration)

    torch.manual_seed(5)
    t5 = T5Config(vocab_size=50, d_model=24, d_kv=6, d_ff=32, num_layers=2,
                  num_heads=4)
    enc = EncodecConfig(audio_channels=1, num_filters=4, num_residual_layers=1,
                        upsampling_ratios=[4, 2], codebook_size=16,
                        codebook_dim=8, hidden_size=8)
    cfg = MusicgenConfig.from_sub_models_config(t5, enc, _hf_decoder_config())
    model = MusicgenForConditionalGeneration(cfg).eval()

    sd = KeyTracker(_sd(model))
    assert detect_lm_prefix(sd) == ("decoder.model.decoder.", "decoder.")
    ours = _make_our_lm()
    lm_params, cond_partial = import_musicgen_hf(ours, sd)

    # the trained text projection must be captured, not dropped
    proj = cond_partial["description"]["output_proj"]
    np.testing.assert_array_equal(
        proj["weight"], model.enc_to_dec_proj.weight.detach().numpy())

    # everything unmapped must belong to the separately-imported towers
    leftovers = sd.unused(ignore=HF_HARMLESS_PATTERNS)
    assert leftovers and all(
        k.startswith(("text_encoder.", "audio_encoder.")) for k in leftovers)

    # decoder parity through the composite prefixes
    B, S, Tc = 2, 7, 3
    rng = np.random.RandomState(7)
    codes = rng.randint(0, CARD, (B, N_Q, S))
    ench = rng.randn(B, Tc, DIM).astype(np.float32)
    with torch.no_grad():
        logits_ref = model.decoder(
            input_ids=torch.as_tensor(codes.reshape(B * N_Q, S)),
            encoder_hidden_states=torch.as_tensor(ench)
        ).logits.numpy().reshape(B, N_Q, S, CARD)
    params = jax.tree.map(jnp.asarray, lm_params)
    mask = jnp.ones((B, Tc), dtype=jnp.int32)
    logits, _ = ours.forward(params, jnp.asarray(codes),
                             {"description": (jnp.asarray(ench), mask)})
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=5e-5, rtol=1e-4)


def _write_composite_snapshot(dst, seed=17, sample_rate=16000):
    """Build a live tiny MusicgenForConditionalGeneration and dump it in the
    hub layout (config.json + model.safetensors)."""
    import json

    from safetensors.numpy import save_file
    from transformers import T5Config
    from transformers.models.encodec.configuration_encodec import EncodecConfig
    from transformers.models.musicgen.configuration_musicgen import MusicgenConfig
    from transformers.models.musicgen.modeling_musicgen import (
        MusicgenForConditionalGeneration)

    torch.manual_seed(seed)
    t5 = T5Config(vocab_size=50, d_model=24, d_kv=6, d_ff=32, num_layers=2,
                  num_heads=4)
    t5._name_or_path = "t5-small"
    enc = EncodecConfig(audio_channels=1, num_filters=4, num_residual_layers=1,
                        upsampling_ratios=[4, 2], codebook_size=CARD + 15,
                        codebook_dim=DIM, hidden_size=DIM, num_lstm_layers=1,
                        # 40 kbps at 2 kHz frames x 5 bits -> 4 codebooks,
                        # matching the decoder's num_codebooks (= N_Q)
                        target_bandwidths=[40.0],
                        sampling_rate=sample_rate,
                        normalize=False, use_causal_conv=True)
    cfg = MusicgenConfig.from_sub_models_config(t5, enc, _hf_decoder_config())
    model = MusicgenForConditionalGeneration(cfg).eval()
    dst.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in _sd(model).items()},
              str(dst / "model.safetensors"))
    (dst / "config.json").write_text(json.dumps(cfg.to_dict(), default=str))
    return model


class _StubTokenizer:
    """Offline stand-in for the HF T5 tokenizer (network-blocked here)."""

    def __call__(self, entries, return_tensors='np', padding=True):
        n = max(len(e.split()) for e in entries) + 1
        ids = np.zeros((len(entries), n), dtype=np.int32)
        mask = np.zeros((len(entries), n), dtype=np.int32)
        for i, e in enumerate(entries):
            toks = [hash(w) % 30000 + 2 for w in e.split()] + [1]
            ids[i, :len(toks)] = toks
            mask[i, :len(toks)] = 1
        return {'input_ids': ids, 'attention_mask': mask}


def test_snapshot_to_generate_cli(tmp_path, monkeypatch):
    """The full product loop (VERDICT r2 #1): import a live HF snapshot
    through the generate CLI's --checkpoint and end at a playable wav
    (reference musicgen.py:100-143 + app.py:300-315)."""
    from audiocraft_tpu.apps.generate import main as generate_main
    from audiocraft_tpu.ckpt.loaders import clear_model_cache
    from audiocraft_tpu.cond.conditioners import T5Conditioner
    from audiocraft_tpu.io.wav import wav_read

    _write_composite_snapshot(tmp_path / "snap", seed=37)
    monkeypatch.setenv('AUDIOCRAFT_TPU_CACHE_DIR', str(tmp_path / "cache"))
    monkeypatch.setattr(T5Conditioner, 'load_tokenizer',
                        lambda self: _StubTokenizer())
    clear_model_cache()
    try:
        out = tmp_path / "gen"
        generate_main(["a calm piano piece", "--checkpoint",
                       str(tmp_path / "snap"), "--duration", "0.05",
                       "--out", str(out), "--seed", "3"])
        wav, sr = wav_read(out.with_suffix('.wav'))
        assert sr == 16000
        assert wav.shape[0] == 1 and wav.shape[1] > 0
        assert np.isfinite(wav).all()
    finally:
        clear_model_cache()


def test_decoder_only_snapshot_fails_clearly(tmp_path):
    """A MusicgenForCausalLM snapshot (no audio_encoder tower) cannot become
    a generate-ready model: get_pretrained must raise a clear error and leave
    NO half-converted dir in the cache (the conversion is atomic)."""
    import json

    from safetensors.numpy import save_file

    from audiocraft_tpu.ckpt.loaders import clear_model_cache, get_pretrained

    ref = _make_hf_lm(seed=23)
    src = tmp_path / "decoder_only"
    src.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in _sd(ref).items()},
              str(src / "model.safetensors"))
    (src / "config.json").write_text(json.dumps(ref.config.to_dict(),
                                                default=str))

    cache = tmp_path / "cache"
    clear_model_cache()
    with pytest.raises(ValueError, match="decoder-only"):
        get_pretrained(str(src), cache_dir=str(cache))
    # atomicity: nothing half-written may survive under the cache dir
    leftover = [p for p in cache.glob("**/*") if p.is_dir()]
    assert all("lm" not in p.name for p in leftover), leftover


def test_hf_snapshot_records_unmapped_lm_keys(tmp_path):
    """Extra decoder-side keys dropped during snapshot conversion must land
    in the persisted lm checkpoint's unmapped_keys (not a hardcoded [])."""
    import json

    from safetensors.numpy import save_file

    from audiocraft_tpu.ckpt.hf_import import import_hf_snapshot
    from audiocraft_tpu.ckpt.io import load_checkpoint

    ref = _make_hf_lm(seed=31)
    state = _sd(ref)
    state["model.decoder.some_mystery_adapter.weight"] = (
        np.zeros((3, 3), dtype=np.float32))
    src = tmp_path / "snap"
    src.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(src / "model.safetensors"))
    (src / "config.json").write_text(json.dumps(ref.config.to_dict(),
                                                default=str))

    seen = []
    import_hf_snapshot(src, tmp_path / "out", unmapped_hook=seen.append)
    assert seen and "model.decoder.some_mystery_adapter.weight" in seen[0]
    _, _, meta = load_checkpoint(tmp_path / "out" / "lm")
    assert ("model.decoder.some_mystery_adapter.weight"
            in meta["extra"]["unmapped_keys"])
