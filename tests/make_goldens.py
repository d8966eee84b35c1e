"""Generate golden parity fixtures from the reference torch implementation.

Run manually (``python tests/make_goldens.py``) to (re)create
``tests/goldens/*.npz``.  The goldens pin the reference's behavior at survey
time so parity keeps being checked even if the live oracle import breaks.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))

GOLDENS = Path(__file__).parent / "goldens"


def main():
    import torch
    from oracle import ref_module, to_np, to_torch

    GOLDENS.mkdir(exist_ok=True)

    # 1. debug codec weights + asset tokens
    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(23)
    codec = ref_builders.get_debug_compression_model(sample_rate=32000)
    sd = {k: to_np(v) for k, v in codec.state_dict().items()}
    np.savez(GOLDENS / "debug_codec_state.npz", **sd)

    from audiocraft_tpu.io.audio_utils import convert_audio
    from audiocraft_tpu.io.wav import audio_read
    import jax.numpy as jnp

    tokens = {}
    for asset in sorted(Path("/root/reference/assets").glob("*.mp3")):
        wav, sr = audio_read(asset, duration=4.0)
        mono = np.asarray(convert_audio(jnp.asarray(wav), sr, 32000, 1))[None]
        with torch.no_grad():
            codes = to_np(codec.encode(to_torch(mono))[0])
        tokens[asset.stem[:40]] = codes
        tokens[asset.stem[:40] + "__pcm"] = mono.astype(np.float32)
    np.savez(GOLDENS / "asset_tokens.npz", **tokens)

    # 2. debug LM greedy generation tokens
    ref_lm_mod = ref_module("audiocraft.models.lm")
    ref_pat = ref_module("audiocraft.modules.codebooks_patterns")
    ref_cond = ref_module("audiocraft.modules.conditioners")
    torch.manual_seed(21)
    pattern = ref_pat.DelayedPatternProvider(n_q=4)
    fuser = ref_cond.ConditionFuser({"cross": ["description"], "prepend": [],
                                     "sum": [], "input_interpolate": []})
    lm = ref_lm_mod.LMModel(pattern, None, fuser, n_q=4, card=60, dim=16,
                            num_heads=4, custom=True, num_layers=2,
                            cross_attention=True, causal=True, dropout=0.0)
    lm.eval()
    lm_sd = {k: to_np(v) for k, v in lm.state_dict().items()}
    np.savez(GOLDENS / "debug_lm_state.npz", **lm_sd)

    rng = np.random.RandomState(7)
    cond = rng.randn(4, 5, 16).astype(np.float32)
    mask = np.ones((4, 5), np.int64)

    class _Provider:
        def tokenize(self, conditions):
            return {"n": len(conditions)}

        def __call__(self, tokenized):
            n = tokenized["n"]
            return {"description": (to_torch(cond[:n]), to_torch(mask[:n]))}

    lm.condition_provider = _Provider()
    conditions = [ref_cond.ConditioningAttributes(text={"description": "x"})
                  for _ in range(2)]
    with torch.no_grad():
        out = to_np(lm.generate(prompt=None, conditions=conditions,
                                num_samples=2, max_gen_len=10,
                                use_sampling=False, cfg_coef=3.0))
    np.savez(GOLDENS / "debug_lm_greedy.npz", cond=cond, mask=mask, tokens=out)

    try:
        record_hf_goldens()
    except ImportError as exc:
        print(f"transformers unavailable ({exc}); HF goldens not refreshed")

    print("goldens written to", GOLDENS)


def record_hf_goldens():
    """HF-format import goldens (VERDICT r3 #5): recorded from live
    random-init transformers models so the import-parity surface keeps
    being checked with transformers absent (tests/test_hf_goldens.py).

    Four fixtures: decoder-only MusicGen LM logits, T5 encoder hidden
    states (relu + gated), HF-EnCodec tokens, and a full STEREO composite
    snapshot (pair-delay pattern + InterleaveStereo wrap).
    """
    import json

    import torch
    from transformers import T5Config, T5EncoderModel
    from transformers.models.encodec.configuration_encodec import EncodecConfig
    from transformers.models.encodec.modeling_encodec import (
        EncodecModel as HFEncodec)
    from transformers.models.musicgen.configuration_musicgen import (
        MusicgenConfig, MusicgenDecoderConfig)
    from transformers.models.musicgen.modeling_musicgen import (
        MusicgenForCausalLM, MusicgenForConditionalGeneration)

    n_q, card, dim, heads, layers, ffn = 4, 17, 32, 4, 2, 64

    def dec_config(**over):
        kw = dict(vocab_size=card, hidden_size=dim, num_hidden_layers=layers,
                  num_attention_heads=heads, ffn_dim=ffn, num_codebooks=n_q,
                  dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
                  activation_function="gelu", scale_embedding=False,
                  max_position_embeddings=64, layerdrop=0.0, use_cache=False)
        kw.update(over)
        return MusicgenDecoderConfig(**kw)

    # 5a. decoder-only MusicGen LM: state dict + logits
    torch.manual_seed(11)
    lm = MusicgenForCausalLM(dec_config()).eval()
    rng = np.random.RandomState(0)
    codes = rng.randint(0, card, (2, n_q, 9))
    enc = rng.randn(2, 5, dim).astype(np.float32)
    with torch.no_grad():
        logits = lm(input_ids=torch.as_tensor(codes.reshape(2 * n_q, 9)),
                    encoder_hidden_states=torch.as_tensor(enc),
                    ).logits.numpy().reshape(2, n_q, 9, card)
    arrays = {f"sd.{k}": v.detach().numpy() for k, v in lm.state_dict().items()}
    arrays.update(codes=codes, enc=enc, logits=logits,
                  dims=np.array([n_q, card, dim, heads, layers, ffn]))
    np.savez(GOLDENS / "hf_lm_golden.npz", **arrays)

    # 5b. T5 encoder hidden states, both FFN variants
    for gated in (False, True):
        torch.manual_seed(0)
        t5 = T5EncoderModel(T5Config(
            vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=3,
            num_heads=4, relative_attention_num_buckets=32,
            relative_attention_max_distance=128,
            feed_forward_proj='gated-gelu' if gated else 'relu',
            dropout_rate=0.0)).eval()
        ids = np.random.RandomState(0).randint(0, 512, (2, 9))
        mask = np.ones((2, 9), np.int64)
        mask[1, 6:] = 0
        with torch.no_grad():
            hidden = t5(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask)
                        ).last_hidden_state.numpy()
        arrays = {f"sd.{k}": v.detach().numpy()
                  for k, v in t5.state_dict().items()}
        arrays.update(ids=ids, mask=mask, hidden=hidden)
        np.savez(GOLDENS / f"t5_golden_{'gated' if gated else 'relu'}.npz",
                 **arrays)

    # 5c. HF-EnCodec tokens (the codec wrapper's oracle)
    torch.manual_seed(13)
    ecfg = EncodecConfig(
        target_bandwidths=[12.0, 24.0], sampling_rate=16000, audio_channels=1,
        num_filters=4, upsampling_ratios=[4, 2], codebook_size=64,
        codebook_dim=16, hidden_size=16, num_lstm_layers=1,
        num_residual_layers=1, normalize=False, use_causal_conv=True)
    hf_codec = HFEncodec(ecfg).eval()
    wav = np.random.RandomState(4).randn(2, 1, 16000).astype(np.float32) * 0.3
    with torch.no_grad():
        codes_ref = hf_codec.encode(torch.from_numpy(wav), None,
                                    bandwidth=24.0)[0][0].numpy()
    arrays = {f"sd.{k}": v.detach().numpy()
              for k, v in hf_codec.state_dict().items()}
    arrays.update(wav=wav, codes=codes_ref,
                  config_json=np.array(json.dumps(ecfg.to_dict(),
                                                  default=str)))
    np.savez(GOLDENS / "hf_encodec_golden.npz", **arrays)

    # 5d. STEREO composite snapshot: config + weights + decoder logits
    torch.manual_seed(29)
    t5c = T5Config(vocab_size=50, d_model=24, d_kv=6, d_ff=32, num_layers=2,
                   num_heads=4)
    enc_c = EncodecConfig(
        audio_channels=1, num_filters=4, num_residual_layers=1,
        upsampling_ratios=[4, 2], codebook_size=32, codebook_dim=dim,
        hidden_size=dim, num_lstm_layers=1, target_bandwidths=[40.0],
        sampling_rate=16000, normalize=False, use_causal_conv=True)
    cfg = MusicgenConfig.from_sub_models_config(
        t5c, enc_c, dec_config(num_codebooks=2 * n_q, audio_channels=2))
    composite = MusicgenForConditionalGeneration(cfg).eval()
    rng = np.random.RandomState(21)
    s_codes = rng.randint(0, card, (2, 2 * n_q, 5))
    s_enc = rng.randn(2, 3, dim).astype(np.float32)
    with torch.no_grad():
        s_logits = composite.decoder(
            input_ids=torch.as_tensor(s_codes.reshape(2 * 2 * n_q, 5)),
            encoder_hidden_states=torch.as_tensor(s_enc),
        ).logits.numpy().reshape(2, 2 * n_q, 5, card)
    s_wav = np.random.RandomState(3).randn(1, 2, 8000).astype(np.float32) * 0.2
    arrays = {f"sd.{k}": v.detach().numpy()
              for k, v in composite.state_dict().items()}
    arrays.update(codes=s_codes, enc=s_enc, logits=s_logits, wav=s_wav,
                  config_json=np.array(json.dumps(cfg.to_dict(),
                                                  default=str)))
    np.savez(GOLDENS / "hf_stereo_snapshot_golden.npz", **arrays)


if __name__ == "__main__":
    main()
