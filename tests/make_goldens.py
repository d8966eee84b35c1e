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

    print("goldens written to", GOLDENS)


if __name__ == "__main__":
    main()
