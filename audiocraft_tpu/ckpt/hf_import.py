"""HuggingFace-format MusicGen checkpoint importer.

Published MusicGen weights predominantly circulate in the HF Transformers
layout (``MusicgenForConditionalGeneration`` /
``MusicgenForCausalLM``), which renames and re-splits the original
Audiocraft modules:

* fused ``in_proj_weight`` -> separate ``q_proj``/``k_proj``/``v_proj``
* ``norm1``/``norm_cross``/``norm2`` -> ``self_attn_layer_norm`` /
  ``encoder_attn_layer_norm`` / ``final_layer_norm``
* ``linear1``/``linear2`` -> ``fc1``/``fc2``
* stacked ``emb.{k}`` / ``linears.{k}`` -> ``embed_tokens.{k}`` /
  ``lm_heads.{k}``
* the T5 conditioner's trained ``output_proj`` -> top-level
  ``enc_to_dec_proj``

(see HF ``transformers/models/musicgen/modeling_musicgen.py``; the layouts
are architecturally identical to reference ``audiocraft/models/lm.py`` +
``audiocraft/modules/transformer.py:138-488`` — pre-norm decoder, sinusoidal
positions with the same tensor2tensor cos|sin layout, bias-free attention
and FFN).  This module maps that layout straight into our LMModel /
T5Conditioner param pytrees so a user can drop HF-downloaded ``.bin`` /
``.safetensors`` state dicts into the TPU framework.

Like :mod:`.torch_import`, inputs are flat ``{name: np.ndarray}`` dicts (no
torch dependency here) and callers should wrap them in
:class:`~audiocraft_tpu.ckpt.torch_import.KeyTracker` to get unmapped-key
reporting.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from .torch_import import StateDict, _linear

#: HF buffers with no place in a param tree (recomputed / bookkeeping).
HF_HARMLESS_PATTERNS = (
    r"embed_positions\.weights$",       # sinusoidal buffer, recomputed
    r"position_bias",                    # T5 relative bias handled in-tree
    r"num_batches_tracked$",
)


def detect_lm_prefix(sd: tp.Mapping[str, tp.Any]) -> tp.Tuple[str, str]:
    """Locate the decoder tower and lm heads inside an HF state dict.

    Returns ``(decoder_prefix, heads_prefix)`` such that
    ``f"{decoder_prefix}layers.0..."`` and ``f"{heads_prefix}lm_heads.0..."``
    resolve.  Handles the three published layouts:

    * ``MusicgenForConditionalGeneration``: ``decoder.model.decoder.*`` +
      ``decoder.lm_heads.*``
    * ``MusicgenForCausalLM``: ``model.decoder.*`` + ``lm_heads.*``
    * bare ``MusicgenModel``/decoder dumps: ``decoder.*`` or ``""``
    """
    for dec, heads in (("decoder.model.decoder.", "decoder."),
                       ("model.decoder.", ""),
                       ("decoder.", ""),
                       ("", "")):
        if f"{dec}layers.0.self_attn.q_proj.weight" in sd:
            return dec, heads
    raise KeyError(
        "state dict does not look like an HF MusicGen checkpoint "
        "(no '<prefix>layers.0.self_attn.q_proj.weight' key found)")


def _hf_attention(sd: StateDict, prefix: str) -> dict:
    """Re-fuse HF's split q/k/v projections into our ``in_proj_weight``."""
    q = np.asarray(sd[f"{prefix}.q_proj.weight"])
    k = np.asarray(sd[f"{prefix}.k_proj.weight"])
    v = np.asarray(sd[f"{prefix}.v_proj.weight"])
    params = {
        "in_proj_weight": np.concatenate([q, k, v], axis=0),
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }
    if f"{prefix}.q_proj.bias" in sd:
        params["in_proj_bias"] = np.concatenate(
            [np.asarray(sd[f"{prefix}.q_proj.bias"]),
             np.asarray(sd[f"{prefix}.k_proj.bias"]),
             np.asarray(sd[f"{prefix}.v_proj.bias"])], axis=0)
    return params


def _hf_layer(sd: StateDict, prefix: str) -> dict:
    params = {
        "self_attn": _hf_attention(sd, f"{prefix}.self_attn"),
        "norm1": _linear(sd, f"{prefix}.self_attn_layer_norm"),
        "norm2": _linear(sd, f"{prefix}.final_layer_norm"),
        "linear1": _linear(sd, f"{prefix}.fc1"),
        "linear2": _linear(sd, f"{prefix}.fc2"),
    }
    if f"{prefix}.encoder_attn.q_proj.weight" in sd:
        params["cross_attention"] = _hf_attention(sd, f"{prefix}.encoder_attn")
        params["norm_cross"] = _linear(sd, f"{prefix}.encoder_attn_layer_norm")
    return params


def import_lm_hf(model, sd: StateDict,
                 prefixes: tp.Optional[tp.Tuple[str, str]] = None) -> dict:
    """Import an HF MusicGen decoder state dict into our LMModel params.

    ``model`` is our :class:`~audiocraft_tpu.lm.model.LMModel` config (shapes
    must match the checkpoint).  ``prefixes`` overrides auto-detection (see
    :func:`detect_lm_prefix`).
    """
    dec, heads = prefixes if prefixes is not None else detect_lm_prefix(sd)
    n_q = model.n_q
    params = {
        "emb": np.stack([np.asarray(sd[f"{dec}embed_tokens.{k}.weight"])
                         for k in range(n_q)]),
        "transformer": {
            f"layer{i}": _hf_layer(sd, f"{dec}layers.{i}")
            for i in range(model.num_layers)
        },
        "linears": {
            "weight": np.stack([np.asarray(sd[f"{heads}lm_heads.{k}.weight"])
                                for k in range(n_q)]),
        },
        # HF `layer_norm` is the audiocraft `out_norm` (pre-norm final LN)
        "out_norm": _linear(sd, f"{dec}layer_norm"),
    }
    if params["emb"].shape[1] != model.card + 1:
        raise ValueError(
            f"checkpoint vocab {params['emb'].shape[1] - 1} != model card "
            f"{model.card}")
    return params


def import_t5_conditioner_hf(conditioner, sd: StateDict,
                             text_prefix: str = "text_encoder.",
                             proj_prefix: str = "enc_to_dec_proj") -> dict:
    """Import the text tower of a ``MusicgenForConditionalGeneration`` dump
    into our T5Conditioner params: the frozen T5 encoder plus the *trained*
    ``enc_to_dec_proj`` (the audiocraft conditioner's ``output_proj`` —
    dropping it would leave conditioning randomly projected)."""
    from .torch_import import import_t5
    cfg = conditioner.t5_config
    params: dict = {}
    probe = f"{text_prefix}shared.weight"
    if (f"{text_prefix}encoder.block.0.layer.0.SelfAttention.q.weight" in sd
            and probe in sd
            and np.asarray(sd[probe]).shape[1] == cfg.d_model):
        params["t5"] = import_t5(sd, cfg.num_layers, gated=cfg.gated_act,
                                 prefix=text_prefix.rstrip("."))
    if f"{proj_prefix}.weight" in sd:
        params["output_proj"] = _linear(sd, proj_prefix)
    return params


def lm_from_hf_config(cfg: tp.Mapping[str, tp.Any]):
    """Build (LMModel, ConditioningProvider) from an HF MusicGen
    ``config.json`` mapping (composite or decoder-only).

    HF MusicGen decoders are always the published audiocraft architecture:
    pre-norm, bias-free attention/FFN, sinusoidal positions, delayed pattern
    (HF ``build_delay_pattern_mask`` == reference DelayedPatternProvider).
    The text tower maps to a T5Conditioner at the decoder width.
    """
    from ..cond.conditioners import ConditioningProvider, T5Conditioner
    from ..cond.fuser import ConditionFuser
    from ..lm.model import LMModel
    from ..patterns import DelayedPatternProvider

    dec = cfg.get("decoder", cfg)
    dim = int(dec.get("hidden_size", 1024))
    n_q = int(dec.get("num_codebooks", 4))
    ffn = int(dec.get("ffn_dim", 4 * dim))
    if ffn % dim:
        raise ValueError(f"ffn_dim {ffn} not a multiple of hidden_size {dim}")
    # Stereo snapshots (decoder audio_channels == 2) interleave the two
    # channels' codebooks as (2k, 2k+1) and apply delay k to the PAIR — HF
    # build_delay_pattern_mask works over channel_codebooks=num_codebooks//2,
    # matching the reference stereo configs.  Mono keeps delays [0..n_q-1].
    if int(dec.get("audio_channels", 1)) == 2:
        delays = [k // 2 for k in range(n_q)]
    else:
        delays = None
    t5_name = "t5-base"
    t5_cfg = None
    text = cfg.get("text_encoder")
    if text:
        cand = text.get("_name_or_path", "")
        if cand in T5Conditioner.MODELS_DIMS:
            t5_name = cand
        # build the tower architecture from the snapshot's OWN text_encoder
        # config (not by name) so the encoder always matches the shipped
        # weights — published checkpoints can carry non-standard T5 shapes
        from ..nn.t5 import T5EncoderConfig
        t5_cfg = T5EncoderConfig(
            vocab_size=int(text.get("vocab_size", 32128)),
            d_model=int(text.get("d_model", 512)),
            d_kv=int(text.get("d_kv", 64)),
            d_ff=int(text.get("d_ff", 2048)),
            num_layers=int(text.get("num_layers", 6)),
            num_heads=int(text.get("num_heads", 8)),
            relative_attention_num_buckets=int(
                text.get("relative_attention_num_buckets", 32)),
            relative_attention_max_distance=int(
                text.get("relative_attention_max_distance", 128)),
            gated_act="gated" in str(text.get("feed_forward_proj", "relu")))
    provider = ConditioningProvider.from_dict({
        "description": T5Conditioner(name=t5_name, output_dim=dim,
                                     config=t5_cfg)})
    fuser = ConditionFuser.from_dict({"cross": ("description",)})
    lm = LMModel(
        pattern_provider=DelayedPatternProvider(n_q, delays=delays),
        fuser=fuser,
        n_q=n_q, card=int(dec.get("vocab_size", 2048)), dim=dim,
        num_heads=int(dec.get("num_attention_heads", 16)),
        num_layers=int(dec.get("num_hidden_layers", 24)),
        hidden_scale=ffn // dim, cross_attention=True, causal=True,
        norm_first=True, bias_proj=False, bias_ff=False, bias_attn=False,
        activation=str(dec.get("activation_function", "gelu")))
    return lm, provider


def import_hf_snapshot(src, out,
                       unmapped_hook: tp.Optional[tp.Callable[
                           [tp.List[str]], None]] = None,
                       require_codec: bool = False) -> None:
    """Convert an HF hub snapshot directory (``config.json`` +
    ``model.safetensors`` / sharded safetensors / ``pytorch_model.bin``) into
    our checkpoint layout ``<out>/{lm,compression}`` — the format
    :func:`~audiocraft_tpu.ckpt.loaders.get_pretrained` serves.

    Composite dumps (``MusicgenForConditionalGeneration``) yield both sides;
    decoder-only dumps (``MusicgenForCausalLM``) yield the LM only — pass
    ``require_codec=True`` to fail loudly instead when the caller needs a
    generate-ready ``{lm,compression}`` pair.
    """
    import json
    from pathlib import Path

    import jax

    from .io import save_checkpoint
    from .torch_import import (HARMLESS_BUFFER_PATTERNS, KeyTracker,
                               merge_params)

    src, out = Path(src), Path(out)
    with open(src / "config.json") as fh:
        cfg = json.load(fh)
    state = _load_snapshot_weights(src)
    has_codec = any(k.startswith("audio_encoder.") for k in state)
    if require_codec and not has_codec:
        raise ValueError(
            f"HF snapshot {src} is decoder-only (MusicgenForCausalLM: no "
            "'audio_encoder.*' tower) — it cannot generate audio by itself. "
            "Use a composite MusicgenForConditionalGeneration snapshot, or "
            "convert with apps.import_checkpoint and pair the LM with a "
            "separately imported EnCodec checkpoint.")
    sd = KeyTracker(state)

    lm, provider = lm_from_hf_config(cfg)
    lm_params, cond_partial = import_musicgen_hf(lm, sd, provider=provider)
    cond_params = merge_params(provider.init(jax.random.PRNGKey(0)),
                               cond_partial)

    codec_save = None
    if has_codec:
        from ..codec.wrappers import HFEncodecCompressionModel
        codec_sd = KeyTracker({k[len("audio_encoder."):]: v
                               for k, v in state.items()
                               if k.startswith("audio_encoder.")})
        wrapped = HFEncodecCompressionModel.from_hf_config(
            cfg.get("audio_encoder", {}))
        codec_params = wrapped.import_hf_state(codec_sd)
        for key in codec_sd.used:
            sd.used.add(f"audio_encoder.{key}")
        # stereo checkpoints (musicgen-stereo-*) keep a mono codec and carry
        # stereo as 2x interleaved codebooks (decoder audio_channels == 2)
        if int(cfg.get("decoder", cfg).get("audio_channels", 1)) == 2:
            from ..codec.stereo import InterleaveStereoCompressionModel
            wrapped = InterleaveStereoCompressionModel(model=wrapped)
        codec_save = (wrapped, codec_params, codec_sd.unused(
            ignore=HARMLESS_BUFFER_PATTERNS))

    # compute the LM-side leftover BEFORE saving so the persisted checkpoint
    # records the true unmapped-keys list (not a hardcoded clean import)
    leftover = sd.unused(
        ignore=HARMLESS_BUFFER_PATTERNS + HF_HARMLESS_PATTERNS)
    lm_leftover = [k for k in leftover if not k.startswith("audio_encoder.")]
    save_checkpoint(out / "lm",
                    {"lm": lm, "condition_provider": provider},
                    {"lm": lm_params, "condition_provider": cond_params},
                    extra={"source": str(src), "unmapped_keys": lm_leftover})
    if codec_save is not None:
        wrapped, codec_params, codec_leftover = codec_save
        save_checkpoint(out / "compression", wrapped, codec_params,
                        extra={"source": str(src),
                               "unmapped_keys": codec_leftover})

    if leftover and unmapped_hook is not None:
        unmapped_hook(leftover)


def _load_snapshot_weights(src) -> StateDict:
    """Flat {name: np.ndarray} from an HF snapshot dir: single / sharded
    safetensors, or a torch .bin loaded with weights_only=True."""
    import json

    if (src / "model.safetensors").exists():
        from safetensors.numpy import load_file
        return dict(load_file(str(src / "model.safetensors")))
    index = src / "model.safetensors.index.json"
    if index.exists():
        from safetensors.numpy import load_file
        with open(index) as fh:
            weight_map = json.load(fh)["weight_map"]
        state: tp.Dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            state.update(load_file(str(src / shard)))
        return state
    if (src / "pytorch_model.bin").exists():
        import torch
        pkg = torch.load(str(src / "pytorch_model.bin"), map_location="cpu",
                         weights_only=True)
        return {k: v.numpy() for k, v in pkg.items()}
    raise FileNotFoundError(f"no weights file found under {src}")


def import_musicgen_hf(lm_model, sd: StateDict,
                       provider=None) -> tp.Tuple[dict, tp.Dict[str, dict]]:
    """One-call import of a full ``MusicgenForConditionalGeneration`` state
    dict: returns ``(lm_params, conditioner_partial)`` where the partial maps
    conditioner name -> params to :func:`merge_params` over provider init.

    The HF composite also carries ``audio_encoder.*`` (EnCodec) — import that
    side with :class:`~audiocraft_tpu.codec.wrappers.HFEncodecModel` /
    ``import_encodec_hf``, it is a separate checkpoint in our layout.
    """
    lm_params = import_lm_hf(lm_model, sd)
    cond_partial: tp.Dict[str, dict] = {}
    if provider is not None:
        for name, cond in provider.conditioners:
            if cond.__class__.__name__ == "T5Conditioner":
                p = import_t5_conditioner_hf(cond, sd)
                if p:
                    cond_partial[name] = p
    elif "enc_to_dec_proj.weight" in sd:
        cond_partial["description"] = {
            "output_proj": _linear(sd, "enc_to_dec_proj")}
    return lm_params, cond_partial
