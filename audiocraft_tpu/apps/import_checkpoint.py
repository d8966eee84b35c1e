"""CLI: convert published torch Audiocraft checkpoints to our format.

    python -m audiocraft_tpu.apps.import_checkpoint compression \
        compression_state_dict.bin --out ckpt_codec [--config 32khz]
    python -m audiocraft_tpu.apps.import_checkpoint lm state_dict.bin \
        --out ckpt_lm --size small [--melody] [--t5-state t5.bin]

Reads the reference's exported checkpoint layout (utils/export.py:20-79:
``{'best_state': ..., 'xp.cfg': ...}`` or a raw state dict), maps weights
through ckpt.torch_import, and writes a self-describing checkpoint directory
(ckpt.io.save_checkpoint).  This is how the published MusicGen/EnCodec weights
land on TPU once available.

LM checkpoints save *both* the transformer weights and the trained conditioner
parameters (``condition_provider.conditioners.<name>.output_proj`` etc. — the
reference trains and ships these; dropping them would condition on noise).
Any state-dict key no importer consumed is reported loudly.

Untrusted checkpoints are loaded with ``torch.load(weights_only=True)``;
arbitrary-pickle fallback requires an explicit ``--unsafe-pickle``.
"""

from __future__ import annotations

import argparse
import sys


def load_torch_state(path: str, allow_unsafe: bool = False) -> dict:
    """Load a torch checkpoint into {name: np.ndarray} (state dict only)."""
    return load_torch_package(path, allow_unsafe)[0]


def load_torch_package(path: str, allow_unsafe: bool = False):
    """Load a torch checkpoint into ({name: np.ndarray}, xp_cfg | None).

    Tries the safe `weights_only=True` path first (plain state dicts and the
    reference export layout), adding omegaconf containers to the safelist if
    the export embedded its `xp.cfg`.  Arbitrary pickle execution is only
    allowed with `allow_unsafe` (the CLI's --unsafe-pickle flag).

    The returned ``xp_cfg`` is the checkpoint-embedded reference config as a
    plain dict (reference utils/export.py:20-79 embeds it; loaders.py:158-214
    rebuilds the model FROM it) — feed it to ``audiocraft_tpu.config``.
    """
    if path.endswith('.safetensors'):
        # HF hub distribution format — pure tensor container, no pickle at all
        from safetensors.numpy import load_file
        return dict(load_file(path)), None

    import torch

    def _load_safe():
        try:
            return torch.load(path, map_location='cpu', weights_only=True)
        except Exception:
            # exports embed `xp.cfg` as an omegaconf container; safelist it
            safe: list = []
            try:
                import omegaconf
                safe = [omegaconf.DictConfig, omegaconf.ListConfig,
                        omegaconf.base.ContainerMetadata, omegaconf.base.Metadata,
                        omegaconf.nodes.ValueNode]
            except ImportError:
                pass
            with torch.serialization.safe_globals(safe):
                return torch.load(path, map_location='cpu', weights_only=True)

    try:
        pkg = _load_safe()
    except Exception as exc:
        if not allow_unsafe:
            raise SystemExit(
                f"safe torch.load failed ({exc!r}); this checkpoint requires "
                "arbitrary pickle execution — rerun with --unsafe-pickle if "
                "you trust its source") from exc
        pkg = torch.load(path, map_location='cpu', weights_only=False)

    xp_cfg = None
    if isinstance(pkg, dict) and 'best_state' in pkg:
        state = pkg['best_state']
        from ..config import as_plain
        xp_cfg = as_plain(pkg.get('xp.cfg')) or None
    elif isinstance(pkg, dict) and 'state_dict' in pkg:
        state = pkg['state_dict']
    else:
        state = pkg
    return ({k: v.numpy() if hasattr(v, 'numpy') else v
             for k, v in state.items()}, xp_cfg)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('kind', choices=['compression', 'lm'])
    parser.add_argument('checkpoint')
    parser.add_argument('--out', required=True)
    parser.add_argument('--config', default='32khz',
                        choices=['32khz', '24khz', 'debug'])
    parser.add_argument('--size', default='small',
                        choices=['small', 'medium', 'large', 'debug'])
    parser.add_argument('--melody', action='store_true')
    parser.add_argument('--style', action='store_true')
    parser.add_argument('--t5-state', default=None,
                        help='optional torch T5 encoder state dict to bundle '
                             '(published LM exports exclude the frozen T5)')
    parser.add_argument('--hf-config', default=None,
                        help='HF config.json for compression imports in the '
                             'HF EnCodec layout (a composite MusicGen '
                             'config.json works too — its audio_encoder '
                             'section is used)')
    parser.add_argument('--unsafe-pickle', action='store_true',
                        help='allow torch.load with weights_only=False '
                             '(executes arbitrary pickle code)')
    parser.add_argument('--compute-dtype', default='bfloat16',
                        choices=['bfloat16', 'float32'],
                        help='codec compute dtype when building from an '
                             'embedded xp.cfg (bfloat16 = production '
                             'throughput path; float32 = parity dtype)')
    parser.add_argument('--ignore-embedded-cfg', action='store_true',
                        help='build from the --config/--size fallback even '
                             'when the checkpoint embeds an xp.cfg')
    args = parser.parse_args(argv)

    import jax

    from ..builders import (get_debug_compression_model, get_debug_musicgen_lm,
                            get_encodec_24khz, get_encodec_32khz,
                            get_musicgen_lm)
    from ..ckpt.io import save_checkpoint
    from ..ckpt.torch_import import (HARMLESS_BUFFER_PATTERNS, KeyTracker,
                                     import_conditioners, import_encodec,
                                     import_lm, import_t5, merge_params)
    from ..config import (compression_model_from_cfg, diff_models,
                          lm_from_cfg)

    state, xp_cfg = load_torch_package(args.checkpoint,
                                       allow_unsafe=args.unsafe_pickle)
    sd = KeyTracker(state)
    if args.ignore_embedded_cfg:
        xp_cfg = None

    def _fallback_codec():
        return {'32khz': get_encodec_32khz, '24khz': get_encodec_24khz,
                'debug': get_debug_compression_model}[args.config]()

    def _fallback_lm():
        if args.size == 'debug':
            return get_debug_musicgen_lm()
        return get_musicgen_lm(args.size, melody=args.melody,
                               style=args.style)

    def _report_cfg_build(report, built, fallback, label):
        summary = report.summary()
        if summary:
            print(f"[{label} <- embedded xp.cfg]\n{summary}", file=sys.stderr)
        delta = diff_models(built, fallback)
        if delta:
            print(f"[{label}] embedded xp.cfg differs from the "
                  f"--{'config' if args.kind == 'compression' else 'size'} "
                  "fallback (xp.cfg wins):", file=sys.stderr)
            for line in delta:
                print(f"  {line}", file=sys.stderr)

    if args.kind == 'compression':
        # composite MusicgenForConditionalGeneration dumps carry the codec
        # tower under `audio_encoder.`; strip to the bare HF EnCodec layout
        if any(k.startswith('audio_encoder.') for k in state):
            state = {k[len('audio_encoder.'):]: v for k, v in state.items()
                     if k.startswith('audio_encoder.')}
            sd = KeyTracker(state)
        if 'quantizer.layers.0.codebook.embed' in sd:
            # HF Transformers EnCodec layout (hub distribution format)
            import json
            from ..codec.wrappers import HFEncodecCompressionModel
            hf_cfg = {}
            if args.hf_config:
                with open(args.hf_config) as fh:
                    hf_cfg = json.load(fh)
                hf_cfg = hf_cfg.get('audio_encoder', hf_cfg)
            else:
                print('[codec] HF layout without --hf-config: building from '
                      'EnCodec defaults (24 kHz); pass the checkpoint\'s '
                      'config.json to be sure', file=sys.stderr)
            dtype = (None if args.compute_dtype == 'float32'
                     else args.compute_dtype)
            wrapped = HFEncodecCompressionModel.from_hf_config(
                hf_cfg, compute_dtype=dtype)
            print('[codec] detected HF Transformers EnCodec layout',
                  file=sys.stderr)
            params = wrapped.import_hf_state(sd)
            leftover = sd.unused(ignore=HARMLESS_BUFFER_PATTERNS)
            if leftover:
                print(f"WARNING: {len(leftover)} state-dict keys were NOT "
                      "imported:", file=sys.stderr)
                for key in leftover:
                    print(f"  - {key}", file=sys.stderr)
            path = save_checkpoint(args.out, wrapped, params,
                                   extra={'source': args.checkpoint,
                                          'unmapped_keys': leftover})
            print(f"imported {len(sd.used)}/{len(sd)} tensors -> {path}")
            return
        if xp_cfg is not None and 'encodec' in xp_cfg:
            dtype = (None if args.compute_dtype == 'float32'
                     else args.compute_dtype)
            model, report = compression_model_from_cfg(
                xp_cfg, compute_dtype=dtype)
            _report_cfg_build(report, model, _fallback_codec(), 'codec')
        else:
            model = _fallback_codec()
        params = import_encodec(model, sd)
        to_save, save_params = model, params
    else:
        if xp_cfg is not None and 'transformer_lm' in xp_cfg:
            model, provider, report = lm_from_cfg(xp_cfg)
            fb_model, fb_provider = _fallback_lm()
            _report_cfg_build(report, model, fb_model, 'lm')
        else:
            model, provider = _fallback_lm()
        if 'emb.0.weight' in sd:
            # original audiocraft export layout
            lm_params = import_lm(model, sd)
            imported_cond = import_conditioners(provider, sd)
        else:
            # HF Transformers layout (MusicgenForCausalLM /
            # MusicgenForConditionalGeneration — the hub distribution format)
            from ..ckpt.hf_import import import_musicgen_hf
            lm_params, imported_cond = import_musicgen_hf(
                model, sd, provider=provider)
            print("[lm] detected HF Transformers checkpoint layout",
                  file=sys.stderr)
        cond_params = provider.init(jax.random.PRNGKey(0))
        for name, _ in provider.conditioners:
            if name not in imported_cond:
                print(f"WARNING: conditioner '{name}' has no trained "
                      "parameters in this checkpoint; it stays random-init",
                      file=sys.stderr)
        cond_params = merge_params(cond_params, imported_cond)
        if args.t5_state is not None:
            from ..cond.conditioners import T5Conditioner
            from ..nn.t5 import T5EncoderConfig
            t5_sd = load_torch_state(args.t5_state,
                                     allow_unsafe=args.unsafe_pickle)
            for name, cond in provider.conditioners:
                if isinstance(cond, T5Conditioner):
                    cfg = T5EncoderConfig.for_name(cond.name)
                    cond_params[name]['t5'] = import_t5(
                        t5_sd, cfg.num_layers, gated=cfg.gated_act)
        to_save = {'lm': model, 'condition_provider': provider}
        save_params = {'lm': lm_params, 'condition_provider': cond_params}

    from ..ckpt.hf_import import HF_HARMLESS_PATTERNS
    leftover = sd.unused(ignore=HARMLESS_BUFFER_PATTERNS + HF_HARMLESS_PATTERNS)
    audio_enc = [k for k in leftover if k.startswith('audio_encoder.')]
    if audio_enc:
        # HF composite dumps bundle the EnCodec tower; in our layout that is
        # a separate `compression` checkpoint (HFEncodecCompressionModel)
        print(f"NOTE: {len(audio_enc)} 'audio_encoder.*' keys skipped — "
              "import the codec separately with kind=compression",
              file=sys.stderr)
        leftover = [k for k in leftover if not k.startswith('audio_encoder.')]
    if leftover:
        print(f"WARNING: {len(leftover)} state-dict keys were NOT imported:",
              file=sys.stderr)
        for key in leftover:
            print(f"  - {key}", file=sys.stderr)

    path = save_checkpoint(args.out, to_save, save_params,
                           extra={'source': args.checkpoint,
                                  'unmapped_keys': leftover})
    print(f"imported {len(sd.used)}/{len(sd)} tensors -> {path}")


if __name__ == '__main__':
    main()
