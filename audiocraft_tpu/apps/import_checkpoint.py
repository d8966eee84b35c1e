"""CLI: convert published torch Audiocraft checkpoints to our format.

    python -m audiocraft_tpu.apps.import_checkpoint compression \
        compression_state_dict.bin --out ckpt_codec [--config 32khz]
    python -m audiocraft_tpu.apps.import_checkpoint lm state_dict.bin \
        --out ckpt_lm --size small [--melody]

Reads the reference's exported checkpoint layout (utils/export.py:20-79:
``{'best_state': ..., 'xp.cfg': ...}`` or a raw state dict), maps weights
through ckpt.torch_import, and writes a self-describing checkpoint directory
(ckpt.io.save_checkpoint).  This is how the published MusicGen/EnCodec weights
land on TPU once available.
"""

from __future__ import annotations

import argparse


def load_torch_state(path: str) -> dict:
    """Load a torch checkpoint into {name: np.ndarray} without CUDA."""
    import torch
    pkg = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(pkg, dict) and 'best_state' in pkg:
        state = pkg['best_state']
    elif isinstance(pkg, dict) and 'state_dict' in pkg:
        state = pkg['state_dict']
    else:
        state = pkg
    return {k: v.numpy() if hasattr(v, 'numpy') else v
            for k, v in state.items()}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('kind', choices=['compression', 'lm'])
    parser.add_argument('checkpoint')
    parser.add_argument('--out', required=True)
    parser.add_argument('--config', default='32khz',
                        choices=['32khz', '24khz', 'debug'])
    parser.add_argument('--size', default='small',
                        choices=['small', 'medium', 'large'])
    parser.add_argument('--melody', action='store_true')
    args = parser.parse_args(argv)

    from ..builders import (get_debug_compression_model, get_encodec_24khz,
                            get_encodec_32khz, get_musicgen_lm)
    from ..ckpt.io import save_checkpoint
    from ..ckpt.torch_import import import_encodec, import_lm

    sd = load_torch_state(args.checkpoint)

    if args.kind == 'compression':
        model = {'32khz': get_encodec_32khz, '24khz': get_encodec_24khz,
                 'debug': get_debug_compression_model}[args.config]()
        params = import_encodec(model, sd)
    else:
        model, _provider = get_musicgen_lm(args.size, melody=args.melody)
        params = import_lm(model, sd)

    path = save_checkpoint(args.out, model, params,
                           extra={'source': args.checkpoint})
    print(f"imported {len(sd)} tensors -> {path}")


if __name__ == '__main__':
    main()
