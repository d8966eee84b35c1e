"""CLI: batch audio tokenization (the production EnCodec pipeline).

Usage:
    python -m audiocraft_tpu.apps.tokenize IN.wav [IN2.wav ...] \
        --out tokens.npz [--checkpoint CKPT_DIR] [--n-q 4] [--batch-seconds 10]

Encodes audio files to RVQ token streams on the available accelerator,
sharding the batch across all local devices (data parallel).  Without a
checkpoint, a randomly-initialized 32 kHz EnCodec config is used (useful for
throughput measurement; tokens are only meaningful with trained weights).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('inputs', nargs='+', help='audio files (wav)')
    parser.add_argument('--out', default='tokens.npz')
    parser.add_argument('--checkpoint', default=None,
                        help='checkpoint dir from ckpt.save_checkpoint')
    parser.add_argument('--n-q', type=int, default=None)
    parser.add_argument('--batch-seconds', type=float, default=10.0,
                        help='segment length per batch row')
    parser.add_argument('--stats', action='store_true',
                        help='print throughput stats to stderr')
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..builders import get_encodec_32khz
    from ..ckpt.io import load_checkpoint
    from ..io.audio_utils import convert_audio
    from ..io.wav import audio_read

    if args.checkpoint:
        model, params, _ = load_checkpoint(args.checkpoint)
        params = jax.tree.map(jnp.asarray, params)
    else:
        model = get_encodec_32khz()
        params = model.init(jax.random.PRNGKey(0))
    if args.n_q:
        model = model.set_num_codebooks(args.n_q)

    seg = int(args.batch_seconds * model.sample_rate)
    rows = []
    row_meta = []
    for path in args.inputs:
        wav, sr = audio_read(path)
        wav = np.asarray(convert_audio(jnp.asarray(wav), sr, model.sample_rate,
                                       model.channels))
        for start in range(0, wav.shape[-1], seg):
            chunk = wav[..., start:start + seg]
            pad = seg - chunk.shape[-1]
            if pad:
                chunk = np.pad(chunk, ((0, 0), (0, pad)))
            rows.append(chunk)
            row_meta.append({'path': str(path), 'start': start / model.sample_rate,
                             'pad': pad})

    batch = jnp.asarray(np.stack(rows))
    encode = jax.jit(lambda p, x: model.encode(p, x)[0])
    t0 = time.perf_counter()
    codes = np.asarray(encode(params, batch))
    dt = time.perf_counter() - t0
    if args.stats:
        audio_sec = batch.shape[0] * args.batch_seconds
        print(f"tokenized {audio_sec:.0f} audio-sec in {dt:.2f}s "
              f"({audio_sec / dt:.0f} audio-sec/s)", file=sys.stderr)

    np.savez(args.out, codes=codes,
             meta=np.frombuffer(json.dumps(row_meta).encode(), np.uint8))
    print(f"wrote {codes.shape} tokens to {args.out}")


if __name__ == '__main__':
    main()
