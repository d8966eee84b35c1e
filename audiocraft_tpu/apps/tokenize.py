"""CLI: batch audio tokenization (the production EnCodec pipeline).

Usage:
    python -m audiocraft_tpu.apps.tokenize IN.wav [IN2.mp3 ...] \
        --out tokens.npz [--checkpoint CKPT_DIR] [--n-q 4] \
        [--batch-seconds 10] [--batch-rows 32]

A streaming pipeline: the native C++ batch decoder (GIL-free thread pool)
prefetches and decodes the next batch while the TPU encodes the current one;
host->device transfers are async.  Fixed [batch-rows, 1, batch-seconds*sr]
shapes mean one compile for the whole corpus.  Without a checkpoint, a
randomly-initialized 32 kHz EnCodec config is used (throughput measurement;
tokens are only meaningful with trained weights).

``--pod`` switches to time-parallel whole-file tokenization: each input is
encoded as ONE sequence time-sharded over every visible device
(``dist/pod.pod_encode`` — conv front on per-chip chunks with ICI halo
exchange, replicated LSTM/RVQ tail), token-exact vs the whole-signal
encode.  Use it on a multi-chip mesh for single-file latency; the batched
pipeline above is the multi-file throughput path.

``--chunk`` tokenizes each whole file as ONE sequence on a single chip via
sequential shifted windows (``codec/chunked.chunked_encode``, token-exact)
— hour-long files encode at ~one-window peak HBM instead of OOMing.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _plan_chunks(paths, seconds, sample_rates):
    """Static work list: (path, seek_time, row_meta) per fixed-length chunk."""
    chunks = []
    for path, (sr, dur, _ch) in zip(paths, sample_rates):
        n = max(int(np.ceil(dur / seconds)), 1)
        for i in range(n):
            chunks.append((str(path), i * seconds,
                           {'path': str(path), 'start': i * seconds}))
    return chunks


def _tokenize_wholefile(args, model, params, sr_model, encode_fn, label,
                        extra=''):
    """Whole-file tokenization: one codes_<i> entry per input."""
    import jax.numpy as jnp

    from ..io import native
    from ..io.audio_utils import convert_audio
    from ..io.wav import audio_info, audio_read

    hop = model.encoder.hop_length
    out = {}
    meta = []
    total_sec = 0.0
    t0 = time.perf_counter()
    for i, path in enumerate(args.inputs):
        sr, dur, _ch = audio_info(path)
        if native.available() and not str(path).endswith('.wav'):
            (wav, sr), = native.decode_audio_batch([str(path)], [0.0], [dur])
        else:
            wav, sr = audio_read(path, 0.0, dur)
        mono = np.asarray(convert_audio(jnp.asarray(wav), sr, sr_model, 1))
        frames = -(-mono.shape[-1] // hop)
        codes = encode_fn(params, jnp.asarray(mono[None]))
        out[f'codes_{i}'] = np.asarray(codes)[0, :, :frames]
        meta.append({'path': str(path), 'frames': frames})
        total_sec += mono.shape[-1] / sr_model
    dt = time.perf_counter() - t0

    if args.stats:
        print(f"{label} tokenize: {len(args.inputs)} file(s), "
              f"{total_sec:.1f} audio-sec{extra} in {dt:.2f} s",
              file=sys.stderr)
    np.savez(args.out, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
             **out)
    shapes = [v.shape for v in out.values()]
    print(f"wrote {shapes} tokens to {args.out}")


def _tokenize_pod(args, model, params, sr_model):
    """Whole-file time-parallel tokenization over every visible device."""
    import jax
    from jax.sharding import Mesh

    from ..dist.pod import pod_encode

    mesh = Mesh(np.array(jax.devices()), ('data',))
    pod = jax.jit(lambda p, x: pod_encode(model, p, x, mesh))
    _tokenize_wholefile(args, model, params, sr_model, pod, 'pod',
                        extra=f" over {mesh.shape['data']} device(s)")


def _tokenize_chunk(args, model, params, sr_model):
    """Whole-file single-chip tokenization at ~one-window peak memory."""
    from ..codec.chunked import chunked_encode

    def enc(p, x):
        return chunked_encode(model, p, x, chunk_frames=args.chunk_frames)[0]

    _tokenize_wholefile(args, model, params, sr_model, enc, 'chunked')


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('inputs', nargs='+', help='audio files (wav/mp3/...)')
    parser.add_argument('--out', default='tokens.npz')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--n-q', type=int, default=None)
    parser.add_argument('--batch-seconds', type=float, default=10.0)
    parser.add_argument('--batch-rows', type=int, default=32)
    parser.add_argument('--decode-threads', type=int, default=8)
    parser.add_argument('--stats', action='store_true')
    parser.add_argument('--pod', action='store_true',
                        help='time-shard each whole file over all devices '
                             '(dist/pod.pod_encode); one codes_<i> entry '
                             'per input in the output npz')
    parser.add_argument('--chunk', action='store_true',
                        help='tokenize each whole file on one chip via '
                             'sequential shifted windows (codec/chunked), '
                             'token-exact at ~one-window peak memory')
    parser.add_argument('--chunk-frames', type=int, default=1500,
                        help='window length in frames for --chunk')
    args = parser.parse_args(argv)

    import jax
    from ..utils.misc import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from ..builders import get_encodec_32khz
    from ..ckpt.io import load_checkpoint
    from ..io.audio_utils import convert_audio
    from ..io.wav import audio_info
    from ..io import native

    if args.checkpoint:
        model, params, _ = load_checkpoint(args.checkpoint)
        params = jax.tree.map(jnp.asarray, params)
    else:
        model = get_encodec_32khz()
        params = model.init(jax.random.PRNGKey(0))
    if args.n_q:
        model = model.set_num_codebooks(args.n_q)

    sr_model = model.sample_rate

    if args.pod:
        _tokenize_pod(args, model, params, sr_model)
        return
    if args.chunk:
        _tokenize_chunk(args, model, params, sr_model)
        return

    seg = int(args.batch_seconds * sr_model)
    infos = [audio_info(p) for p in args.inputs]
    chunks = _plan_chunks(args.inputs, args.batch_seconds, infos)
    rows_meta = [m for _, _, m in chunks]

    use_native = native.available() and any(
        not str(p).endswith('.wav') for p in args.inputs)

    def load_batch(batch_chunks):
        """Decode + resample one batch on the host -> [R, 1, seg] float32."""
        paths = [c[0] for c in batch_chunks]
        seeks = [c[1] for c in batch_chunks]
        durs = [args.batch_seconds] * len(batch_chunks)
        if use_native:
            decoded = native.decode_audio_batch(
                paths, seeks, durs, num_threads=args.decode_threads)
        else:
            from ..io.wav import audio_read
            decoded = [audio_read(p, s, d) for p, s, d in zip(paths, seeks, durs)]
        rows = np.zeros((args.batch_rows, 1, seg), np.float32)
        for i, (wav, sr) in enumerate(decoded):
            mono = np.asarray(convert_audio(jnp.asarray(wav), sr, sr_model, 1))
            t = min(mono.shape[-1], seg)
            rows[i, :, :t] = mono[..., :t]
        return rows

    encode = jax.jit(lambda p, x: model.encode(p, x)[0])
    batches = [chunks[i:i + args.batch_rows]
               for i in range(0, len(chunks), args.batch_rows)]

    # pipeline: decode batch i+1 on host threads while the device encodes i
    all_codes = []
    t0 = time.perf_counter()
    with ThreadPoolExecutor(1) as prefetch:
        future = prefetch.submit(load_batch, batches[0])
        for i in range(len(batches)):
            host_batch = future.result()
            if i + 1 < len(batches):
                future = prefetch.submit(load_batch, batches[i + 1])
            codes = encode(params, jnp.asarray(host_batch))
            all_codes.append(np.asarray(codes)[:len(batches[i])])
    dt = time.perf_counter() - t0

    codes = np.concatenate(all_codes, axis=0)
    if args.stats:
        from ..obs import Meter
        meter = Meter(started=t0)
        meter.add(audio_seconds=len(chunks) * args.batch_seconds,
                  tokens=int(codes.size), items=len(chunks))
        print(f"tokenize pipeline: {meter.report()}", file=sys.stderr)

    np.savez(args.out, codes=codes,
             meta=np.frombuffer(json.dumps(rows_meta).encode(), np.uint8))
    print(f"wrote {codes.shape} tokens to {args.out}")


if __name__ == '__main__':
    main()
