"""CLI: codec reconstruction evaluation over a corpus.

The upstream solvers' ``evaluate`` stage (stripped from the reference fork)
computed reconstruction metrics for the compression model; this rebuilds
that role over our metrics stack:

    python -m audiocraft_tpu.apps.eval_codec DATA --ckpt CKPT_DIR \
        [--segment 1.0] [--batch 8] [--json out.json]

Reports per-corpus means of:
* SI-SNR (dB, higher better) of decode(encode(x)) vs x,
* multi-scale mel-spectrogram distance (the training loss as a metric),
* waveform L1,
* per-codebook usage entropy (bits) + fraction of codes used — the codebook
  health diagnostics the RVQ EMA training needs watching,
* bitrate (kbps) implied by the model's frame rate and codebook sizes.

DATA is a wav directory or jsonl manifest; ``--synthetic`` evaluates on
generated noise (CI smoke path).  Everything device-side runs as one jitted
roundtrip per batch.
"""

from __future__ import annotations

import argparse
import json
import math


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('data', nargs='?', default=None)
    parser.add_argument('--ckpt', default=None,
                        help='codec checkpoint dir (default: debug codec '
                             'with random weights)')
    parser.add_argument('--batches', type=int, default=8)
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--segment', type=float, default=1.0)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--fad', action='store_true',
                        help='also compute codec-FAD + codec-KLD between '
                             'the originals and their reconstructions '
                             '(self-contained embedder: metrics.'
                             'make_codec_embed_fn)')
    parser.add_argument('--json', default=None,
                        help='also write the metrics dict to this file')
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..builders import get_debug_compression_model
    from ..ckpt.io import load_checkpoint
    from ..data.audio_dataset import AudioDataset
    from ..losses import MultiScaleMelSpectrogramLoss, sisnr

    if args.ckpt:
        model, params, _ = load_checkpoint(args.ckpt)
        params = jax.tree.map(jnp.asarray, params)
    else:
        model = get_debug_compression_model(32000)
        params = model.init(jax.random.PRNGKey(0))

    seg = int(args.segment * model.sample_rate)
    if args.synthetic or args.data is None:
        rng = np.random.RandomState(0)
        batches = [(rng.randn(args.batch, 1, seg) * 0.1).astype(np.float32)
                   for _ in range(args.batches)]
    else:
        ds = AudioDataset.from_path(args.data, segment_duration=args.segment,
                                    sample_rate=model.sample_rate, channels=1,
                                    num_samples=args.batches * args.batch)
        ds.start_epoch(0)
        batches = list(ds.iter_batches(args.batch, jax.process_index(),
                                       jax.process_count()))[:args.batches]

    msspec = MultiScaleMelSpectrogramLoss(sample_rate=model.sample_rate)

    @jax.jit
    def roundtrip(p, x):
        codes, scale = model.encode(p, x)
        recon = model.decode(p, codes, scale)[..., :x.shape[-1]]
        return (codes, -sisnr(recon, x), msspec(recon, x),
                jnp.mean(jnp.abs(recon - x)))

    n_q = model.num_codebooks
    card = model.cardinality
    counts = np.zeros((n_q, card), np.int64)
    sisnrs, mels, l1s = [], [], []
    def _recon(p, x):
        codes, scale = model.encode(p, x)
        return model.decode(p, codes, scale)[..., :x.shape[-1]]
    recon_fn = jax.jit(_recon) if args.fad else None
    fad = kld_rows = None
    if args.fad:
        from ..metrics import (FrechetAudioDistance, make_codec_embed_fn,
                               make_codec_prob_fn)
        embed_fn = make_codec_embed_fn(model, params,
                                       window_seconds=min(args.segment, 1.0))
        prob_fn = make_codec_prob_fn(model, params)
        fad = FrechetAudioDistance(embed_fn, model.sample_rate)
        kld_rows = {'ref': [], 'gen': []}
    for x in batches:
        codes, snr, mel, l1 = roundtrip(params, jnp.asarray(x))
        sisnrs.append(float(snr))
        mels.append(float(mel))
        l1s.append(float(l1))
        c = np.asarray(codes)                      # [B, K, T]
        for k in range(n_q):
            counts[k] += np.bincount(c[:, k].ravel(), minlength=card)
        if args.fad:
            recon = np.asarray(recon_fn(params, jnp.asarray(x)))
            fad.add(reference=x, generated=recon)
            kld_rows['ref'].append(prob_fn(x, model.sample_rate))
            kld_rows['gen'].append(prob_fn(recon, model.sample_rate))

    probs = counts / np.maximum(counts.sum(axis=1, keepdims=True), 1)
    with np.errstate(divide='ignore', invalid='ignore'):
        ent = -np.nansum(np.where(probs > 0, probs * np.log2(probs), 0.0),
                         axis=1)
    used = (counts > 0).mean(axis=1)
    bitrate = model.frame_rate * n_q * math.log2(card) / 1000.0

    metrics = {
        'sisnr_db': float(np.mean(sisnrs)),
        'msspec_distance': float(np.mean(mels)),
        'l1': float(np.mean(l1s)),
        'codebook_entropy_bits': [float(e) for e in ent],
        'codebook_usage': [float(u) for u in used],
        'bitrate_kbps': bitrate,
        'n_segments': len(batches) * args.batch,
        'segment_seconds': args.segment,
    }
    if args.fad:
        from ..metrics import kl_divergence_metric
        metrics['fad_codec'] = fad.compute()
        kld = kl_divergence_metric(np.concatenate(kld_rows['ref']),
                                   np.concatenate(kld_rows['gen']))
        metrics['kld_codec'] = kld['kld']
        metrics['kld_codec_symmetric'] = kld['kld_symmetric']
    print(json.dumps(metrics))
    if args.json:
        with open(args.json, 'w') as f:
            json.dump(metrics, f, indent=2)
    return metrics


if __name__ == '__main__':
    main()
