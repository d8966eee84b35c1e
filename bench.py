"""Benchmark: audio-seconds tokenized per second per chip (EnCodec 32 kHz RVQ
encode, the BASELINE.json headline metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is our TPU throughput divided by the reference PyTorch
implementation's throughput on this host's CPU (the only hardware the
reference can run on here), measured on the identical workload.
"""

import json
import sys
import time

import numpy as np


def bench_ours(batch, seconds, iters=8):
    import jax
    import jax.numpy as jnp
    from audiocraft_tpu.builders import get_encodec_32khz

    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    sr = model.sample_rate
    # distinct pre-placed inputs: defeats any result caching in the runtime;
    # completion is forced by fetching the (small) codes array — this
    # platform's block_until_ready does not guarantee execution finished.
    wavs = [jnp.asarray(np.random.RandomState(i).randn(
        batch, 1, sr * seconds).astype(np.float32) * 0.1) for i in range(4)]

    enc = jax.jit(lambda p, x: model.encode(p, x)[0])
    np.asarray(enc(params, wavs[0]))  # warmup + compile

    t0 = time.perf_counter()
    for i in range(iters):
        codes = enc(params, wavs[i % len(wavs)])
        np.asarray(codes)
    dt = (time.perf_counter() - t0) / iters
    audio_sec = batch * seconds
    return audio_sec / dt


def bench_reference(batch, seconds, iters=2):
    """Reference torch EnCodec (same topology) on CPU."""
    sys.path.insert(0, "tests")
    import torch
    from oracle import ref_module

    torch.manual_seed(0)
    ref_seanet = ref_module("audiocraft.modules.seanet")
    ref_vq = ref_module("audiocraft.quantization.vq")
    ref_enc = ref_module("audiocraft.models.encodec")
    kw = dict(channels=1, dimension=128, n_filters=64, n_residual_layers=1,
              ratios=[8, 5, 4, 4], norm='weight_norm', lstm=2)
    encoder = ref_seanet.SEANetEncoder(**kw)
    decoder = ref_seanet.SEANetDecoder(**kw)
    quantizer = ref_vq.ResidualVectorQuantizer(dimension=128, n_q=4, bins=2048)
    model = ref_enc.EncodecModel(encoder, decoder, quantizer, frame_rate=50,
                                 sample_rate=32000, channels=1)
    model.eval()
    sr = 32000
    wav = torch.from_numpy(
        np.random.RandomState(0).randn(batch, 1, sr * seconds).astype(np.float32) * 0.1)
    with torch.no_grad():
        model.encode(wav)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model.encode(wav)
        dt = (time.perf_counter() - t0) / iters
    return batch * seconds / dt


def main():
    batch, seconds = 8, 10
    ours = bench_ours(batch, seconds)
    try:
        ref = bench_reference(batch, seconds)
        vs = ours / ref
    except Exception as e:
        print(f"reference bench failed: {e}", file=sys.stderr)
        vs = 0.0
    print(json.dumps({
        "metric": "audio_sec_tokenized_per_s_per_chip",
        "value": round(ours, 2),
        "unit": "audio_sec/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
