"""Bucketed KV-cache growth (lm/model.py kv_buckets) — on-chip A/B.

The decode scan's attention reads the WHOLE fixed-capacity KV buffer every
step; on a 30 s stride window (S=1553) the early steps stream mostly masked
zeros.  `kv_buckets='auto'` (part of `optimize_for_serving`) splits the scan
into segments of doubling capacity (256/512/1024/full) — token-exact.  This
measures the long-form serving configuration with buckets ON against the
round-2f numbers with buckets OFF (PERF.md: B=8 120 s = 45.5 s wall).

Launch detached:
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 1750 \
        python scripts/perf_kv_buckets.py > /tmp/perf_kvb.log 2>&1' &
"""
import time

import jax
import numpy as np

from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

from perf_longform_batch import PROMPTS, build  # noqa: E402


def run(model, batch, duration, stride, warm=False):
    model.set_generation_params(duration=duration, extend_stride=stride,
                                use_sampling=True, top_k=250, cfg_coef=3.0)
    t0 = time.perf_counter()
    wav = model.generate(PROMPTS[:batch],
                         key=jax.random.PRNGKey(7 + duration + batch))
    wav_np = np.asarray(wav)
    dt = time.perf_counter() - t0
    tag = " (warmup/compile)" if warm else ""
    print(f"B={batch} duration {duration:4d}s: {dt:7.1f} s wall -> "
          f"{batch * duration / dt:6.1f}x aggregate ({duration / dt:5.2f}x"
          f"/stream){tag}  rms {np.sqrt((wav_np ** 2).mean()):.3f}",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    model = build()                     # optimize_for_serving -> buckets auto
    assert model.kv_buckets == 'auto'
    print("kv_buckets:", model.kv_buckets, flush=True)
    run(model, 8, 120, 20, warm=True)   # compiles every window program
    run(model, 8, 120, 20)   # vs 45.5 s buckets-off (perf_longform_batch)
    run(model, 2, 10, 20, warm=True)
    run(model, 2, 10, 20)    # vs 0.662 s buckets-off (PERF.md 30.2x B=2)


if __name__ == "__main__":
    main()
