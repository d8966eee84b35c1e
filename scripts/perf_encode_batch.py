"""Probe encode throughput just above the b128 headline batch.

b128 bf16 activations peak ~12 GB of 16 GB HBM (PERF.md); this checks
whether b144/b160 still fit and buy throughput (per-step-serial LSTM and
late stages amortize with batch).

    setsid bash -c 'timeout 1750 python scripts/perf_encode_batch.py \
        > /tmp/enc_batch.log 2>&1' &
"""

import numpy as np
import jax
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402

from audiocraft_tpu.builders import get_encodec_32khz  # noqa: E402
from audiocraft_tpu.obs import chained_throughput  # noqa: E402


def main():
    print("backend:", jax.default_backend())
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    sr, seconds = model.sample_rate, 10
    for batch in (128, 144, 160):
        try:
            wavs = [jnp.asarray(np.random.RandomState(i).randn(
                batch, 1, sr * seconds).astype(np.float32) * 0.1)
                for i in range(2)]

            def step(carry, x):
                codes, _ = model.encode(params, x + carry * 1e-20)
                return codes, jnp.sum(codes).astype(jnp.float32)

            dt, rate = chained_throughput(step, wavs, iters=12,
                                          units_per_iter=batch * seconds)
            print(f"b{batch}: {dt*1e3:.1f} ms/iter  {rate:.0f} audio-sec/s",
                  flush=True)
        except Exception as e:
            print(f"b{batch}: FAILED ({type(e).__name__}: {str(e)[:140]})",
                  flush=True)


if __name__ == "__main__":
    main()
