"""n_q sweep of the fused RVQ Pallas kernel vs the XLA scan on the real chip.

Round-1 finding: at the EnCodec 32 kHz shape (n_q=4, K=2048, D=128) the
kernel ties XLA.  The residual chain's HBM round-trips grow linearly with
n_q while the kernel keeps the residual tile in VMEM, so the win (if any)
should appear at the 24 kHz / high-bandwidth configs (n_q=8..32).

Usage: run detached with a generous timeout (two programs per n_q compile
through the remote tunnel):
    setsid bash -c 'timeout 1750 python scripts/perf_rvq_nq.py \
        > /tmp/rvq_nq.log 2>&1' &
"""

import time

import numpy as np
import jax
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402

from audiocraft_tpu.ops.rvq_pallas import rvq_encode_fused, _xla_fallback  # noqa: E402
from audiocraft_tpu.obs import chained_throughput  # noqa: E402

# 10 s at 50 Hz frames, serving batch 32 -> N = 16k rows; D=128, K=2048
N, D, K = 32 * 500, 128, 2048


def run(fn, x, embeds, iters=16):
    def step(carry, xi):
        codes = fn(xi + carry * 1e-20, embeds)
        return codes, codes.astype(jnp.float32).mean()

    xs = [x + 1e-6 * i for i in range(4)]
    dt, _ = chained_throughput(step, xs, iters=iters)
    return dt  # seconds per iter


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, D).astype(np.float32))
    for n_q in (4, 8, 16, 32):
        embeds = jnp.asarray(rng.randn(n_q, K, D).astype(np.float32) * 0.1)
        t0 = time.time()
        try:
            t_pal = run(lambda a, e: rvq_encode_fused(a, e,
                                                      force_pallas=True),
                        x, embeds)
        except Exception as e:  # VMEM oversubscription at large n_q*K*D
            print(f"n_q={n_q:2d}: pallas FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            t_pal = None
        t_xla = run(_xla_fallback, x, embeds)
        if t_pal is None:
            print(f"n_q={n_q:2d}: xla {t_xla*1e3:7.3f} ms", flush=True)
            continue
        c_p = np.asarray(rvq_encode_fused(x, embeds, force_pallas=True))
        c_x = np.asarray(_xla_fallback(x, embeds))
        match = float((c_p == c_x).mean())
        print(f"n_q={n_q:2d}: pallas {t_pal*1e3:7.3f} ms  xla {t_xla*1e3:7.3f} ms"
              f"  speedup {t_xla/t_pal:5.2f}x  token-match {match:.6f}"
              f"  (wall {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
