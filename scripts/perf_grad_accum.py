"""Gradient accumulation at the 30 s training point (S=1500) on the real
chip.

PERF.md's flash-attention section established: b4 no-remat is the
single-chip per-pass ceiling at S=1500 (activations bound memory; b8 fails
to compile even with flash attention, and per-layer remat measured slower
than shrinking the batch).  ``make_lm_train_step(grad_accum=A)`` scales the
*effective* batch by scanning A sequential microbatches inside one compiled
step — this script measures what that costs vs the b4 single-pass baseline
and vs the remat route (44-46 k codes/s, PERF.md).

Launch detached (Mosaic compiles through the remote tunnel):
    setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 5000 \
        python scripts/perf_grad_accum.py > /tmp/perf_accum.log 2>&1' &
"""

import dataclasses
import time

import numpy as np
import jax
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from audiocraft_tpu.builders import get_musicgen_lm  # noqa: E402
from audiocraft_tpu.dist.train import make_lm_train_step  # noqa: E402

ITERS = 6
S = 1500


def run(batch, accum):
    lm, _ = get_musicgen_lm('small')
    m = dataclasses.replace(lm, attn_kernel=True)
    try:
        lp = m.init(jax.random.PRNGKey(2))
        lopt = optax.adamw(1e-4)
        lstate = lopt.init(lp)
        lstep = jax.jit(make_lm_train_step(m, lopt,
                                           compute_dtype='bfloat16',
                                           grad_accum=accum),
                        donate_argnums=(0, 1))
        codes = [jnp.asarray(np.random.RandomState(i).randint(
            0, 2048, (batch, 4, S))) for i in range(2)]
        cond = jnp.asarray(np.random.RandomState(9)
                           .randn(batch, 6, lm.dim).astype(np.float32))
        ct = {'description': (cond, jnp.ones((batch, 6), jnp.int32))}
        for i in range(4):
            lp, lstate, mtr = lstep(lp, lstate, codes[i % 2], ct)
        float(mtr['loss'])
        t0 = time.perf_counter()
        for i in range(ITERS):
            lp, lstate, mtr = lstep(lp, lstate, codes[i % 2], ct)
        loss = float(mtr['loss'])
        dt = (time.perf_counter() - t0) / ITERS
        flops = 6 * 420e6 * batch * S
        print(f"train b{batch}xS{S} accum={accum} (micro b{batch//accum}): "
              f"{dt*1e3:.1f} ms  {batch*4*S/dt/1e3:.1f}k codes/s  "
              f"{flops/dt/1e12:.0f} TFLOP/s (loss {loss:.3f})", flush=True)
    except Exception as e:
        print(f"train b{batch}xS{S} accum={accum}: FAILED "
              f"({type(e).__name__}: {str(e)[:160]})", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    run(4, 1)    # single-pass baseline (PERF.md: ~400 ms, 60 k codes/s)
    run(8, 2)    # effective b8 via two microbatches
    run(16, 4)   # effective b16 — the S=250 training batch, now at 30 s
    run(32, 8)


if __name__ == "__main__":
    main()
