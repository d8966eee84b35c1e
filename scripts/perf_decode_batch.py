"""Codec decode batch ceiling (bf16, production default): b32 -> b128.

Mirrors scripts/perf_encode_batch.py for the decode leg; PERF.md's decode
table stops at b32 (5 632 audio-sec/s).  >=4 warmup executions
(CLAUDE.md: first executions carry one-time overhead), chained timing.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

FRAMES, SEC, ITERS = 500, 10, 16


def main():
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    for B in (32, 64, 128):
        try:
            codes = [jnp.asarray(np.random.RandomState(i).randint(
                0, 2048, (B, 4, FRAMES)), jnp.int32) for i in range(2)]

            def dec(p, k, c):
                y = model.decode(p, (k * 0).astype(jnp.int32) + c)
                return y, jnp.sum(y[:, :, ::997]).astype(jnp.float32)

            f = jax.jit(dec)
            carry = jnp.zeros(())
            for i in range(4):
                _, carry = f(params, carry, codes[i % 2])
            float(carry)
            t0 = time.perf_counter()
            carry = jnp.zeros(())
            for i in range(ITERS):
                _, carry = f(params, carry, codes[i % 2])
            float(carry)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"decode b{B} bf16: {dt*1e3:.1f} ms -> "
                  f"{B*SEC/dt:.0f} audio-sec/s", flush=True)
        except Exception as e:
            print(f"decode b{B}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
