"""Codec (SEANet) decode throughput: fp32 vs bf16, b8/b32 — the generation
pipeline's second leg (LM decode being the first).  10 s of audio = 500
frames at 50 Hz.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()


def chain(fn, params, xs, iters, label, units):
    # params as jit ARGUMENTS, never closures (CLAUDE.md: closure params
    # become jaxpr constants -> slow compiles, different folding)
    f = jax.jit(fn)
    carry = jnp.zeros(())
    out, carry = f(params, carry, xs[0])
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(iters):
        out, carry = f(params, carry, xs[i % len(xs)])
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.1f} ms -> {units / dt:.0f} audio-sec/s",
          flush=True)


def main():
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    frames, sec = 500, 10
    for B in (8, 32):
        codes = [jnp.asarray(np.random.RandomState(i).randint(
            0, 2048, (B, 4, frames)), jnp.int32) for i in range(2)]

        def dec32(p, c, k):
            y = model.decode(p, k + (c * 0).astype(k.dtype),
                             compute_dtype=jnp.float32)
            return y, jnp.sum(y[:, :, ::997]).astype(jnp.float32)

        def dec16(p, c, k):
            y = model.decode(p, k + (c * 0).astype(k.dtype))
            return y, jnp.sum(y[:, :, ::997]).astype(jnp.float32)

        ya = jax.jit(dec32)(params, jnp.zeros(()), codes[0])[0]
        yb = jax.jit(dec16)(params, jnp.zeros(()), codes[0])[0]
        rel = float(jnp.max(jnp.abs(ya - yb)) / (jnp.max(jnp.abs(ya)) + 1e-9))
        print(f"b{B} bf16-vs-fp32 rel err: {rel:.3e}", flush=True)
        chain(dec32, params, codes, 8, f"b{B} decode fp32", B * sec)
        chain(dec16, params, codes, 8, f"b{B} decode bf16 (default)", B * sec)


if __name__ == "__main__":
    main()
