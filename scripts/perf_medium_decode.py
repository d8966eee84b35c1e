"""MusicGen-medium (1.5B) decode on ONE v5e chip: int8 weight-only.

Capacity + throughput check: 1.5B fp32 init ~6 GB + int8 copy ~1.5 GB must
fit in 16 GB HBM; weight-streaming roofline predicts ~1.5 GB/step over
~330 GB/s effective = ~4.5 ms/step (~220 steps/s).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.builders import get_musicgen_lm
from audiocraft_tpu.lm.quantize import quantize_lm_params
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

STEPS, B = 200, 2


def main():
    lm, _ = get_musicgen_lm('medium')
    params = lm.init(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    print(f"medium params: {n_params/1e9:.2f}B", flush=True)
    params = quantize_lm_params(params)

    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.randn(2 * B, 6, lm.dim).astype(np.float32))
    mask = jnp.ones((2 * B, 6), jnp.int32)
    tensors = {'description': (cond, mask)}
    fn = jax.jit(lambda p, key, tens: lm.generate(
        p, key, condition_tensors=tens, num_samples=B, max_gen_len=STEPS,
        use_sampling=True, top_k=250, compute_dtype=jnp.bfloat16))
    out = fn(params, jax.random.PRNGKey(0), tensors)
    np.asarray(out)
    best = float('inf')
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(1 + i), tensors)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"int8 decode: {best * 1e3:.0f} ms / {STEPS} steps "
          f"-> {STEPS / best:.0f} steps/s "
          f"({STEPS / best / 50:.1f}x realtime/stream at B={B})", flush=True)


if __name__ == "__main__":
    main()
