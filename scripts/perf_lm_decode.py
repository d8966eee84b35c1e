"""LM decode diagnosis at MusicGen-small shape: dtype x batch matrix.

If decode is weight-streaming bound, time/step is ~flat in batch and bf16 is
~2x fp32.  If latency-bound, time/step is flat in batch AND dtype-insensitive
(casts only add ops).  200-step generates, second-call timing.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.builders import get_musicgen_lm
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

STEPS = 200


def run(lm, params, B, dtype_name):
    dim = lm.dim
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.randn(2 * B, 6, dim).astype(np.float32))
    mask = jnp.ones((2 * B, 6), jnp.int32)
    tensors = {'description': (cond, mask)}
    dtype = {'fp32': None, 'bf16': jnp.bfloat16}[dtype_name]

    fn = jax.jit(lambda p, key, tens: lm.generate(
        p, key, condition_tensors=tens, num_samples=B,
        max_gen_len=STEPS, use_sampling=True, top_k=250,
        compute_dtype=dtype))
    out = fn(params, jax.random.PRNGKey(0), tensors)
    np.asarray(out)  # compile + warm
    t0 = time.perf_counter()
    out = fn(params, jax.random.PRNGKey(1), tensors)
    np.asarray(out)
    dt = time.perf_counter() - t0
    print(f"B={B} {dtype_name}: {dt * 1e3:.1f} ms for {STEPS} steps "
          f"-> {STEPS / dt:.0f} steps/s "
          f"({STEPS / dt / 50:.1f}x realtime/elem)", flush=True)
    return dt


def main():
    lm, _provider = get_musicgen_lm('small')
    params = lm.init(jax.random.PRNGKey(0))
    for B, dt_name in ((2, 'fp32'), (2, 'bf16'), (8, 'fp32'), (8, 'bf16')):
        run(lm, params, B, dt_name)


if __name__ == '__main__':
    main()
