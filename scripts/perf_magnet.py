"""MAGNeT-small iterative (non-AR) decode throughput on TPU.

MAGNeT replaces the 500-step AR loop with sum(decoding_steps)=50 full-
sequence mask-predict forwards — the shape TPUs love (big batched matmuls,
no per-step serialization).  10 s = 500 frames at 50 Hz.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.builders import get_magnet_lm
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()

FRAMES, SEC = 500, 10


def main():
    lm, _provider = get_magnet_lm('small')
    params = lm.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    for B in (1, 4):
        rng = np.random.RandomState(0)
        cond = jnp.asarray(rng.randn(2 * B, 6, lm.dim).astype(np.float32)
                           ).astype(jnp.bfloat16)
        mask = jnp.ones((2 * B, 6), jnp.int32)
        tensors = {'description': (cond, mask)}

        fn = jax.jit(lambda p, key, tens: lm.generate_magnet(
            p, key, condition_tensors=tens, num_samples=B,
            max_gen_len=FRAMES, decoding_steps=(20, 10, 10, 10),
            top_p=0.9, temp=3.0))
        out = fn(params, jax.random.PRNGKey(0), tensors)
        np.asarray(out)
        best = float('inf')
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(params, jax.random.PRNGKey(1 + i), tensors)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        print(f"B={B}: {best * 1e3:.0f} ms for {B}x{SEC}s tokens "
              f"-> {B * SEC / best:.1f}x aggregate realtime/chip, "
              f"shape {out.shape}", flush=True)


if __name__ == "__main__":
    main()
