"""Weight-only quantized LM decode shootout: bf16 vs int8 vs int4 at
MusicGen-small shape (dim 1024, 24 layers, card 2048), B=2 CFG-doubled.

Decode is weight-streaming bound (PERF.md), so steps/s should track streamed
bytes/step: bf16 2 B/w -> int8 1 B/w (982 steps/s measured) -> int4 packed
0.5 B/w, unless the in-trace nibble unpack materializes.
Run detached: setsid bash -c 'PYTHONPATH=... timeout 1750 python -u scripts/perf_lm_decode_q.py > /tmp/lm_q.log 2>&1' &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.builders import get_musicgen_lm
from audiocraft_tpu.lm.quantize import quantize_lm_params
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

STEPS = 200
B = 2


def run(lm, params, label, compute_dtype=jnp.bfloat16):
    dim = lm.dim
    rng = np.random.RandomState(0)
    cond = jnp.asarray(rng.randn(2 * B, 6, dim).astype(np.float32))
    mask = jnp.ones((2 * B, 6), jnp.int32)
    tensors = {'description': (cond, mask)}

    fn = jax.jit(lambda p, key, tens: lm.generate(
        p, key, condition_tensors=tens, num_samples=B,
        max_gen_len=STEPS, use_sampling=True, top_k=250,
        compute_dtype=compute_dtype))
    out = fn(params, jax.random.PRNGKey(0), tensors)
    np.asarray(out)  # compile + warm
    best = float('inf')
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, jax.random.PRNGKey(1 + i), tensors)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1e3:.1f} ms / {STEPS} steps "
          f"-> {STEPS / best:.0f} steps/s", flush=True)


def main():
    lm, _provider = get_musicgen_lm('small')
    params = lm.init(jax.random.PRNGKey(0))
    run(lm, params, 'bf16')
    p8 = quantize_lm_params(params, mode='int8')
    run(lm, p8, 'int8 weights')
    del p8
    p4 = quantize_lm_params(params, mode='int4', group_size=128)
    run(lm, p4, 'int4 weights (packed)')


if __name__ == '__main__':
    main()
