"""Measure encode time breakdown on the real TPU chip (chained-dependency
timing per CLAUDE.md — block_until_ready is unreliable on axon).

Usage: PYTHONPATH=/root/repo python scripts/perf_encode_breakdown.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.builders import get_encodec_32khz
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()


def chain_time(fn, args_list, iters=8, label=""):
    """fn(carry, *args) -> (out, new_carry_scalar); chained timing."""
    f = jax.jit(fn)
    carry = jnp.zeros(())
    out, carry = f(carry, *args_list[0])
    float(carry)  # compile+warm
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(iters):
        out, carry = f(carry, *args_list[i % len(args_list)])
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms")
    return dt


def main():
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    sr = 32000
    B, S = 32, 10
    wavs = [jnp.asarray(np.random.RandomState(i).randn(B, 1, sr * S)
                        .astype(np.float32) * 0.1) for i in range(2)]

    def enc_full(carry, x, dtype=None):
        codes, _ = model.encode(params, x + carry * 1e-20, compute_dtype=dtype)
        return codes, jnp.sum(codes).astype(jnp.float32)

    chain_time(lambda c, x: enc_full(c, x), [(w,) for w in wavs],
               label=f"full encode fp32 b{B}")
    chain_time(lambda c, x: enc_full(c, x, jnp.bfloat16), [(w,) for w in wavs],
               label=f"full encode bf16 b{B}")

    # batch 64 bf16
    w64 = [jnp.concatenate([w, w]) for w in wavs]
    chain_time(lambda c, x: enc_full(c, x, jnp.bfloat16), [(w,) for w in w64],
               label="full encode bf16 b64")

    # encoder-only, stage-by-stage (bf16)
    enc = model.encoder
    layers = enc._layers()
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    eparams = cast(params['encoder'])

    def run_prefix(n_layers):
        def f(carry, x):
            y = (x + carry * 1e-20).astype(jnp.bfloat16)
            for i, (kind, mod) in enumerate(layers[:n_layers]):
                if kind == 'act':
                    y = jax.nn.elu(y)
                else:
                    y = mod(eparams[f'layer{i}'], y)
            return y, jnp.sum(y).astype(jnp.float32)
        return f

    boundaries = []
    for i, (kind, mod) in enumerate(layers):
        if kind in ('conv', 'lstm'):
            boundaries.append(i + 1)
    prev = 0.0
    for nb in boundaries:
        dt = chain_time(run_prefix(nb), [(w,) for w in wavs],
                        label=f"encoder prefix thru layer {nb - 1} "
                              f"({layers[nb-1][0]})")
        print(f"   stage delta: {(dt - prev) * 1e3:.2f} ms")
        prev = dt


if __name__ == '__main__':
    main()
