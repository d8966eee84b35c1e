"""Banded-matmul conv0 Pallas kernel (v2) vs native XLA conv, on-chip.

v1 (mono_input_conv, K-deep contraction + per-tile lane rolls) tied XLA at
13.8 vs 14.0 ms b32.  v2 (banded_mono_conv) runs one [Rt,256]x[256,C*128]
MXU matmul per tile and stores 128-aligned channel blocks straight into the
NCW-tiled output.  Roofline: ~336 GFLOP at b32 -> 1.7 ms at peak + 1.6 ms
output DMA.

Run detached (Mosaic compiles take 10-20 min):
setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 1750 python -u scripts/perf_banded_kernel.py > /tmp/banded_kernel.log 2>&1' &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.nn.conv import StreamableConv1d, pad1d
from audiocraft_tpu.ops.seanet_pallas import banded_mono_conv
from audiocraft_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()


def chain_time(fn, args_list, iters=8, label=""):
    f = jax.jit(fn)
    carry = jnp.zeros(())
    out, carry = f(carry, *args_list[0])
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(iters):
        out, carry = f(carry, *args_list[i % len(args_list)])
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def rnd(shape, seed, scale=0.1):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32) * scale).astype(jnp.bfloat16)


def main():
    B = 32
    mod0 = StreamableConv1d(1, 64, 7, pad_mode='reflect')
    p0 = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      mod0.init(jax.random.PRNGKey(0)))
    xs0 = [rnd((B, 1, 320000), i) for i in range(2)]

    def conv0_native(c, x):
        y = mod0(p0, x + c.astype(x.dtype) * 1e-8)
        return y, jnp.sum(y.astype(jnp.float32))

    def conv0_kernel(c, x):
        xp = pad1d(x + c.astype(x.dtype) * 1e-8, (3, 3), mode='reflect')
        y = banded_mono_conv(xp, p0['weight'], p0['bias'])
        return y, jnp.sum(y.astype(jnp.float32))

    print("compiling kernel...", flush=True)
    ya = jax.jit(conv0_native)(jnp.zeros(()), xs0[0])[0]
    yb = jax.jit(conv0_kernel)(jnp.zeros(()), xs0[0])[0]
    err = jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))
    print(f"banded kernel max|diff| = {float(err):.3e} "
          f"(exact={bool((ya == yb).all())})", flush=True)

    chain_time(conv0_native, [(x,) for x in xs0], label="conv0 native NCW")
    chain_time(conv0_kernel, [(x,) for x in xs0], label="conv0 banded kernel")


if __name__ == "__main__":
    main()
