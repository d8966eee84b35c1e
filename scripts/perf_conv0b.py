"""Banded/merged-matmul conv reformulation shootout on TPU (round-3 lead).

PERF.md: conv0 runs at 0.3% MXU (14 ms @ b32) and stage A at 15% — both XLA
lowering/shape artifacts.  Candidates here reformulate convs as dense
MXU-shaped matmuls in pure XLA:
  * conv0: banded-matrix matmul (contraction 256, N=128) vs native NCW conv
  * downsample convs (k=2s): merged-row dense matmul (true FLOPs) vs native
Run detached: setsid bash -c 'JAX... timeout 1750 python scripts/perf_conv0b.py > /tmp/conv0b.log 2>&1' &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.nn.conv import (StreamableConv1d, conv1d_banded_mono,
                                    conv1d_merged_rows, pad1d)
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
    key = jax.random.PRNGKey(0)

    # ---------------- conv0: 1 -> 64, k7, T=320k ----------------
    mod0 = StreamableConv1d(1, 64, 7, pad_mode='reflect')
    p0 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), mod0.init(key))
    xs0 = [rnd((B, 1, 320000), i) for i in range(2)]

    def conv0_native(c, x):
        y = mod0(p0, x + c.astype(x.dtype) * 1e-8)
        return y, jnp.sum(y.astype(jnp.float32))

    def conv0_banded(c, x):
        xp = pad1d(x + c.astype(x.dtype) * 1e-8, (3, 3), mode='reflect')
        y = conv1d_banded_mono(xp, p0['weight'], p0['bias'])
        return y, jnp.sum(y.astype(jnp.float32))

    # check numerics first (device)
    ya = conv0_native(jnp.zeros(()), xs0[0])[0]
    yb = conv0_banded(jnp.zeros(()), xs0[0])[0]
    err = jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))
    print(f"conv0 banded max|diff| = {float(err):.3e} "
          f"(exact={bool((ya == yb).all())})", flush=True)

    chain_time(conv0_native, [(x,) for x in xs0], label="conv0 native NCW")
    chain_time(conv0_banded, [(x,) for x in xs0], label="conv0 banded matmul")

    # ---------------- downsample convs per stage ----------------
    # enc_ratios [4, 4, 5, 8]; stage inputs (C, T): A (64, 320k->80k is the
    # *output*; the down conv input is the res-block output at full rate)
    stages = [("A", 64, 128, 4, 320000), ("B", 128, 256, 4, 80000),
              ("C", 256, 512, 5, 20000), ("D", 512, 1024, 8, 4000)]
    for name, cin, cout, s, t in stages:
        mod = StreamableConv1d(cin, cout, 2 * s, stride=s, pad_mode='reflect')
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         mod.init(jax.random.PRNGKey(1)))
        xs = [rnd((B, cin, t), 10 + i) for i in range(2)]
        left = s - s // 2

        def down_native(c, x, mod=mod, p=p):
            y = mod(p, x + c.astype(x.dtype) * 1e-8)
            return y, jnp.sum(y.astype(jnp.float32))

        def down_merged(c, x, p=p, s=s, left=left):
            xp = pad1d(x + c.astype(x.dtype) * 1e-8, (left, s - left),
                       mode='reflect')
            y = conv1d_merged_rows(xp, p['weight'], p['bias'], s)
            return y, jnp.sum(y.astype(jnp.float32))

        ya = down_native(jnp.zeros(()), xs[0])[0]
        yb = down_merged(jnp.zeros(()), xs[0])[0]
        err = jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))
        rel = err / jnp.max(jnp.abs(ya.astype(jnp.float32)))
        print(f"stage {name} merged max|diff| = {float(err):.3e} "
              f"rel={float(rel):.3e} exact={bool((ya == yb).all())}",
              flush=True)
        chain_time(down_native, [(x,) for x in xs],
                   label=f"down {name} native (C{cin}->{cout}, s{s})")
        chain_time(down_merged, [(x,) for x in xs],
                   label=f"down {name} merged matmul")


if __name__ == "__main__":
    main()
