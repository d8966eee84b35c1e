"""Measure the chip's EFFECTIVE HBM bandwidth with trivial elementwise ops.

Every conv0 formulation (native NCW, banded XLA, two Pallas kernels) lands at
~14 ms b32 — suspicious flatness.  If a bare elementwise producer of the same
1.3 GB output also takes ~that long, conv0 is at the memory floor and the
PERF.md roofline (assuming 819 GB/s spec bw) needs correcting.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from audiocraft_tpu.utils.misc import enable_compilation_cache
enable_compilation_cache()


def chain_time(fn, args_list, iters=8, label="", bytes_moved=0):
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
    bw = bytes_moved / dt / 1e9 if bytes_moved else 0
    print(f"{label}: {dt * 1e3:.2f} ms  ({bw:.0f} GB/s)", flush=True)
    return dt


def rnd(shape, seed):
    return jnp.asarray((np.random.RandomState(seed).randn(*shape) * 0.1)
                       .astype(np.float32)).astype(jnp.bfloat16)


def main():
    GB = 1e9
    big = [rnd((32, 64, 320000), i) for i in range(2)]   # 1.31 GB bf16

    # read 1.31 GB -> write 1.31 GB
    def copy_add(c, x):
        y = x + c.astype(x.dtype) + jnp.bfloat16(1.0)
        return y, jnp.sum(y[:, :, :128].astype(jnp.float32))
    chain_time(copy_add, [(x,) for x in big], label="elementwise copy 1.3GB->1.3GB",
               bytes_moved=2 * 1.31 * GB)

    # read-only reduce of 1.31 GB
    def red(c, x):
        return None, jnp.sum(x.astype(jnp.float32)) + c
    chain_time(red, [(x,) for x in big], label="full reduce 1.3GB read",
               bytes_moved=1.31 * GB)

    # write-heavy: small input, 1.3GB output (conv0's actual traffic shape)
    small = [rnd((32, 1, 320000), 10 + i) for i in range(2)]  # 20 MB

    def bcast(c, x):
        y = jnp.broadcast_to(x, (32, 64, 320000)) + c.astype(x.dtype)
        return y, jnp.sum(y[:, :, :128].astype(jnp.float32))
    chain_time(bcast, [(x,) for x in small], label="broadcast write 1.3GB",
               bytes_moved=1.31 * GB)

    # conv0-with-cheap-consumer: conv + tiny slice reduce (XLA may shrink!)
    # plus conv0 + FULL reduce (the shootout's workload) for reference
    w = rnd((64, 1, 7), 20)
    b = rnd((64,), 21)
    def conv_full(c, x):
        from audiocraft_tpu.nn.conv import conv1d
        y = conv1d(x + c.astype(x.dtype) * 1e-8, w, b)
        return y, jnp.sum(y.astype(jnp.float32))
    chain_time(conv_full, [(x,) for x in small], label="conv0 + full reduce",
               bytes_moved=(1.31 + 1.31) * GB)

    def conv_slice(c, x):
        from audiocraft_tpu.nn.conv import conv1d
        y = conv1d(x + c.astype(x.dtype) * 1e-8, w, b)
        return y, jnp.sum(y[:, :, :128].astype(jnp.float32))
    chain_time(conv_slice, [(x,) for x in small], label="conv0 + slice reduce (DCE-prone)",
               bytes_moved=1.31 * GB)


if __name__ == "__main__":
    main()
