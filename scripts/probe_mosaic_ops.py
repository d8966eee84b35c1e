"""Probe which Mosaic data-movement ops compile on this chip.

Each candidate is a tiny pallas kernel; prints OK/FAIL per candidate.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, kernel, x, out_shape):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(x)
        r.block_until_ready()
        print(f"{name}: OK {np.asarray(r).shape}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split('\n')[0][:110]
        print(f"{name}: FAIL {msg}", flush=True)
        return False


def main():
    x = jnp.asarray(np.random.randn(512, 64), jnp.bfloat16)
    x128 = jnp.asarray(np.random.randn(512, 128), jnp.bfloat16)

    # (a) aligned sublane->lane merge reshape, 64 lanes
    try_kernel("reshape merge 512x64->128x256",
               lambda i, o: o.__setitem__((...,), i[...].reshape(128, 256)),
               x, ((128, 256), jnp.bfloat16))
    # (b) aligned merge, 128 lanes
    try_kernel("reshape merge 512x128->128x512",
               lambda i, o: o.__setitem__((...,), i[...].reshape(128, 512)),
               x128, ((128, 512), jnp.bfloat16))
    # (c) 3d split + dot_general contraction over (slot, c)
    taps = jnp.asarray(np.random.randn(4, 64, 32), jnp.bfloat16)

    def k_dotg(i, o):
        m3 = i[...].reshape(128, 4, 64)
        o[...] = jax.lax.dot_general(
            m3, taps, (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    try:
        f = pl.pallas_call(
            k_dotg,
            out_shape=jax.ShapeDtypeStruct((128, 32), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(x)
        r.block_until_ready()
        print(f"3d split + dot_general: OK {np.asarray(r).shape}", flush=True)
    except Exception as e:
        print(f"3d split + dot_general: FAIL {str(e).splitlines()[0][:110]}",
              flush=True)

    # (d) lane-strided slice
    try_kernel("lane stride slice [:, ::4]",
               lambda i, o: o.__setitem__((...,), i[...][:, ::4]),
               x128, ((512, 32), jnp.bfloat16))
    # (e) sublane-strided slice
    try_kernel("sublane stride slice [::4, :]",
               lambda i, o: o.__setitem__((...,), i[...][::4, :]),
               x128, ((128, 128), jnp.bfloat16))
    # (f) unaligned merge (what failed in the real kernel)
    xu = jnp.asarray(np.random.randn(520, 64), jnp.bfloat16)
    try_kernel("reshape merge 520x64->130x256",
               lambda i, o: o.__setitem__((...,), i[...].reshape(130, 256)),
               xu, ((130, 256), jnp.bfloat16))
    # (g) sublane split reshape (major split only)
    try_kernel("reshape split 512x64->4x128x64",
               lambda i, o: o.__setitem__((...,), i[...].reshape(4, 128, 64)),
               x, ((4, 128, 64), jnp.bfloat16))


if __name__ == '__main__':
    main()
