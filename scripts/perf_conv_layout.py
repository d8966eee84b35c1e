"""Layout-aware conv reformulation probe (round-3 lead, iteration 2).

perf_conv0b.py findings: banded conv0 ties native (output relayout eats the
MXU win); merged-row downsamples lose 2-3x (concat + output transposes).
Hypothesis: the matmul must land in its NATURAL output layout.  Candidates:

  1. conv0 as a pure matmul producing channels-last [B, T, C] directly
     (bmat[m, l*C + c]; output [b, r, l*C] IS [B, T, C]) + optional
     transpose back to NCW.
  2. XLA native convs in channels-last NHC at stage-A shapes (res k3
     64->32->64, down k8 s4 64->128) vs the NCW baseline.

Run detached:
setsid bash -c 'PYTHONPATH=/root/repo:$PYTHONPATH timeout 1750 python -u scripts/perf_conv_layout.py > /tmp/conv_layout.log 2>&1' &
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from audiocraft_tpu.nn.conv import StreamableConv1d, pad1d
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


def conv0_tc_matmul(xp, weight, bias):
    """[B, 1, T+K-1] -> channels-last [B, T, C] via one natural-layout matmul."""
    k = weight.shape[-1]
    c_out = weight.shape[0]
    b = xp.shape[0]
    t_out = xp.shape[-1] - (k - 1)
    block = 128
    rows = -(-t_out // block)
    pad = (rows + 1) * block - xp.shape[-1]
    x2 = jnp.pad(xp[:, 0, :], ((0, 0), (0, pad))).reshape(b, rows + 1, block)
    uu = jnp.concatenate([x2[:, :rows, :], x2[:, 1:, :]], axis=-1)  # [b,r,256]
    m_idx = np.arange(2 * block)[:, None]
    l_idx = np.arange(block)[None, :]
    diag = m_idx - l_idx
    band = (diag >= 0) & (diag < k)
    gather = np.clip(diag, 0, k - 1)
    # bflat[m, l*C + c] = w[c, m-l] on the band
    bmat = weight[:, 0, jnp.asarray(gather)] * jnp.asarray(band, weight.dtype)
    bflat = jnp.transpose(bmat, (1, 2, 0)).reshape(2 * block, block * c_out)
    y = jnp.einsum('brm,mn->brn', uu, bflat.astype(xp.dtype),
                   preferred_element_type=jnp.float32)
    y = y.reshape(b, rows * block, c_out)[:, :t_out, :]
    if bias is not None:
        y = y + bias[None, None, :].astype(jnp.float32)
    return y.astype(xp.dtype)


def conv_nhc(x, weight, bias, stride=1):
    """x [B, T, C_in], weight [C_out, C_in, K] -> [B, T', C_out] valid."""
    w = jnp.transpose(weight, (2, 1, 0))  # HIO
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ('NHC', 'HIO', 'NHC'))
    y = lax.conv_general_dilated(x, w, (stride,), ((0, 0),),
                                 dimension_numbers=dn,
                                 preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias[None, None, :]
    return y


def main():
    B = 32
    key = jax.random.PRNGKey(0)

    # ---------------- conv0 ----------------
    mod0 = StreamableConv1d(1, 64, 7, pad_mode='reflect')
    p0 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), mod0.init(key))
    xs0 = [rnd((B, 1, 320000), i) for i in range(2)]

    def conv0_native(c, x):
        y = mod0(p0, x + c.astype(x.dtype) * 1e-8)
        return y, jnp.sum(y.astype(jnp.float32))

    def conv0_tc(c, x):
        xp = pad1d(x + c.astype(x.dtype) * 1e-8, (3, 3), mode='reflect')
        y = conv0_tc_matmul(xp, p0['weight'], p0['bias'])
        return y, jnp.sum(y.astype(jnp.float32))

    def conv0_tc_ncw(c, x):
        xp = pad1d(x + c.astype(x.dtype) * 1e-8, (3, 3), mode='reflect')
        y = conv0_tc_matmul(xp, p0['weight'], p0['bias'])
        y = jnp.swapaxes(y, 1, 2)
        return y, jnp.sum(y.astype(jnp.float32))

    ya = conv0_native(jnp.zeros(()), xs0[0])[0]
    yb = conv0_tc_ncw(jnp.zeros(()), xs0[0])[0]
    err = jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))
    print(f"conv0 tc max|diff| = {float(err):.3e}", flush=True)

    chain_time(conv0_native, [(x,) for x in xs0], label="conv0 native NCW")
    chain_time(conv0_tc, [(x,) for x in xs0], label="conv0 matmul -> TC (natural)")
    chain_time(conv0_tc_ncw, [(x,) for x in xs0], label="conv0 matmul -> TC -> transpose NCW")

    # ---------------- stage-A convs: NHC vs NCW ----------------
    # res block: k3 64->32, k1 32->64; down: k8 s4 64->128 @ T=320k
    shapes = [("res k3 64->32", 64, 32, 3, 1, 320000),
              ("res k1 32->64", 32, 64, 1, 1, 320000),
              ("down k8s4 64->128", 64, 128, 8, 4, 320000),
              ("B res k3 128->64", 128, 64, 3, 1, 80000),
              ("B down k8s4 128->256", 128, 256, 8, 4, 80000)]
    for name, cin, cout, k, s, t in shapes:
        w = rnd((cout, cin, k), 5, 0.05)
        bb = rnd((cout,), 6, 0.05)
        xs_ncw = [rnd((B, cin, t + (k - s)), 10 + i) for i in range(2)]
        xs_nhc = [jnp.swapaxes(x, 1, 2) for x in xs_ncw]

        def f_ncw(c, x, w=w, bb=bb, s=s):
            dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                            ('NCH', 'OIH', 'NCH'))
            y = lax.conv_general_dilated(x, w, (s,), ((0, 0),),
                                         dimension_numbers=dn,
                                         preferred_element_type=x.dtype)
            y = y + bb[None, :, None] + c.astype(x.dtype) * 1e-8
            return y, jnp.sum(y.astype(jnp.float32))

        def f_nhc(c, x, w=w, bb=bb, s=s):
            y = conv_nhc(x + c.astype(x.dtype) * 1e-8, w, bb, s)
            return y, jnp.sum(y.astype(jnp.float32))

        ya = f_ncw(jnp.zeros(()), xs_ncw[0])[0]
        yb = f_nhc(jnp.zeros(()), xs_nhc[0])[0]
        err = jnp.max(jnp.abs(ya.astype(jnp.float32)
                              - jnp.swapaxes(yb, 1, 2).astype(jnp.float32)))
        print(f"{name}: nhc-vs-ncw max|diff| = {float(err):.3e}", flush=True)
        chain_time(f_ncw, [(x,) for x in xs_ncw], label=f"{name} NCW")
        chain_time(f_nhc, [(x,) for x in xs_nhc], label=f"{name} NHC")


if __name__ == "__main__":
    main()
