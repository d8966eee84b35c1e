"""conv0 (k7, 1->64, 320k samples) implementation shootout on TPU.

The XLA NCW conv takes 14 ms at batch 32 — ~7x off roofline. Candidates:
(a) current module conv (NCW), (b) NWC conv + transpose to NCW,
(c) im2col matmul producing NCW directly, (d) im2col matmul producing NWC.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.builders import get_encodec_32khz
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


def main():
    model = get_encodec_32khz()
    params = model.init(jax.random.PRNGKey(0))
    enc = model.encoder
    layers = enc._layers()
    mod0 = layers[0][1]
    p0 = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                      params['encoder']['layer0'])
    w = p0['weight']    # [64, 1, 7]
    bias = p0['bias']
    B = 32
    sr, S = 32000, 10
    wavs = [jnp.asarray(np.random.RandomState(i).randn(B, 1, sr * S)
                        .astype(np.float32) * 0.1).astype(jnp.bfloat16)
            for i in range(2)]

    def refpad(x):  # [B, 1, T] -> [B, 1, T+6]
        return jnp.concatenate([x[..., 1:4][..., ::-1], x,
                                x[..., -4:-1][..., ::-1]], axis=-1)

    def a_ncw(c, x):
        y = mod0(p0, x + c.astype(x.dtype) * 1e-8)
        return y, jnp.sum(y.astype(jnp.float32))

    def b_nwc_t(c, x):
        xp = refpad(x + c.astype(x.dtype) * 1e-8)
        y = jax.lax.conv_general_dilated(
            jnp.swapaxes(xp, 1, 2), w.transpose(2, 1, 0), (1,), 'VALID',
            dimension_numbers=('NWC', 'WIO', 'NWC'))
        y = jnp.swapaxes(y + bias[None, None, :], 1, 2)
        return y, jnp.sum(y.astype(jnp.float32))

    def c_im2col_ncw(c, x):
        xp = refpad(x + c.astype(x.dtype) * 1e-8)[:, 0, :]          # [B, T+6]
        T = x.shape[-1]
        cols = jnp.stack([xp[:, k:k + T] for k in range(7)], axis=1)  # [B,7,T]
        y = jnp.einsum('bkt,ck->bct', cols, w[:, 0, :],
                       preferred_element_type=jnp.float32)
        y = (y + bias[None, :, None]).astype(jnp.bfloat16)
        return y, jnp.sum(y.astype(jnp.float32))

    def d_im2col_nwc(c, x):
        xp = refpad(x + c.astype(x.dtype) * 1e-8)[:, 0, :]
        T = x.shape[-1]
        cols = jnp.stack([xp[:, k:k + T] for k in range(7)], axis=-1)  # [B,T,7]
        y = jnp.einsum('btk,ck->btc', cols, w[:, 0, :],
                       preferred_element_type=jnp.float32)
        y = (y + bias[None, None, :]).astype(jnp.bfloat16)
        return y, jnp.sum(y.astype(jnp.float32))

    args = [(w_,) for w_ in wavs]
    ya = chain_time(a_ncw, args, label="a) module conv NCW")
    yb = chain_time(b_nwc_t, args, label="b) NWC conv + transpose")
    yc = chain_time(c_im2col_ncw, args, label="c) im2col matmul -> NCW")
    yd = chain_time(d_im2col_nwc, args, label="d) im2col matmul -> NWC")

    # parity spot-check (all vs module conv)
    fa = jax.jit(lambda x: mod0(p0, x))
    fc = jax.jit(lambda x: c_im2col_ncw(jnp.zeros(()), x)[0])
    ra, rc = np.asarray(fa(wavs[0]), np.float32), np.asarray(fc(wavs[0]), np.float32)
    print("im2col-vs-module maxdiff:", np.abs(ra - rc).max(), flush=True)


if __name__ == '__main__':
    main()
