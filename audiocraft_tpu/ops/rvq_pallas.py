"""Fused Pallas TPU kernel for the RVQ residual argmin loop.

The hot path of audio tokenization (reference call stack:
``EncodecModel.encode -> ResidualVectorQuantization.encode``,
/root/reference/audiocraft/quantization/core_vq.py:387-397) is, per codebook:

    dist  = -(||r||^2 - 2 r E^T + ||E||^2)     # [N, K] matmul
    idx   = argmax(dist)                        # row argmax
    r    <- r - E[idx]                          # gather + subtract

with a serial dependency across the ``n_q`` codebooks through the residual.
Done naively, the residual round-trips HBM ``n_q`` times.  This kernel keeps a
tile of residual rows in VMEM across the whole codebook chain:

* grid over row tiles of the flattened ``[N, D]`` input;
* all ``n_q`` codebooks resident in VMEM (n_q * K * D * 4 bytes; 4 MB for the
  EnCodec 32k config — fits comfortably);
* per codebook: one ``[TN, D] x [D, K]`` MXU matmul for distances, a VPU row
  argmax, and the gather expressed as a ``[TN, K] x [K, D]`` one-hot MXU
  matmul (TPU-friendly: no scatter/gather unit);
* fp32 accumulation everywhere; the distance expression and first-index
  tie-breaking match the reference bit-for-bit semantics.

K and D are padded to lane multiples in the wrapper; padded codebook rows get
+inf squared-norm so they can never win the argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _rvq_kernel(x_ref, embed_ref, esq_ref, out_ref, *, n_q: int, tn: int, k: int):
    r = x_ref[:].astype(jnp.float32)  # [TN, D]
    col_ids = lax.broadcasted_iota(jnp.int32, (tn, k), dimension=1)
    for q in range(n_q):
        embed = embed_ref[q]          # [K, D]
        e_sq = esq_ref[q]             # [1, K] (row vector; inf on padded rows)
        x_sq = jnp.sum(r * r, axis=1, keepdims=True)  # [TN, 1]
        prod = jax.lax.dot_general(
            r, embed, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [TN, K]
        dist = -(x_sq - 2.0 * prod + e_sq)
        # First-index argmax in 2-D VPU ops (Mosaic-friendly; matches torch
        # max().indices tie-breaking): row max, then min column id hitting it.
        row_max = jnp.max(dist, axis=1, keepdims=True)        # [TN, 1]
        hit = dist == row_max                                  # [TN, K]
        idx = jnp.min(jnp.where(hit, col_ids, k), axis=1,
                      keepdims=True).astype(jnp.int32)         # [TN, 1]
        out_ref[q, :] = idx[:, 0]
        one_hot = (col_ids == idx).astype(jnp.float32)         # [TN, K]
        quantized = jax.lax.dot_general(
            one_hot, embed, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [TN, D]
        r = r - quantized


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def _rvq_encode_padded(x: jax.Array, embeds: jax.Array, esq: jax.Array,
                       block_rows: int = 256, interpret: bool = False) -> jax.Array:
    """x: [Np, Dp] fp32 (rows padded), embeds: [n_q, Kp, Dp], esq: [n_q, 1, Kp].

    Returns codes [n_q, Np] int32.
    """
    n_pad, d = x.shape
    n_q, k, _ = embeds.shape
    grid = (n_pad // block_rows,)
    kernel = functools.partial(_rvq_kernel, n_q=n_q, tn=block_rows, k=k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, k, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, 1, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_q, block_rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q, n_pad), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d * k * n_q,
            bytes_accessed=n_pad * d * 4 + n_q * k * d * 4 + n_q * n_pad * 4,
            transcendentals=0,
        ),
    )(x, embeds, esq)


def _xla_fallback(x: jax.Array, embeds: jax.Array) -> jax.Array:
    """Reference XLA implementation (identical semantics), used off-TPU."""
    def step(residual, embed):
        e32 = embed.astype(jnp.float32)
        dist = -(
            jnp.sum(jnp.square(residual), axis=1, keepdims=True)
            - 2 * jnp.dot(residual, e32.T, preferred_element_type=jnp.float32)
            + jnp.sum(jnp.square(e32.T), axis=0, keepdims=True)
        )
        idx = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return residual - jnp.take(e32, idx, axis=0), idx

    _, codes = lax.scan(step, x.astype(jnp.float32), embeds)
    return codes


def rvq_encode_fused(x: jax.Array, embeds: jax.Array,
                     block_rows: int = 256,
                     force_pallas: bool = False,
                     interpret: bool = False) -> jax.Array:
    """Residual VQ encode: x [N, D], embeds [n_q, K, D] -> codes [n_q, N] int32.

    Dispatches to the fused Pallas kernel on TPU and to an identical-semantics
    XLA scan elsewhere (CPU tests, autodiff contexts).
    """
    if not (force_pallas or jax.default_backend() == "tpu"):
        return _xla_fallback(x, embeds)

    n, d = x.shape
    n_q, k, _ = embeds.shape
    d_pad = _round_up(max(d, _LANE), _LANE)
    k_pad = _round_up(max(k, _LANE), _LANE)
    n_pad = _round_up(max(n, 8), block_rows)

    xf = x.astype(jnp.float32)
    ef = embeds.astype(jnp.float32)
    if d_pad != d:
        xf = jnp.pad(xf, ((0, 0), (0, d_pad - d)))
        ef = jnp.pad(ef, ((0, 0), (0, 0), (0, d_pad - d)))
    if n_pad != n:
        xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))
    esq = jnp.sum(jnp.square(ef), axis=2)  # [n_q, K]
    if k_pad != k:
        ef = jnp.pad(ef, ((0, 0), (0, k_pad - k), (0, 0)))
        esq = jnp.pad(esq, ((0, 0), (0, k_pad - k)),
                      constant_values=jnp.inf)
    esq = esq[:, None, :]  # [n_q, 1, Kp]

    codes = _rvq_encode_padded(xf, ef, esq, block_rows=block_rows,
                               interpret=interpret)
    return codes[:, :n]
