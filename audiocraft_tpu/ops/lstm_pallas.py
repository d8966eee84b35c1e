"""Pallas LSTM recurrence: the whole T-step scan as ONE kernel.

Why (PERF.md): the SEANet LSTM is ~15 % of the b128 encode.  The XLA
``lax.scan`` path (nn/lstm.py) issues one [B,4H] matmul *program step* per
timestep — at 500 steps the per-step dispatch/carry overhead dominates the
tiny matmul.  Here the recurrence runs inside a single Mosaic program:

* grid over time blocks; the hidden/cell state lives in VMEM **scratch that
  persists across grid steps** (TPU grids execute sequentially), so the
  carry never touches HBM;
* the recurrent weight ``W_hh^T [H, 4H]`` is DMA'd into VMEM once (constant
  index map) and stays resident for all T steps;
* the hoisted input projection ``x @ W_ih^T + b`` (one big MXU matmul over
  all timesteps — already how nn/lstm.py works) is computed OUTSIDE in XLA
  and streamed through the grid pipeline block by block, overlapping the
  next block's DMA with the current block's recurrence.

Numerics: gates and the cell state are computed/carried in fp32 inside the
kernel; the hidden state is stored in the compute dtype (bf16 on the
production path) so the per-step matmul stays an MXU-native bf16 op.  This
is slightly *more* accurate than the XLA bf16 scan (which rounds the gates
to bf16); both sit far under the codec's own quantization error, and the
fp32 path is bit-comparable to the scan.

Reference behavior being accelerated: torch ``nn.LSTM`` semantics of
``/root/reference/audiocraft/modules/lstm.py`` (gate order i, f, g, o).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['lstm_layer_pallas']

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def _lstm_kernel(gx_ref, w_ref, out_ref, h_ref, c_ref, *, t_blk: int,
                 hidden: int):
    """One grid step: ``t_blk`` sequential LSTM updates.

    gx_ref  [t_blk, B, 4H] — precomputed input gates for this time block
    w_ref   [H, 4H]        — W_hh^T, VMEM-resident across the whole grid
    out_ref [t_blk, B, H]  — hidden states for this block
    h_ref/c_ref [B, H]     — persistent carry (h in compute dtype, c fp32)
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = hidden
    for t in range(t_blk):  # static unroll: the recurrence is sequential
        gates = gx_ref[t].astype(jnp.float32) + jax.lax.dot(
            h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h.astype(h_ref.dtype)
        out_ref[t] = h.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('t_blk', 'interpret'))
def _lstm_pallas_padded(gates_x: jax.Array, w_hh_t: jax.Array,
                        t_blk: int, interpret: bool) -> jax.Array:
    T_pad, B, G = gates_x.shape
    H = G // 4
    grid = (T_pad // t_blk,)
    kernel = functools.partial(_lstm_kernel, t_blk=t_blk, hidden=H)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_blk, B, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_blk, B, H), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, B, H), gates_x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H), gates_x.dtype),   # h carry
            pltpu.VMEM((B, H), jnp.float32),     # c carry (fp32)
        ],
        interpret=interpret,
    )(gates_x, w_hh_t)


def lstm_layer_pallas(x_tbc: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
                      b_ih: jax.Array, b_hh: jax.Array, *,
                      interpret: bool = False) -> tp.Optional[jax.Array]:
    """One LSTM layer over [T, B, C] -> [T, B, H] via the Pallas recurrence
    kernel.  Returns ``None`` when the shape is ineligible (caller falls
    back to the ``lax.scan`` path): H must be lane-aligned, B sublane-
    aligned, and the resident weight + pipeline buffers must fit VMEM.
    """
    T, B, _ = x_tbc.shape
    H = w_hh.shape[1]
    if H % 128 != 0 or B % 8 != 0 or T < 1:
        return None
    if not interpret and jax.default_backend() != 'tpu':
        return None  # Mosaic kernel; off-TPU callers get the scan path
    esize = jnp.dtype(x_tbc.dtype).itemsize
    # pick the largest time block whose double-buffered input+output blocks
    # fit next to the resident weight and carries
    w_bytes = H * 4 * H * esize
    carry_bytes = B * H * (esize + 4)
    t_blk = max(1, 256 // B)
    while t_blk > 1 and (w_bytes + carry_bytes
                         + 2 * t_blk * B * 5 * H * esize) > _VMEM_BUDGET:
        t_blk //= 2
    if w_bytes + carry_bytes + 2 * t_blk * B * 5 * H * esize > _VMEM_BUDGET:
        return None
    # hoisted input projection (stays a big XLA MXU matmul, as nn/lstm.py)
    gates_x = jnp.einsum('tbc,gc->tbg', x_tbc, w_ih) + (b_ih + b_hh)
    T_pad = -(-T // t_blk) * t_blk
    if T_pad != T:
        gates_x = jnp.pad(gates_x, ((0, T_pad - T), (0, 0), (0, 0)))
    ys = _lstm_pallas_padded(gates_x, jnp.swapaxes(w_hh, 0, 1), t_blk,
                             interpret)
    return ys[:T]
