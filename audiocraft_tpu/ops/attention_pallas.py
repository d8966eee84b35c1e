"""Fused (flash) attention for the full-sequence compute paths.

Why (PERF.md): the XLA attention path materializes the fp32 ``[B, H, T, T]``
logits and softmax weights in HBM between the two attention matmuls.  At
decode (T_q = 1) that is noise, but on the *full-sequence* paths — LM
cross-entropy training, MAGNeT's 50 whole-sequence forwards, JASCO flow
steps — the score matrices dominate attention's HBM traffic (at B=16,
H=16, T=1500 they are ~2.3 GB per direction per layer).  The TPU flash
kernel (jax.experimental.pallas.ops.tpu.flash_attention) streams K/V tiles
through VMEM with an online softmax, so the scores never reach HBM, and its
custom VJP does the same for the backward pass (training).

This wrapper adapts the kernel to this codebase's conventions:

* layout: our attention operands are ``[B, T, H, D]`` (transformer.py); the
  kernel wants ``[B, H, T, D]``.
* ragged shapes: MusicGen sequences (e.g. T=501 for 10 s + 1 offset) are not
  multiples of the 128-row kernel blocks.  Queries/keys are zero-padded to a
  block multiple; for **causal** attention trailing key padding is masked by
  causality itself, for **non-causal** (MAGNeT stage 0, JASCO) padded
  positions get a different segment id so valid queries never attend them.
  Both are exact — no epsilon leaks into the softmax.
* head_dim: MusicGen heads are D=64; zero-padding q/k's feature axis leaves
  every logit unchanged and zero-padding v adds output columns that are
  sliced away, so D is padded to the 128-lane tile exactly.
* numerics follow the production bf16 path: the kernel takes q/k/v in the
  compute dtype with fp32 accumulation/softmax — the same contraction
  precision XLA's DEFAULT gives the einsum path (PERF.md "dtype-saturated"
  note), with softmax order differing only by the online rescaling.

Reference behavior being accelerated: the custom attention backend of
``/root/reference/audiocraft/modules/transformer.py:402-438`` (and the
memory-efficient/xformers backends it dispatches to on GPU, :416-435 —
flash attention IS the TPU-native equivalent of those kernels).

The fp32 parity suite never routes here (opt-in flag, default off).
"""

from __future__ import annotations

import contextlib
import math
import typing as tp

import jax
import jax.numpy as jnp

__all__ = ['fused_attention', 'resolve_kernel_route']

_BLOCK = 128

# 'auto' sequence-length threshold: below this the XLA einsum attention wins
# (the flash kernel's head-dim padding and small-grid overheads cost more
# than the scores' HBM traffic saves — PERF.md measurements); at long
# sequences the einsum path's materialized fp32 [B,H,T,T] backward scores
# lose and eventually fail to fit (S=1500 training does not compile).
AUTO_MIN_SEQ = 1024

# Tests flip this to run the Mosaic kernel under the TPU interpreter on CPU
# (pltpu.force_tpu_interpret_mode); resolved at trace time, before any jit.
INTERPRET = False

# Zero-pad head_dim up to the 128-lane tile before the kernel.  Exact either
# way; padding doubles attention FLOPs at D=64 but un-padded 64-lane blocks
# cost Mosaic internal relayouts — measured a wash on-chip
# (scripts/perf_attn_unpadded.py: ±2 % both directions at S=750/1500);
# padded keeps every DMA tile-aligned.
PAD_HEAD_DIM = True


def resolve_kernel_route(flag: tp.Union[bool, str], seq_len: int) -> bool:
    """Resolve an ``attn_kernel`` model flag for a static sequence length.

    'auto' additionally requires a single-device process: GSPMD cannot
    partition a ``pallas_call`` in a global-view jit (it would replicate the
    global batch onto every chip), so multi-chip training must either keep
    the einsum path (per-shard scores are N× smaller anyway) or route the
    kernel inside an explicit ``shard_map`` — 'auto_local' is 'auto' minus
    the device-count check, set by ``dist.train.make_lm_train_step_dp``
    whose shard_map body is single-device by construction.
    """
    if flag in ('auto', 'auto_local'):
        return seq_len >= AUTO_MIN_SEQ and (
            (jax.default_backend() == 'tpu'
             and (flag == 'auto_local' or len(jax.devices()) == 1))
            or INTERPRET)
    return bool(flag)


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   causal: bool, sm_scale: float) -> jax.Array:
    """Reference semantics in plain XLA ([B, T, H, D] layout) — the fallback
    for non-TPU backends; mirrors nn/transformer._attend numerics."""
    dtype = q.dtype
    qf = (q * sm_scale).astype(jnp.float32)
    logits = jnp.einsum('bthd,bkhd->bhtk', qf, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    if causal:
        T, S = q.shape[1], k.shape[1]
        delta = jnp.arange(T)[:, None] - jnp.arange(S)[None, :]
        logits = jnp.where(delta >= 0, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('bhtk,bkhd->bthd', w, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def _pad_axis(x: jax.Array, axis: int, to: int) -> jax.Array:
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool,
                    sm_scale: tp.Optional[float] = None) -> jax.Array:
    """Self-attention over a full sequence, flash-fused on TPU.

    q/k/v: ``[B, T, H, D]`` (same layout as nn/transformer). ``causal``
    applies the standard lower-triangular mask; non-causal attends all
    valid (un-padded) positions.  Returns ``[B, T, H, D]`` in q's dtype.
    Exact w.r.t. padding; differentiable (flash VJP on TPU).  Falls back
    to the XLA einsum path off-TPU (unless INTERPRET routes the kernel
    through the Mosaic interpreter for tests).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    interpret = INTERPRET
    if jax.default_backend() != 'tpu' and not interpret:
        return _xla_attention(q, k, v, causal=causal, sm_scale=sm_scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, T, H, D = q.shape
    S = k.shape[1]
    assert S == T, 'fused_attention is for full-sequence self-attention'
    Tp = -(-T // _BLOCK) * _BLOCK
    Dp = -(-D // _BLOCK) * _BLOCK if PAD_HEAD_DIM else D

    def prep(x):
        x = jnp.swapaxes(x, 1, 2)            # [B, H, T, D]
        return _pad_axis(_pad_axis(x, 2, Tp), 3, Dp)

    qp, kp, vp = prep(q), prep(k), prep(v)
    segment_ids = None
    if not causal and Tp != T:
        # padded tail gets a different segment id -> exactly masked
        seg = (jnp.arange(Tp) >= T).astype(jnp.int32)
        seg = jnp.broadcast_to(seg, (B, Tp))
        segment_ids = SegmentIds(q=seg, kv=seg)

    blk = min(_BLOCK, Tp)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
    ctx: tp.ContextManager = contextlib.nullcontext()
    if interpret:
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        out = flash_attention(qp, kp, vp, segment_ids=segment_ids,
                              causal=causal, sm_scale=float(sm_scale),
                              block_sizes=sizes)
    out = jnp.swapaxes(out, 1, 2)            # [B, Tp, H, Dp]
    return out[:, :T, :, :D].astype(q.dtype)
