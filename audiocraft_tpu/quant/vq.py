"""Vector quantization and residual VQ — functional, scan-based, TPU-first.

Re-design of ``/root/reference/audiocraft/quantization/core_vq.py:222-405`` and
``vq.py:16-117``:

* All ``n_q`` codebooks share one static config, so their states stack into a
  single ``[n_q, K, D]`` pytree and the residual loop is a ``lax.scan`` with
  the residual as carry — the serial dependency the reference expresses as a
  Python loop over ``nn.ModuleList``.
* Straight-through estimators use ``lax.stop_gradient`` (reference
  core_vq.py:321 for per-layer STE, :380-382 for the RVQ-wide STE fix from
  encodec#25).
* Quantizer dropout (vq.py:78-79) takes the active layer count as a traced
  scalar and masks inactive layers inside the scan — no dynamic shapes.
* EMA codebook updates run per-layer inside the scan, optionally psum-reduced
  over a data-parallel mesh axis (see quant/codebook.py).
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
from jax import lax

from flax import struct

from .codebook import (CodebookState, EuclideanCodebook, compute_distances,  # noqa: re-export
                       dequantize, kmeans, quantize, sample_vectors)
from ..ops.rvq_pallas import rvq_encode_fused


@struct.dataclass
class RVQState:
    """Stacked per-codebook state; leading axis is the quantizer index."""
    embed: jax.Array         # [n_q, K, D]
    cluster_size: jax.Array  # [n_q, K]
    embed_avg: jax.Array     # [n_q, K, D]
    inited: jax.Array        # [n_q]


@struct.dataclass
class QuantizedResult:
    """Mirror of reference quantization/base.py:18-24 as a pytree."""
    x: jax.Array
    codes: jax.Array
    bandwidth: jax.Array  # kbits per second
    penalty: tp.Optional[jax.Array] = None
    metrics: dict = struct.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class ResidualVectorQuantizer:
    """Public RVQ with reference defaults (vq.py:35-48).

    Layout convention: inputs/outputs use conv layout ``[B, D, T]``; codes are
    ``[B, K, T]``.
    """
    dimension: int = 256
    n_q: int = 8
    q_dropout: bool = False
    bins: int = 1024
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 10
    threshold_ema_dead_code: float = 2.0
    # orthogonal regularization (reference core_vq.py:78-84, 330-344)
    orthogonal_reg_weight: float = 0.0
    orthogonal_reg_active_codes_only: bool = False
    commitment_weight: float = 1.0

    @property
    def codebook(self) -> EuclideanCodebook:
        return EuclideanCodebook(
            dim=self.dimension, codebook_size=self.bins,
            kmeans_init=self.kmeans_init, kmeans_iters=self.kmeans_iters,
            decay=self.decay,
            threshold_ema_dead_code=self.threshold_ema_dead_code)

    @property
    def max_n_q(self) -> int:
        return self.n_q

    def init(self, key: jax.Array) -> RVQState:
        keys = jax.random.split(key, self.n_q)
        states = [self.codebook.init(k) for k in keys]
        return RVQState(
            embed=jnp.stack([s.embed for s in states]),
            cluster_size=jnp.stack([s.cluster_size for s in states]),
            embed_avg=jnp.stack([s.embed_avg for s in states]),
            inited=jnp.stack([s.inited for s in states]),
        )

    # ------------------------------------------------------------------ encode
    def encode(self, state: RVQState, x: jax.Array,
               n_q: tp.Optional[int] = None, use_fused: bool = True) -> jax.Array:
        """x: [B, D, T] -> codes [B, K, T] int32.

        The scan body is one distance matmul + argmax + gather + subtract per
        codebook; on TPU the fused Pallas kernel (ops/rvq_pallas.py) performs
        the full residual loop without HBM round-trips of the residual.
        """
        n_q = n_q or self.n_q
        xt = jnp.swapaxes(x, 1, 2)  # [B, T, D]
        B, T, D = xt.shape
        flat = xt.reshape(B * T, D)
        embeds = state.embed[:n_q]

        if use_fused:
            codes = rvq_encode_fused(flat, embeds)  # [n_q, B*T]
        else:
            def step(residual, embed):
                idx = quantize(residual, embed)
                quantized = dequantize(idx, embed)
                return residual - quantized, idx

            _, codes = lax.scan(step, flat, embeds)
        codes = codes.reshape(n_q, B, T)
        return jnp.swapaxes(codes, 0, 1)  # [B, K, T]

    # ------------------------------------------------------------------ decode
    def decode(self, state: RVQState, codes: jax.Array) -> jax.Array:
        """codes: [B, K, T] -> [B, D, T]."""
        codes_kbt = jnp.swapaxes(codes, 0, 1)  # [K, B, T]
        n_q = codes_kbt.shape[0]

        def step(acc, inp):
            embed, idx = inp
            return acc + dequantize(idx, embed), None

        B, T = codes.shape[0], codes.shape[2]
        init = jnp.zeros((B, T, self.dimension), state.embed.dtype)
        total, _ = lax.scan(step, init, (state.embed[:n_q], codes_kbt))
        return jnp.swapaxes(total, 1, 2)  # [B, D, T]

    def decode_one_hot(self, state: RVQState, codes: jax.Array) -> jax.Array:
        """MXU-friendly decode via one-hot matmul; same result as `decode`."""
        codes_kbt = jnp.swapaxes(codes, 0, 1)
        n_q = codes_kbt.shape[0]
        one_hot = jax.nn.one_hot(codes_kbt, self.bins, dtype=state.embed.dtype)
        total = jnp.einsum('kbtn,knd->btd', one_hot, state.embed[:n_q])
        return jnp.swapaxes(total, 1, 2)

    # ----------------------------------------------------------------- forward
    def forward(self, state: RVQState, x: jax.Array, frame_rate: float,
                key: tp.Optional[jax.Array] = None, training: bool = False,
                n_q_active: tp.Optional[jax.Array] = None,
                axis_name: tp.Optional[str] = None,
                expiry: str = 'reference'
                ) -> tp.Tuple[QuantizedResult, RVQState]:
        """Training/eval forward (reference vq.py:76-91 + core_vq forward path).

        Returns the quantized tensor (with STE in training), codes, bandwidth,
        commitment penalty, and the updated EMA state.  ``expiry`` selects the
        dead-code behavior (see codebook.EuclideanCodebook.ema_update):
        'reference' replicates the reference exactly (expiry is inert within a
        step — prone to codebook collapse when training from scratch on small
        data), 'effective' actually resurrects dead codes.
        """
        n_q = self.n_q
        xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)  # [B, T, D]
        B, T, D = xt.shape
        flat = xt.reshape(B * T, D)

        if n_q_active is None:
            n_q_active = jnp.asarray(n_q, jnp.int32)
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, n_q)

        cb = self.codebook

        def step(carry, inp):
            residual, quantized_acc = carry
            layer_state, lkey, q_index = inp
            st = CodebookState(embed=layer_state[0], cluster_size=layer_state[1],
                               embed_avg=layer_state[2], inited=layer_state[3])
            active = q_index < n_q_active

            if training and self.kmeans_init:
                st = cb.maybe_kmeans_init(st, residual, lkey)

            idx = quantize(residual, st.embed)
            quantized = dequantize(idx, st.embed)

            commit = jnp.mean(jnp.square(lax.stop_gradient(quantized) - residual))

            if training:
                upd = cb.ema_update(st, lax.stop_gradient(residual), idx, lkey,
                                    axis_name=axis_name, expiry=expiry)
                st = jax.tree.map(
                    lambda new, old: jnp.where(active, new, old), upd, st)

            quantized = lax.stop_gradient(quantized)
            amask = active.astype(jnp.float32)
            new_residual = residual - quantized * amask
            quantized_acc = quantized_acc + quantized * amask
            out_state = (st.embed, st.cluster_size, st.embed_avg, st.inited)
            return (new_residual, quantized_acc), (idx, commit * amask, out_state)

        init = (flat, jnp.zeros_like(flat))
        layer_states = (state.embed, state.cluster_size, state.embed_avg, state.inited)
        q_indices = jnp.arange(n_q, dtype=jnp.int32)
        (residual, quantized_out), (codes, commits, new_states) = lax.scan(
            step, init, (layer_states, keys, q_indices))

        if training:
            # RVQ-wide STE (core_vq.py:380-382)
            quantized_out = flat + lax.stop_gradient(quantized_out - flat)

        new_state = RVQState(embed=new_states[0], cluster_size=new_states[1],
                             embed_avg=new_states[2], inited=new_states[3])

        quantized_bdt = jnp.swapaxes(quantized_out.reshape(B, T, D), 1, 2)
        codes_bkt = jnp.swapaxes(codes.reshape(n_q, B, T), 0, 1)
        bw_per_q = math.log2(self.bins) * frame_rate / 1000
        bw = n_q_active.astype(jnp.float32) * bw_per_q
        penalty = jnp.sum(commits) / jnp.maximum(n_q_active.astype(jnp.float32), 1)
        result = QuantizedResult(x=quantized_bdt, codes=codes_bkt,
                                 bandwidth=bw, penalty=penalty)
        return result, new_state

    def sample_n_q_active(self, key: jax.Array) -> jax.Array:
        """Quantizer-dropout draw (reference vq.py:78-79): uniform in [1, n_q]."""
        return jax.random.randint(key, (), 1, self.n_q + 1)
