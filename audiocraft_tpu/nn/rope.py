"""Rotary positional embedding (RoPE) with optional xPos decay.

Math parity with ``/root/reference/audiocraft/modules/rope.py`` but in a
TPU-friendly cos/sin formulation (no complex dtype): for each feature pair
``(x0, x1)`` and rotation ``r = cos + i sin`` the reference computes
``x * (r * decay * scale + (1 - scale))``; expanded to real arithmetic below.

Positions may be traced arrays, so decode steps can rotate a single query at a
streaming offset inside a ``lax.scan`` without recomputing tables.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RotaryEmbedding:
    dim: int  # per-head dim (twice the number of frequencies)
    max_period: float = 10000.0
    xpos: bool = False
    scale: float = 1.0
    xpos_smoothing: float = 0.4
    xpos_base_scale: int = 512

    def frequencies(self) -> jax.Array:
        adim = jnp.arange(0, self.dim, 2, dtype=jnp.float32)[: self.dim // 2]
        return 1.0 / (self.max_period ** (adim / self.dim))

    def decay_rates(self) -> jax.Array:
        half_dim = self.dim // 2
        adim = jnp.arange(half_dim, dtype=jnp.float32)
        return (adim / half_dim + self.xpos_smoothing) / (1.0 + self.xpos_smoothing)

    def rotate(self, x: jax.Array, positions: jax.Array,
               invert_decay: bool = False) -> jax.Array:
        """x: [..., T, ..., dim] with time at axis -3 or given by positions'
        broadcast; positions: [T] (may be traced). Layout here is [B, T, H, D].
        """
        dtype = x.dtype
        pos = positions.astype(jnp.float32)
        angles = pos[:, None] * self.frequencies()[None, :]  # [T, dim/2]
        cos = jnp.cos(angles)
        sin = jnp.sin(angles)
        if self.xpos:
            power = pos[:, None] / self.xpos_base_scale
            decay = self.decay_rates()[None, :] ** power  # [T, dim/2]
            if invert_decay:
                decay = 1.0 / decay
        else:
            decay = jnp.ones_like(cos)
        s = self.scale
        # real/imag parts of (rotation * decay * scale + (1 - scale))
        rot_re = cos * decay * s + (1.0 - s)
        rot_im = sin * decay * s
        # broadcast over [B, T, H, D/2]
        rot_re = rot_re[None, :, None, :]
        rot_im = rot_im[None, :, None, :]
        xf = x.astype(jnp.float32)
        x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
        x0 = x_pairs[..., 0]
        x1 = x_pairs[..., 1]
        out0 = x0 * rot_re - x1 * rot_im
        out1 = x0 * rot_im + x1 * rot_re
        out = jnp.stack([out0, out1], axis=-1).reshape(xf.shape)
        return out.astype(dtype)

    def rotate_qk(self, query: jax.Array, key: jax.Array,
                  start: tp.Union[int, jax.Array] = 0
                  ) -> tp.Tuple[jax.Array, jax.Array]:
        """query: [B, Tq, H, D], key: [B, Tk, H, D]; in streaming mode
        Tk = past + Tq and queries sit at the end (reference rope.py:106-125)."""
        tq = query.shape[1]
        tk = key.shape[1]
        streaming_offset = tk - tq
        qpos = jnp.arange(tq) + start + streaming_offset
        kpos = jnp.arange(tk) + start
        return (self.rotate(query, qpos),
                self.rotate(key, kpos, invert_decay=True))
