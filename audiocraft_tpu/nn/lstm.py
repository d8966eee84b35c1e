"""Multi-layer LSTM over conv layout, matching torch ``nn.LSTM`` numerics.

Reference: ``/root/reference/audiocraft/modules/lstm.py`` (StreamableLSTM) —
an ``nn.LSTM(dim, dim, num_layers)`` applied over ``[B, C, T]`` input permuted
to time-major, with an additive skip connection.

TPU-first: the recurrence is a single ``lax.scan`` over time per layer.  The
input-to-hidden projection for *all* timesteps is hoisted out of the scan as
one large ``[T*B, 4H]`` matmul (MXU-friendly); only the ``[B, 4H]``
hidden-to-hidden matmul stays inside the scan.  Gate order follows torch:
(input, forget, cell, output).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax import lax


def lstm_layer(x_tbc: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
               b_ih: jax.Array, b_hh: jax.Array) -> jax.Array:
    """One LSTM layer over a [T, B, C] sequence. Returns [T, B, H]."""
    T, B, _ = x_tbc.shape
    H = w_hh.shape[1]
    # Hoisted input projection: one big matmul over all timesteps.
    gates_x = jnp.einsum('tbc,gc->tbg', x_tbc, w_ih) + (b_ih + b_hh)

    def step(carry, gx):
        h, c = carry
        gates = gx + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), x_tbc.dtype)
    c0 = jnp.zeros((B, H), x_tbc.dtype)
    _, ys = lax.scan(step, (h0, c0), gates_x)
    return ys


@dataclasses.dataclass(frozen=True)
class StreamableLSTM:
    """LSTM over convolutional layout [B, C, T] with skip connection."""
    dimension: int
    num_layers: int = 2
    skip: bool = True

    def init(self, key: jax.Array) -> dict:
        params = {}
        H = self.dimension
        bound = 1.0 / math.sqrt(H)
        keys = jax.random.split(key, self.num_layers * 4)
        for layer in range(self.num_layers):
            ks = keys[layer * 4:(layer + 1) * 4]
            params[f'l{layer}'] = {
                'w_ih': jax.random.uniform(ks[0], (4 * H, H), minval=-bound, maxval=bound),
                'w_hh': jax.random.uniform(ks[1], (4 * H, H), minval=-bound, maxval=bound),
                'b_ih': jax.random.uniform(ks[2], (4 * H,), minval=-bound, maxval=bound),
                'b_hh': jax.random.uniform(ks[3], (4 * H,), minval=-bound, maxval=bound),
            }
        return params

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        # [B, C, T] -> [T, B, C]
        y = jnp.transpose(x, (2, 0, 1))
        inp = y
        for layer in range(self.num_layers):
            p = params[f'l{layer}']
            y = lstm_layer(y, p['w_ih'], p['w_hh'], p['b_ih'], p['b_hh'])
        if self.skip:
            y = y + inp
        return jnp.transpose(y, (1, 2, 0))
