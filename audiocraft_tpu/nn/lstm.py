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
import typing as tp

import jax
import jax.numpy as jnp
from jax import lax


def lstm_layer_with_state(x_tbc: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
                          b_ih: jax.Array, b_hh: jax.Array,
                          carry: tp.Optional[tp.Tuple[jax.Array, jax.Array]]
                          = None
                          ) -> tp.Tuple[jax.Array,
                                        tp.Tuple[jax.Array, jax.Array]]:
    """One LSTM layer over [T, B, C] from an optional initial (h, c).
    Returns ([T, B, H], final (h, c)) — the carry is what chunked/streaming
    inference threads between calls (codec/streaming.py)."""
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

    if carry is None:
        carry = (jnp.zeros((B, H), x_tbc.dtype),
                 jnp.zeros((B, H), x_tbc.dtype))
    final, ys = lax.scan(step, carry, gates_x)
    return ys, final


def lstm_layer(x_tbc: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
               b_ih: jax.Array, b_hh: jax.Array) -> jax.Array:
    """One LSTM layer over a [T, B, C] sequence. Returns [T, B, H]."""
    return lstm_layer_with_state(x_tbc, w_ih, w_hh, b_ih, b_hh)[0]


def lstm_2layer_pipelined(x_tbc: jax.Array, p0: dict, p1: dict) -> jax.Array:
    """Two stacked LSTM layers as ONE software-pipelined scan.

    The stacked recurrence h2[t] <- h1[t] <- h1[t-1] does not require layer 2
    to wait for the whole layer-1 sequence: at scan iteration t, cell 1
    processes input t while cell 2 processes cell 1's output from iteration
    t-1 (classic systolic skew).  One scan of T+1 iterations replaces two
    scans of T — the per-iteration fixed costs (op issue, carry plumbing)
    are paid once instead of twice.

    Measured on v5e (scripts/perf_lstm.py): bit-exact vs the sequential
    path but SLOWER (b32 10.46 vs 9.27 ms, b128 19.49 vs 18.75) — moving
    layer 2's input projection from one hoisted [T*B,4H] matmul into T
    per-step [B,4H] matmuls costs more than the saved scan overhead.  Kept
    opt-in (``pipelined=True``) as the starting point for deeper skewing
    (e.g. chunked multi-step cells).

    Per-cell math is identical to ``lstm_layer`` (layer 1's input projection
    stays hoisted; layer 2's moves into the scan as a [B,H]x[H,4H] matmul
    whose contraction order matches the hoisted einsum).  Iteration 0's
    cell-2 update is masked so its state still starts from exact zeros.
    """
    T, B, _ = x_tbc.shape
    H = p0['w_hh'].shape[1]
    gx1 = jnp.einsum('tbc,gc->tbg', x_tbc, p0['w_ih']) \
        + (p0['b_ih'] + p0['b_hh'])
    gx1 = jnp.concatenate([gx1, jnp.zeros((1, B, 4 * H), gx1.dtype)], axis=0)
    first = jnp.arange(T + 1) == 0
    b2 = p1['b_ih'] + p1['b_hh']

    def cell(gates, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cn = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        return jax.nn.sigmoid(o) * jnp.tanh(cn), cn

    def step(carry, inp):
        gx, is_first = inp
        h1, c1, h2, c2, h1p = carry
        h1n, c1n = cell(gx + h1 @ p0['w_hh'].T, c1)
        gates2 = (h1p @ p1['w_ih'].T + b2) + h2 @ p1['w_hh'].T
        h2n, c2n = cell(gates2, c2)
        h2n = jnp.where(is_first, h2, h2n)
        c2n = jnp.where(is_first, c2, c2n)
        return (h1n, c1n, h2n, c2n, h1n), h2n

    z = jnp.zeros((B, H), x_tbc.dtype)
    _, ys = lax.scan(step, (z, z, z, z, z), (gx1, first))
    return ys[1:]


@dataclasses.dataclass(frozen=True)
class StreamableLSTM:
    """LSTM over convolutional layout [B, C, T] with skip connection."""
    dimension: int
    num_layers: int = 2
    skip: bool = True
    pipelined: bool = False  # opt-in: one skewed scan (measured slower)

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

    def __call__(self, params: dict, x: jax.Array, *,
                 kernel: bool = False, interpret: bool = False) -> jax.Array:
        """``kernel=True`` routes each layer's recurrence through the Pallas
        scan-in-one-program kernel (ops/lstm_pallas.py) when the shape is
        eligible; ineligible shapes fall back to the ``lax.scan`` path."""
        # [B, C, T] -> [T, B, C]
        y = jnp.transpose(x, (2, 0, 1))
        inp = y
        if self.pipelined and self.num_layers == 2 and not kernel:
            y = lstm_2layer_pipelined(y, params['l0'], params['l1'])
        else:
            for layer in range(self.num_layers):
                p = params[f'l{layer}']
                out = None
                if kernel:
                    from ..ops.lstm_pallas import lstm_layer_pallas
                    out = lstm_layer_pallas(y, p['w_ih'], p['w_hh'],
                                            p['b_ih'], p['b_hh'],
                                            interpret=interpret)
                if out is None:
                    out = lstm_layer(y, p['w_ih'], p['w_hh'], p['b_ih'],
                                     p['b_hh'])
                y = out
        if self.skip:
            y = y + inp
        return jnp.transpose(y, (1, 2, 0))

    def stream(self, params: dict, x: jax.Array,
               state: tp.Optional[tp.List] = None
               ) -> tp.Tuple[jax.Array, tp.List]:
        """Chunked forward carrying per-layer (h, c) between calls.
        ``stream(p, full)[0] == concat(stream over chunks)`` exactly."""
        y = jnp.transpose(x, (2, 0, 1))
        inp = y
        new_state = []
        for layer in range(self.num_layers):
            p = params[f'l{layer}']
            carry = state[layer] if state is not None else None
            y, final = lstm_layer_with_state(y, p['w_ih'], p['w_hh'],
                                             p['b_ih'], p['b_hh'], carry)
            new_state.append(final)
        if self.skip:
            y = y + inp
        return jnp.transpose(y, (1, 2, 0)), new_state
