"""Weight-only int8 / int4 quantization for LM decode.

Decode at small batch is weight-streaming bound (PERF.md: ~97% of HBM
bandwidth in fp32), so shrinking the weight bytes is the remaining lever.
This module quantizes the transformer/head matrices; the matmul sites
(nn/transformer.linear_w, lm apply_heads) dequantize with a fused convert +
cheap post-scales.

Two formats (both opt-in, floating-point params untouched elsewhere):

* int8 — per-output-channel symmetric, ``{'q': int8 [out, in], 's': fp32
  [out]}``; ``y = (x @ q.T) * s``.  Greedy-token-identical on the parity
  models, ~1% relative logit error (PERF.md).
* int4 — per-(output, input-group) symmetric with group_size inputs per
  scale, ``{'q4p': int8 [out, in/2], 's': fp32 [out, in/group]}``;
  ``y[o] = sum_g s[o,g] * (x_g @ q4[o,g].T)``.  Nibbles are packed two per
  int8 byte (low nibble = even input index) because ``jnp.int4`` arrays
  cannot cross the jit boundary on this backend (device_put recursion bug);
  the matmul sites unpack with two arithmetic shifts in-trace, so the tensor
  streamed from HBM is still 0.5 byte/weight — half of int8 again, at
  coarser rounding.  This is the standard weight-only-int4 recipe
  (group-wise RTN, cf. AWQ/GPTQ literature) without activation-aware
  calibration.

Embeddings, norms, biases and layer scales stay in floating point (gathers /
tiny tensors).  Opt-in: ``params_q = quantize_lm_params(params, mode=...)``
then pass ``params_q`` anywhere LM params are accepted.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> tp.Dict[str, jax.Array]:
    """[out, in] float -> {'q': int8, 's': fp32 [out]} (symmetric per-row)."""
    w = jnp.asarray(w)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)
    return {'q': q, 's': scale.astype(jnp.float32)}


def pack_int4(q: jax.Array) -> jax.Array:
    """int8 nibble values [..., n] (range [-8, 7]) -> packed [..., n/2].

    Low nibble holds the even input index; `unpack_int4` is the exact
    inverse (arithmetic shifts sign-extend both nibbles)."""
    assert q.shape[-1] % 2 == 0, q.shape
    lo = jnp.bitwise_and(q[..., 0::2], 0xF)
    hi = jnp.left_shift(q[..., 1::2], 4)
    return jnp.bitwise_or(lo, hi).astype(jnp.int8)


def unpack_int4(p: jax.Array) -> jax.Array:
    """Packed int4 pairs [..., n/2] -> int8 values [..., n]."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1],
                                                p.shape[-1] * 2)


def quantize_weight_int4(w: jax.Array, group_size: int = 128
                         ) -> tp.Dict[str, jax.Array]:
    """[..., out, in] float -> {'q4p': packed int8 [..., out, in/2],
    's': fp32 [..., out, in/group]}.

    Symmetric round-to-nearest over input groups; range [-7, 7] (the -8 code
    is unused to keep the grid symmetric).
    """
    w = jnp.asarray(w)
    n_in = w.shape[-1]
    assert n_in % 2 == 0, w.shape
    if n_in % group_size:
        # fall back to one group per row rather than pad
        group_size = n_in
    g = n_in // group_size
    wg = w.reshape(*w.shape[:-1], g, group_size)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-1), 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale[..., None]), -7, 7)
    q = q.reshape(w.shape).astype(jnp.int8)
    return {'q4p': pack_int4(q), 's': scale.astype(jnp.float32)}


def dequantize_weight(leaf) -> jax.Array:
    """Inverse of either quantized format (reference implementation for
    tests and non-matmul uses)."""
    if 'q' in leaf:
        return leaf['q'].astype(jnp.float32) * leaf['s'][..., None]
    q = unpack_int4(leaf['q4p'])
    s = leaf['s']
    n_in = q.shape[-1]
    g = s.shape[-1]
    qg = q.astype(jnp.float32).reshape(*q.shape[:-1], g, n_in // g)
    return (qg * s[..., None]).reshape(q.shape)


def prepare_for_decode(params):
    """Convert packed-int4 leaves ``{'q4p', 's'}`` to in-trace native-int4
    leaves ``{'q4': jnp.int4 [out, in], 's'}``.

    Call once at the top of a traced generate/forward, OUTSIDE the decode
    scan: the nibble interleave is a lane shuffle that must not run per step
    (measured ~8 ms/step when left inside the scan body), while the int4
    result is scan-invariant, so XLA materializes it once and the decode
    steps stream 0.5 byte/weight with a dot-fused convert — the same shape
    of win as the int8 path.  jnp.int4 itself cannot cross the jit boundary
    on this backend, which is why the stored format is packed int8 — and
    why the conversion only happens when the params are TRACERS (inside a
    jit): eager conversion would materialize int4 device arrays that hit
    the device_put recursion bug on the next traced op.  Eager callers keep
    the packed format; the matmul sites carry an in-place unpack fallback.
    No-op on trees without quantized leaves."""
    if not any(isinstance(x, jax.core.Tracer)
               for x in jax.tree.leaves(params)):
        return params

    def walk(node):
        if isinstance(node, dict):
            if 'q4p' in node:
                return {'q4': unpack_int4(node['q4p']).astype(jnp.int4),
                        's': node['s']}
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(params)


def _quant_fn(mode: str, group_size: int):
    if mode == 'int8':
        return quantize_weight
    if mode == 'int4':
        return lambda w: quantize_weight_int4(w, group_size)
    raise ValueError(f"unknown quantization mode: {mode!r}")


def _quantize_layer(layer: dict, qfn) -> dict:
    out: dict = {}
    for key, value in layer.items():
        if key in ('self_attn', 'cross_attention'):
            sub = dict(value)
            if 'in_proj_weight' in sub:
                sub['in_proj_weight'] = qfn(sub['in_proj_weight'])
            if 'out_proj' in sub:
                op = dict(sub['out_proj'])
                op['weight'] = qfn(op['weight'])
                sub['out_proj'] = op
            out[key] = sub
        elif key in ('linear1', 'linear2'):
            sub = dict(value)
            sub['weight'] = qfn(sub['weight'])
            out[key] = sub
        else:
            out[key] = value
    return out


def quantize_lm_params(params: dict, mode: str = 'int8',
                       group_size: int = 128) -> dict:
    """LM param tree -> same tree with quantized transformer matrices + heads."""
    qfn = _quant_fn(mode, group_size)
    out = dict(params)
    tf = {name: _quantize_layer(layer, qfn)
          for name, layer in params['transformer'].items()}
    out['transformer'] = tf
    linears = dict(params['linears'])
    w = jnp.asarray(linears['weight'])              # [K, card, dim]
    if mode == 'int8':
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(w / scale[..., None]), -127, 127).astype(jnp.int8)
        linears['weight'] = {'q': q, 's': scale.astype(jnp.float32)}
    else:
        linears['weight'] = quantize_weight_int4(w, group_size)
    out['linears'] = linears
    return out
