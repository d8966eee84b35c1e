"""Weight-only int8 quantization for LM decode.

Decode at small batch is weight-streaming bound (PERF.md: ~97% of HBM
bandwidth in fp32), so halving/quartering the weight bytes is the remaining
lever.  This module quantizes the transformer/head matrices to per-output-
channel symmetric int8 ({'q': int8 [out, in], 's': fp32 [out]}); the
matmul sites (nn/transformer.linear_w, lm apply_heads) dequantize with a
fused convert + per-output post-scale, numerically

    y = (x @ q.T) * s  ==  x @ (q * s[:, None]).T  ~=  x @ W.T .

Embeddings, norms, biases and layer scales stay in floating point (gathers /
tiny tensors).  Opt-in: ``params_q = quantize_lm_params(params)`` then pass
``params_q`` anywhere LM params are accepted.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

#: weight keys quantized inside each transformer layer subtree
_MATRIX_KEYS = ('in_proj_weight',)
_LINEAR_PARENTS = ('out_proj', 'linear1', 'linear2')


def quantize_weight(w: jax.Array) -> tp.Dict[str, jax.Array]:
    """[out, in] float -> {'q': int8, 's': fp32 [out]} (symmetric per-row)."""
    w = jnp.asarray(w)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[:, None]), -127, 127).astype(jnp.int8)
    return {'q': q, 's': scale.astype(jnp.float32)}


def _quantize_layer(layer: dict) -> dict:
    out: dict = {}
    for key, value in layer.items():
        if key in ('self_attn', 'cross_attention'):
            sub = dict(value)
            if 'in_proj_weight' in sub:
                sub['in_proj_weight'] = quantize_weight(sub['in_proj_weight'])
            if 'out_proj' in sub:
                op = dict(sub['out_proj'])
                op['weight'] = quantize_weight(op['weight'])
                sub['out_proj'] = op
            out[key] = sub
        elif key in ('linear1', 'linear2'):
            sub = dict(value)
            sub['weight'] = quantize_weight(sub['weight'])
            out[key] = sub
        else:
            out[key] = value
    return out


def quantize_lm_params(params: dict) -> dict:
    """LM param tree -> same tree with int8 transformer matrices + heads."""
    out = dict(params)
    tf = {name: _quantize_layer(layer)
          for name, layer in params['transformer'].items()}
    out['transformer'] = tf
    linears = dict(params['linears'])
    w = jnp.asarray(linears['weight'])              # [K, card, dim]
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale[..., None]), -127, 127).astype(jnp.int8)
    linears['weight'] = {'q': q, 's': scale.astype(jnp.float32)}
    out['linears'] = linears
    return out
