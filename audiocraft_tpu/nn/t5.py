"""T5 text encoder in JAX — backbone of the T5Conditioner.

The reference loads a HF torch ``T5EncoderModel``
(/root/reference/audiocraft/modules/conditioners.py:422-515); this is the
TPU-native equivalent: the standard T5 encoder architecture implemented
functionally, with weights importable from a torch T5 checkpoint
(ckpt/torch_import.import_t5).  Architecture facts (public T5 design):
RMS-style layer norm without mean subtraction or bias, relative-position
bucket attention bias shared from block 0, unscaled dot-product attention,
ReLU (classic) or gated-GeLU (flan/v1.1) feed-forward, final layer norm.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


def t5_layer_norm(x: jax.Array, weight: jax.Array,
                  eps: float = 1e-6) -> jax.Array:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def relative_position_bucket(relative_position: np.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """Bidirectional T5 relative position bucketing (host-side, static)."""
    ret = np.zeros_like(relative_position)
    n = num_buckets // 2
    ret += (relative_position > 0).astype(np.int64) * n
    rp = np.abs(relative_position)
    max_exact = n // 2
    is_small = rp < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact)
        / np.log(max_distance / max_exact) * (n - max_exact)).astype(np.int64)
    val_if_large = np.minimum(val_if_large, n - 1)
    ret += np.where(is_small, rp, val_if_large)
    return ret


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    gated_act: bool = False  # True for flan-t5 / t5-v1.1 (gated gelu)

    _BY_NAME = {
        't5-small': dict(d_model=512, d_ff=2048, num_layers=6, num_heads=8),
        't5-base': dict(d_model=768, d_ff=3072, num_layers=12, num_heads=12),
        't5-large': dict(d_model=1024, d_ff=4096, num_layers=24, num_heads=16),
        'google/flan-t5-small': dict(d_model=512, d_ff=1024, num_layers=8,
                                     num_heads=6, gated_act=True),
        'google/flan-t5-base': dict(d_model=768, d_ff=2048, num_layers=12,
                                    num_heads=12, gated_act=True),
        'google/flan-t5-large': dict(d_model=1024, d_ff=2816, num_layers=24,
                                     num_heads=16, gated_act=True),
    }

    @classmethod
    def for_name(cls, name: str) -> "T5EncoderConfig":
        return cls(**cls._BY_NAME[name])

    def model(self) -> "T5Encoder":
        return T5Encoder(self)


@dataclasses.dataclass(frozen=True)
class T5Encoder:
    config: T5EncoderConfig

    def init(self, key: jax.Array) -> dict:
        c = self.config
        keys = jax.random.split(key, c.num_layers + 2)
        inner = c.num_heads * c.d_kv

        def dense(k, out_d, in_d, scale):
            return scale * jax.random.normal(k, (out_d, in_d))

        params: dict = {
            'shared': jax.random.normal(keys[0], (c.vocab_size, c.d_model)),
            'relative_attention_bias': jax.random.normal(
                keys[1], (c.relative_attention_num_buckets, c.num_heads)) * 0.1,
            'final_layer_norm': jnp.ones((c.d_model,)),
        }
        for i in range(c.num_layers):
            ks = jax.random.split(keys[i + 2], 8)
            layer = {
                'q': dense(ks[0], inner, c.d_model, (c.d_model * c.d_kv) ** -0.5),
                'k': dense(ks[1], inner, c.d_model, c.d_model ** -0.5),
                'v': dense(ks[2], inner, c.d_model, c.d_model ** -0.5),
                'o': dense(ks[3], c.d_model, inner, inner ** -0.5),
                'ln_attn': jnp.ones((c.d_model,)),
                'ln_ff': jnp.ones((c.d_model,)),
                'wo': dense(ks[5], c.d_model, c.d_ff, c.d_ff ** -0.5),
            }
            if c.gated_act:
                layer['wi_0'] = dense(ks[4], c.d_ff, c.d_model, c.d_model ** -0.5)
                layer['wi_1'] = dense(ks[6], c.d_ff, c.d_model, c.d_model ** -0.5)
            else:
                layer['wi'] = dense(ks[4], c.d_ff, c.d_model, c.d_model ** -0.5)
            params[f'block{i}'] = layer
        return params

    def position_bias(self, params: dict, length: int) -> jax.Array:
        c = self.config
        pos = np.arange(length)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = relative_position_bucket(
            rel, c.relative_attention_num_buckets,
            c.relative_attention_max_distance)
        table = params['relative_attention_bias']  # [buckets, heads]
        bias = jnp.take(table, jnp.asarray(buckets).reshape(-1), axis=0)
        bias = bias.reshape(length, length, c.num_heads)
        return jnp.transpose(bias, (2, 0, 1))[None]  # [1, H, T, T]

    def __call__(self, params: dict, input_ids: jax.Array,
                 attention_mask: tp.Optional[jax.Array] = None) -> jax.Array:
        c = self.config
        B, T = input_ids.shape
        x = jnp.take(params['shared'], input_ids, axis=0)
        bias = self.position_bias(params, T)
        if attention_mask is not None:
            neg = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
            bias = bias + neg

        for i in range(c.num_layers):
            p = params[f'block{i}']
            # self-attention sub-layer
            h = t5_layer_norm(x, p['ln_attn'])
            q = h @ p['q'].T
            k = h @ p['k'].T
            v = h @ p['v'].T
            q = q.reshape(B, T, c.num_heads, c.d_kv)
            k = k.reshape(B, T, c.num_heads, c.d_kv)
            v = v.reshape(B, T, c.num_heads, c.d_kv)
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                preferred_element_type=jnp.float32)
            logits = logits + bias
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            att = jnp.einsum('bhqk,bkhd->bqhd', w, v)
            att = att.reshape(B, T, c.num_heads * c.d_kv)
            x = x + att @ p['o'].T
            # feed-forward sub-layer
            h = t5_layer_norm(x, p['ln_ff'])
            if c.gated_act:
                hidden = jax.nn.gelu(h @ p['wi_0'].T, approximate=True) \
                    * (h @ p['wi_1'].T)
            else:
                hidden = jax.nn.relu(h @ p['wi'].T)
            x = x + hidden @ p['wo'].T

        return t5_layer_norm(x, params['final_layer_norm'])
