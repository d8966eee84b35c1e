"""U-net transformer: StreamingTransformer with skip connections between the
first and second halves of the layer stack
(reference /root/reference/audiocraft/modules/unet_transformer.py).
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp

from .transformer import StreamingTransformer, create_sin_embedding


@dataclasses.dataclass(frozen=True)
class UnetTransformer(StreamingTransformer):
    skip_connections: bool = False
    layer_dropout_p: float = 0.0

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        params = super().init(k1)
        if self.skip_connections:
            n_skip = self.num_layers // 2
            keys = jax.random.split(k2, n_skip)
            bound = 1.0 / math.sqrt(2 * self.d_model)
            params['skip_projections'] = [
                {'weight': jax.random.uniform(
                    keys[i], (self.d_model, 2 * self.d_model),
                    minval=-bound, maxval=bound),
                 'bias': jnp.zeros((self.d_model,))}
                for i in range(n_skip)]
        return params

    def __call__(self, params: dict, x: jax.Array,
                 caches=None, cross_attention_src=None, cross_kv=None,
                 offsets: tp.Optional[jax.Array] = None,
                 attn_mask: tp.Optional[jax.Array] = None,
                 skip_drop_key: tp.Optional[jax.Array] = None):
        B, T, C = x.shape
        if offsets is None:
            offsets = jnp.zeros((B,), jnp.int32)
        if self.positional_embedding in ('sin', 'sin_rope'):
            positions = jnp.arange(T).reshape(1, -1, 1) + offsets.reshape(-1, 1, 1)
            pos_emb = create_sin_embedding(positions, C, self.max_period)
            x = x + self.positional_scale * pos_emb.astype(x.dtype)

        layer = self.layer
        skips: tp.List[jax.Array] = []
        n_skip = self.num_layers // 2
        for i in range(self.num_layers):
            if self.skip_connections and i >= n_skip:
                skip = skips.pop()
                proj = params['skip_projections'][i % n_skip]
                x = jnp.concatenate([x, skip], axis=-1)
                x = x @ proj['weight'].T + proj['bias']
            x, _ = layer(params[f'layer{i}'], x,
                         cross_attention_src=cross_attention_src,
                         cross_kv=None if cross_kv is None else cross_kv[i],
                         attn_mask=attn_mask)
            if self.skip_connections and i < n_skip:
                if skip_drop_key is not None and self.layer_dropout_p > 0:
                    skip_drop_key, sub = jax.random.split(skip_drop_key)
                    drop = jax.random.bernoulli(sub, self.layer_dropout_p)
                    skips.append(jnp.where(drop, jnp.zeros_like(x), x))
                else:
                    skips.append(x)
        return x, None
