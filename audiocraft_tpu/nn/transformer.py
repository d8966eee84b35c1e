"""Streaming transformer — functional JAX with explicit KV-cache state.

Re-design of ``/root/reference/audiocraft/modules/transformer.py``:

* The reference's mutable ``StreamingModule`` dict-state protocol
  (streaming.py:20-124) becomes an explicit ``KVCache`` pytree threaded
  through calls — the idiomatic JAX shape for a ``lax.scan`` decode loop.
* KV caches are **fixed-size** buffers written with
  ``lax.dynamic_update_slice``; causal/window masking is position arithmetic,
  so every decode step has identical static shapes (no recompilation, no
  concat-growing tensors).
* Attention numerics follow the reference custom backend
  (transformer.py:402-438): q pre-scaled by ``1/sqrt(head_dim)``, fp32 logits
  and softmax, cast back — this is the configuration MusicGen checkpoints are
  evaluated with on CPU, and what our parity tests pin.
* Cross-attention K/V over conditioning are computed once and reused for all
  decode steps (``precompute_cross_kv``) — the reference recomputes them per
  step (transformer.py:360-363); same math, far fewer FLOPs.
* ``past_context`` windows (transformer.py:147,254-264) are enforced by
  masking on absolute positions rather than by trimming the cache.

A fused Pallas flash-attention kernel can slot in behind `_attend`; the XLA
path already fuses well on TPU for the decode shapes (S=1 queries).
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
from jax import lax

from flax import struct

from .activations import get_activation_fn
from .rope import RotaryEmbedding


def create_sin_embedding(positions: jax.Array, dim: int,
                         max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding [B, T, C]; matches reference transformer.py:70-89
    (note the ``half_dim - 1`` denominator)."""
    assert dim % 2 == 0
    half_dim = dim // 2
    positions = positions.astype(jnp.float32)
    adim = jnp.arange(half_dim, dtype=jnp.float32).reshape(1, 1, -1)
    phase = positions / (max_period ** (adim / (half_dim - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * weight + bias).astype(x.dtype)


@struct.dataclass
class KVCache:
    """Fixed-capacity streaming KV cache for one attention module.

    Optional int8 storage (``create(..., quantized=True)``): k/v are stored
    as symmetric per-position-per-head int8 with fp32 scales.  At serving
    batch the KV reads dominate the decode step's HBM traffic (PERF.md
    round-2f: ~5x the int8 weight bytes at B=32), so halving the cache
    bytes vs bf16 is the remaining bandwidth lever; both attention matmuls
    read the int8 tensors directly (scales fold into the logits and the
    pre-quantized probability matrix respectively — see ``_attend_int8``).
    """
    k: jax.Array      # [B, Tmax, H, Dh] float — or int8 when quantized
    v: jax.Array      # [B, Tmax, H, Dh]
    index: jax.Array  # [] int32 — number of valid positions
    k_scale: tp.Optional[jax.Array] = None  # [B, Tmax, H] fp32 (quantized)
    v_scale: tp.Optional[jax.Array] = None

    @classmethod
    def create(cls, batch: int, capacity: int, num_heads: int, head_dim: int,
               dtype=jnp.float32, quantized: bool = False) -> "KVCache":
        if quantized:
            shape = (batch, capacity, num_heads, head_dim)
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       index=jnp.zeros((), jnp.int32),
                       k_scale=jnp.zeros(shape[:3], jnp.float32),
                       v_scale=jnp.zeros(shape[:3], jnp.float32))
        return cls(k=jnp.zeros((batch, capacity, num_heads, head_dim), dtype),
                   v=jnp.zeros((batch, capacity, num_heads, head_dim), dtype),
                   index=jnp.zeros((), jnp.int32))


def grow_cache(caches, new_capacity: int):
    """Pad the time axis of every ``KVCache`` in a pytree to ``new_capacity``
    (zero-fill at the end; ``index`` unchanged).

    This is the bucketed-decode primitive (lm/model.py ``kv_buckets``): the
    attention einsums read the WHOLE fixed-size cache buffer every step, so
    decoding the early steps of a long sequence against a full-length buffer
    streams mostly masked zeros from HBM.  Running the decode scan in
    segments of doubling capacity keeps every shape static per segment while
    cutting the dominant KV read traffic roughly in half over the sequence.
    Exactness: padded positions carry kpos >= index so the causal mask sets
    their logits to -inf (and on the int8 path their scales are 0), making
    the bucketed softmax bit-identical to the full-capacity one."""
    def grow_one(c: KVCache) -> KVCache:
        cap = c.k.shape[-3]
        pad = new_capacity - cap
        if pad <= 0:
            return c

        def pad_kv(a):   # [..., T, H, D]
            cfg = [(0, 0)] * a.ndim
            cfg[-3] = (0, pad)
            return jnp.pad(a, cfg)

        def pad_sc(a):   # [..., T, H]
            cfg = [(0, 0)] * a.ndim
            cfg[-2] = (0, pad)
            return jnp.pad(a, cfg)

        return KVCache(
            k=pad_kv(c.k), v=pad_kv(c.v), index=c.index,
            k_scale=None if c.k_scale is None else pad_sc(c.k_scale),
            v_scale=None if c.v_scale is None else pad_sc(c.v_scale))

    return jax.tree.map(grow_one, caches,
                        is_leaf=lambda x: isinstance(x, KVCache))


def _kv_quantize(x: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
    """Symmetric int8 per (batch, position, head): x [B, T, H, D] ->
    (int8 [B, T, H, D], fp32 scale [B, T, H])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-20)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale



def linear_w(x: jax.Array, w, bias=None, rows: tp.Optional[slice] = None
             ) -> jax.Array:
    """``x @ W[rows].T (+ bias)`` where W is a plain matrix or a weight-only
    quantized leaf (see lm/quantize.py): int8 ``{'q': int8 [out, in], 's':
    fp [out]}`` (per-output-channel symmetric) or int4 ``{'q4p': packed int8
    [out, in/2], 's': fp [out, groups]}`` (per-input-group scales, two
    nibbles per byte).  The integer tensor is the one streamed from HBM; the
    dequant is a fused convert/unpack + cheap post-scales."""
    if isinstance(w, dict) and 'q' in w:
        q, sc = w['q'], w['s']
        if rows is not None:
            q, sc = q[rows], sc[rows]
        y = x @ q.T.astype(x.dtype)
        y = y * sc.astype(y.dtype)
    elif isinstance(w, dict) and ('q4' in w or 'q4p' in w):
        if 'q4' in w:
            # prepared form (lm/quantize.prepare_for_decode): native int4,
            # scan-invariant -> streamed at 0.5 byte/weight, convert fuses
            # into the dot like the int8 path
            q, sc = w['q4'], w['s']
        else:
            # fallback for un-prepared calls: unpack nibbles in place
            # (lazy import keeps nn free of a module-level lm dependency)
            from ..lm.quantize import unpack_int4
            q, sc = unpack_int4(w['q4p']), w['s']
        if rows is not None:
            q, sc = q[rows], sc[rows]
        o_dim, i_dim = q.shape
        g = sc.shape[-1]
        xg = x.reshape(*x.shape[:-1], g, i_dim // g)
        qg = q.reshape(o_dim, g, i_dim // g).astype(x.dtype)
        t = jnp.einsum('...gl,ogl->...og', xg, qg,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum('...og,og->...o', t, sc).astype(x.dtype)
    else:
        m = w if rows is None else w[rows]
        y = x @ m.T
    if bias is not None:
        y = y + bias
    return y


@dataclasses.dataclass(frozen=True)
class StreamingMultiheadAttention:
    embed_dim: int
    num_heads: int
    bias: bool = True
    causal: bool = False
    past_context: tp.Optional[int] = None
    rope: tp.Optional[RotaryEmbedding] = None
    cross_attention: bool = False
    qk_layer_norm: bool = False
    kv_repeat: int = 1
    # route full-sequence self-attention (training / MAGNeT / prefill-free
    # forwards) through the Pallas flash kernel (ops/attention_pallas.py).
    # False = einsum (the fp32 parity path), True = always, 'auto' = only at
    # long sequence lengths where the einsum path's materialized [B,H,T,T]
    # scores lose or exhaust HBM (threshold from PERF.md measurements).
    attn_kernel: tp.Union[bool, str] = False

    def __post_init__(self):
        if self.past_context is not None:
            assert self.causal
        if self.cross_attention:
            assert not self.causal and self.rope is None

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def num_kv_heads(self) -> int:
        return self.num_heads // self.kv_repeat

    def init(self, key: jax.Array) -> dict:
        E = self.embed_dim
        kv_dim = self.head_dim * self.num_kv_heads
        out_dim = E + 2 * kv_dim
        k1, k2 = jax.random.split(key)
        bound = 1.0 / math.sqrt(E)
        params = {
            'in_proj_weight': jax.random.uniform(k1, (out_dim, E),
                                                 minval=-bound, maxval=bound),
            'out_proj': {
                'weight': jax.random.uniform(k2, (E, E), minval=-bound, maxval=bound),
            },
        }
        if self.bias:
            params['in_proj_bias'] = jnp.zeros((out_dim,))
            params['out_proj']['bias'] = jnp.zeros((E,))
        if self.qk_layer_norm:
            params['q_layer_norm'] = {'weight': jnp.ones((E,)), 'bias': jnp.zeros((E,))}
            params['k_layer_norm'] = {'weight': jnp.ones((E,)), 'bias': jnp.zeros((E,))}
        return params

    def _split_heads(self, x: jax.Array, heads: int) -> jax.Array:
        B, T, _ = x.shape
        return x.reshape(B, T, heads, self.head_dim)

    def precompute_cross_kv(self, params: dict, source: jax.Array
                            ) -> tp.Tuple[jax.Array, jax.Array]:
        """Project conditioning K/V once for reuse across decode steps."""
        E = self.embed_dim
        w = params['in_proj_weight']
        b = params.get('in_proj_bias')
        k = linear_w(source, w, b[E:2 * E] if b is not None else None,
                     rows=slice(E, 2 * E))
        v = linear_w(source, w, b[2 * E:] if b is not None else None,
                     rows=slice(2 * E, None))
        return (self._split_heads(k, self.num_heads),
                self._split_heads(v, self.num_heads))

    def _attend(self, q: jax.Array, k: jax.Array, v: jax.Array,
                mask: tp.Optional[jax.Array]) -> jax.Array:
        """q: [B, Tq, H, D]; k/v: [B, Tk, H, D]; mask: broadcastable to
        [B, H, Tq, Tk] additive bias or None. fp32 softmax."""
        dtype = q.dtype
        scale = 1.0 / math.sqrt(self.head_dim)
        qf = (q * scale).astype(jnp.float32)
        logits = jnp.einsum('bthd,bkhd->bhtk', qf, k.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum('bhtk,bkhd->bthd', w, v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return out.astype(dtype)

    def _attend_int8(self, q: jax.Array, kq: jax.Array, ks: jax.Array,
                     vq: jax.Array, vs: jax.Array,
                     mask: tp.Optional[jax.Array]) -> jax.Array:
        """int8-KV attention: q [B, Tq, H, D] float; kq/vq int8
        [B, Tk, H, D] with fp32 scales ks/vs [B, Tk, H].

        Both big matmuls stream int8 from HBM and upcast in the dot
        (integer-accumulation dots lower catastrophically on this backend —
        measured 2.5x slower end-to-end; the convert-into-dot form keeps
        the MXU in its native float path).  Per-position scales recombine
        outside the dots: on the [B,H,Tq,Tk] logits for K, folded into the
        probability matrix for V.  fp32 softmax throughout; quantization
        noise is ~0.5 % relative on the attention output."""
        dtype = q.dtype
        scale = 1.0 / math.sqrt(self.head_dim)
        cdtype = dtype if dtype != jnp.float32 else jnp.float32
        logits = jnp.einsum('bthd,bkhd->bhtk', (q * scale).astype(cdtype),
                            kq.astype(cdtype),
                            preferred_element_type=jnp.float32)
        logits = logits * ks.transpose(0, 2, 1)[:, :, None, :]
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1)
        wv = w * vs.transpose(0, 2, 1)[:, :, None, :]   # fold V scales
        out = jnp.einsum('bhtk,bkhd->bthd', wv.astype(cdtype),
                         vq.astype(cdtype),
                         preferred_element_type=jnp.float32)
        return out.astype(dtype)

    def __call__(self, params: dict, query: jax.Array,
                 key: tp.Optional[jax.Array] = None,
                 value: tp.Optional[jax.Array] = None,
                 cache: tp.Optional[KVCache] = None,
                 cross_kv: tp.Optional[tp.Tuple[jax.Array, jax.Array]] = None,
                 attn_mask: tp.Optional[jax.Array] = None,
                 ) -> tp.Tuple[jax.Array, tp.Optional[KVCache]]:
        E = self.embed_dim
        B, Tq, _ = query.shape
        w = params['in_proj_weight']
        b = params.get('in_proj_bias')

        if self.cross_attention:
            q = linear_w(query, w, b[:E] if b is not None else None,
                         rows=slice(0, E))
            if self.qk_layer_norm:
                q = layer_norm(q, **params['q_layer_norm'])
            if cross_kv is not None:
                k, v = cross_kv
            else:
                assert key is not None and value is not None
                k = linear_w(key, w, b[E:2 * E] if b is not None else None,
                             rows=slice(E, 2 * E))
                if self.qk_layer_norm:
                    k = layer_norm(k, **params['k_layer_norm'])
                v = linear_w(value, w,
                             b[2 * E:] if b is not None else None,
                             rows=slice(2 * E, None))
                k = self._split_heads(k, self.num_heads)
                v = self._split_heads(v, self.num_heads)
            if self.qk_layer_norm and cross_kv is not None:
                raise ValueError("qk_layer_norm with precomputed cross_kv "
                                 "is unsupported (norm must see raw k)")
            q = self._split_heads(q, self.num_heads)
            out = self._attend(q, k, v, attn_mask)
            out = out.reshape(B, Tq, E)
            o = linear_w(out, params['out_proj']['weight'],
                         params['out_proj'].get('bias'))
            return o, cache

        # self-attention: fused qkv projection (reference transformer.py:365-369)
        projected = linear_w(query, w, b)
        kv_dim = self.head_dim * self.num_kv_heads
        q = projected[..., :E]
        k = projected[..., E:E + kv_dim]
        v = projected[..., E + kv_dim:]
        if self.qk_layer_norm:
            assert self.kv_repeat == 1
            q = layer_norm(q, **params['q_layer_norm'])
            k = layer_norm(k, **params['k_layer_norm'])
        q = self._split_heads(q, self.num_heads)
        k = self._split_heads(k, self.num_kv_heads)
        v = self._split_heads(v, self.num_kv_heads)

        past_len = cache.index if cache is not None else jnp.zeros((), jnp.int32)
        if self.rope is not None:
            # queries start at the streaming offset (number of cached steps)
            qpos = jnp.arange(Tq) + past_len
            kpos = jnp.arange(Tq) + past_len
            q = self.rope.rotate(q, qpos)
            k = self.rope.rotate(k, kpos, invert_decay=True)

        new_cache = None
        quant_kv = None
        if cache is not None:
            if cache.k_scale is not None:
                # int8 KV: quantize the new positions, append values+scales
                kq_new, ks_new = _kv_quantize(k)
                vq_new, vs_new = _kv_quantize(v)
                kc = lax.dynamic_update_slice(cache.k, kq_new,
                                              (0, past_len, 0, 0))
                vc = lax.dynamic_update_slice(cache.v, vq_new,
                                              (0, past_len, 0, 0))
                ksc = lax.dynamic_update_slice(cache.k_scale, ks_new,
                                               (0, past_len, 0))
                vsc = lax.dynamic_update_slice(cache.v_scale, vs_new,
                                               (0, past_len, 0))
                new_cache = KVCache(k=kc, v=vc, index=past_len + Tq,
                                    k_scale=ksc, v_scale=vsc)
                quant_kv = [kc, ksc, vc, vsc]
            else:
                kc = lax.dynamic_update_slice(
                    cache.k, k.astype(cache.k.dtype), (0, past_len, 0, 0))
                vc = lax.dynamic_update_slice(
                    cache.v, v.astype(cache.v.dtype), (0, past_len, 0, 0))
                new_cache = KVCache(k=kc, v=vc, index=past_len + Tq)
            k_full, v_full = kc, vc
            Tk = kc.shape[1]
            kpos_full = jnp.arange(Tk)
            qpos_full = jnp.arange(Tq) + past_len
            delta = qpos_full[:, None] - kpos_full[None, :]
            valid = delta >= 0
            if self.past_context is not None:
                valid &= delta <= self.past_context
            mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
            mask = mask[None, None]  # [1, 1, Tq, Tk]
            if attn_mask is not None:
                mask = mask + attn_mask
            k, v, attn_mask = k_full, v_full, mask
            use_kernel = False
        else:
            # flash route: full-sequence self-attention with no extra mask
            # (causality is handled inside the kernel; past_context windows
            # and MAGNeT's banded masks stay on the einsum path)
            from ..ops.attention_pallas import resolve_kernel_route
            use_kernel = (attn_mask is None and Tq > 1
                          and self.past_context is None
                          and resolve_kernel_route(self.attn_kernel, Tq))
            if self.causal and not use_kernel:
                qpos = jnp.arange(Tq)
                delta = qpos[:, None] - qpos[None, :]
                valid = delta >= 0
                if self.past_context is not None:
                    valid &= delta <= self.past_context
                mask = jnp.where(valid, 0.0,
                                 -jnp.inf).astype(jnp.float32)[None, None]
                attn_mask = mask if attn_mask is None else mask + attn_mask

        if self.kv_repeat > 1:
            if quant_kv is not None:
                quant_kv = [jnp.repeat(a, self.kv_repeat, axis=2)
                            for a in quant_kv]
            else:
                k = jnp.repeat(k, self.kv_repeat, axis=2)
                v = jnp.repeat(v, self.kv_repeat, axis=2)

        if use_kernel:
            from ..ops.attention_pallas import fused_attention
            out = fused_attention(q, k, v, causal=self.causal,
                                  sm_scale=1.0 / math.sqrt(self.head_dim))
        elif quant_kv is not None:
            out = self._attend_int8(q, *quant_kv, attn_mask)
        else:
            out = self._attend(q, k, v, attn_mask)
        out = out.reshape(B, Tq, E)
        o = linear_w(out, params['out_proj']['weight'],
                     params['out_proj'].get('bias'))
        return o, new_cache


@struct.dataclass
class LayerState:
    """Per-layer streaming state: self-attention cache."""
    self_attn: KVCache


@dataclasses.dataclass(frozen=True)
class StreamingTransformerLayer:
    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    bias_ff: bool = True
    bias_attn: bool = True
    causal: bool = False
    past_context: tp.Optional[int] = None
    qk_layer_norm: bool = False
    qk_layer_norm_cross: bool = False
    cross_attention: bool = False
    layer_scale: tp.Optional[float] = None
    rope: tp.Optional[RotaryEmbedding] = None
    kv_repeat: int = 1
    norm_first: bool = True
    activation: str = 'gelu'
    attn_kernel: tp.Union[bool, str] = False

    @property
    def self_attn(self) -> StreamingMultiheadAttention:
        return StreamingMultiheadAttention(
            embed_dim=self.d_model, num_heads=self.num_heads, bias=self.bias_attn,
            causal=self.causal, past_context=self.past_context, rope=self.rope,
            qk_layer_norm=self.qk_layer_norm, kv_repeat=self.kv_repeat,
            attn_kernel=self.attn_kernel)

    @property
    def cross_attn(self) -> tp.Optional[StreamingMultiheadAttention]:
        if not self.cross_attention:
            return None
        return StreamingMultiheadAttention(
            embed_dim=self.d_model, num_heads=self.num_heads, bias=self.bias_attn,
            cross_attention=True, qk_layer_norm=self.qk_layer_norm_cross)

    def init(self, key: jax.Array) -> dict:
        D, F = self.d_model, self.dim_feedforward
        keys = jax.random.split(key, 4)
        b1 = 1.0 / math.sqrt(D)
        b2 = 1.0 / math.sqrt(F)
        params = {
            'self_attn': self.self_attn.init(keys[0]),
            'norm1': {'weight': jnp.ones((D,)), 'bias': jnp.zeros((D,))},
            'norm2': {'weight': jnp.ones((D,)), 'bias': jnp.zeros((D,))},
            'linear1': {'weight': jax.random.uniform(keys[1], (F, D),
                                                     minval=-b1, maxval=b1)},
            'linear2': {'weight': jax.random.uniform(keys[2], (D, F),
                                                     minval=-b2, maxval=b2)},
        }
        if self.bias_ff:
            params['linear1']['bias'] = jnp.zeros((F,))
            params['linear2']['bias'] = jnp.zeros((D,))
        if self.layer_scale is not None:
            params['layer_scale_1'] = jnp.full((D,), self.layer_scale)
            params['layer_scale_2'] = jnp.full((D,), self.layer_scale)
        if self.cross_attention:
            params['cross_attention'] = self.cross_attn.init(keys[3])
            params['norm_cross'] = {'weight': jnp.ones((D,)), 'bias': jnp.zeros((D,))}
            if self.layer_scale is not None:
                params['layer_scale_cross'] = jnp.full((D,), self.layer_scale)
        return params

    def _ff(self, params: dict, x: jax.Array) -> jax.Array:
        act = get_activation_fn(self.activation)
        h = act(linear_w(x, params['linear1']['weight'],
                         params['linear1'].get('bias')))
        return linear_w(h, params['linear2']['weight'],
                        params['linear2'].get('bias'))

    def _scale(self, params: dict, name: str, x: jax.Array) -> jax.Array:
        if self.layer_scale is None:
            return x
        return params[name] * x

    def __call__(self, params: dict, x: jax.Array,
                 cache: tp.Optional[KVCache] = None,
                 cross_attention_src: tp.Optional[jax.Array] = None,
                 cross_kv: tp.Optional[tp.Tuple[jax.Array, jax.Array]] = None,
                 attn_mask: tp.Optional[jax.Array] = None,
                 ) -> tp.Tuple[jax.Array, tp.Optional[KVCache]]:
        has_cross = cross_attention_src is not None or cross_kv is not None
        if self.cross_attention:
            assert has_cross
        else:
            assert not has_cross

        if self.norm_first:
            h, new_cache = self.self_attn(
                params['self_attn'], layer_norm(x, **params['norm1']),
                cache=cache, attn_mask=attn_mask)
            x = x + self._scale(params, 'layer_scale_1', h)
            if has_cross:
                h, _ = self.cross_attn(
                    params['cross_attention'], layer_norm(x, **params['norm_cross']),
                    key=cross_attention_src, value=cross_attention_src,
                    cross_kv=cross_kv)
                x = x + self._scale(params, 'layer_scale_cross', h)
            x = x + self._scale(params, 'layer_scale_2',
                                self._ff(params, layer_norm(x, **params['norm2'])))
        else:
            src = x  # post-norm cross-attn queries the original layer input
            h, new_cache = self.self_attn(params['self_attn'], x, cache=cache,
                                          attn_mask=attn_mask)
            x = layer_norm(x + self._scale(params, 'layer_scale_1', h),
                           **params['norm1'])
            if has_cross:
                h, _ = self.cross_attn(
                    params['cross_attention'], src,
                    key=cross_attention_src, value=cross_attention_src,
                    cross_kv=cross_kv)
                x = layer_norm(x + self._scale(params, 'layer_scale_cross', h),
                               **params['norm_cross'])
            x = layer_norm(x + self._scale(params, 'layer_scale_2',
                                           self._ff(params, x)),
                           **params['norm2'])
        return x, new_cache


@dataclasses.dataclass(frozen=True)
class StreamingTransformer:
    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int = 2048
    bias_ff: bool = True
    bias_attn: bool = True
    causal: bool = False
    past_context: tp.Optional[int] = None
    cross_attention: bool = False
    layer_scale: tp.Optional[float] = None
    positional_embedding: str = 'sin'
    max_period: float = 10000.0
    positional_scale: float = 1.0
    xpos: bool = False
    qk_layer_norm: bool = False
    qk_layer_norm_cross: bool = False
    kv_repeat: int = 1
    norm_first: bool = True
    activation: str = 'gelu'
    checkpointing: bool = False  # jax.checkpoint per layer (training)
    # lax.scan over a stacked layer axis: the compiled program contains ONE
    # layer body instead of num_layers copies (~24x smaller HLO for
    # MusicGen-small => far faster XLA compiles), numerically identical.
    # Params/caches carry a leading [num_layers] axis (see stack_params /
    # init_cache); checkpoints keep the per-layer dict layout.
    scan_layers: bool = False
    # flash-fused full-sequence self-attention (ops/attention_pallas.py)
    attn_kernel: tp.Union[bool, str] = False

    def __post_init__(self):
        assert self.d_model % self.num_heads == 0
        assert self.positional_embedding in ('sin', 'rope', 'sin_rope')

    @property
    def rope(self) -> tp.Optional[RotaryEmbedding]:
        if self.positional_embedding in ('rope', 'sin_rope'):
            return RotaryEmbedding(self.d_model // self.num_heads,
                                   max_period=self.max_period, xpos=self.xpos,
                                   scale=self.positional_scale)
        return None

    @property
    def layer(self) -> StreamingTransformerLayer:
        return StreamingTransformerLayer(
            d_model=self.d_model, num_heads=self.num_heads,
            dim_feedforward=self.dim_feedforward, bias_ff=self.bias_ff,
            bias_attn=self.bias_attn, causal=self.causal,
            past_context=self.past_context, qk_layer_norm=self.qk_layer_norm,
            qk_layer_norm_cross=self.qk_layer_norm_cross,
            cross_attention=self.cross_attention, layer_scale=self.layer_scale,
            rope=self.rope, kv_repeat=self.kv_repeat, norm_first=self.norm_first,
            activation=self.activation, attn_kernel=self.attn_kernel)

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.num_layers)
        return {f'layer{i}': self.layer.init(keys[i])
                for i in range(self.num_layers)}

    def init_cache(self, batch: int, capacity: int, dtype=jnp.float32,
                   kv_dtype: tp.Optional[str] = None):
        """``kv_dtype='int8'`` stores the caches quantized (halves the KV
        HBM traffic, the dominant decode cost at serving batch — PERF.md);
        None keeps float caches in ``dtype``."""
        head_dim = self.d_model // self.num_heads
        kv_heads = self.num_heads // self.kv_repeat
        quantized = kv_dtype == 'int8'
        if self.scan_layers:
            # one stacked cache: [L, B, T, H, Dh] (+ index [L])
            single = KVCache.create(batch, capacity, kv_heads, head_dim,
                                    dtype, quantized=quantized)
            return jax.tree.map(
                lambda a: jnp.broadcast_to(a, (self.num_layers,) + a.shape),
                single)
        return tuple(KVCache.create(batch, capacity, kv_heads, head_dim,
                                    dtype, quantized=quantized)
                     for _ in range(self.num_layers))

    def stack_params(self, params: dict) -> dict:
        """Per-layer dict -> stacked tree with a leading [num_layers] axis.
        Call once OUTSIDE any decode scan (it copies every weight)."""
        if 'layer0' not in params:
            return params  # already stacked
        return jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[params[f'layer{i}'] for i in range(self.num_layers)])

    def precompute_cross_kv(self, params: dict, source: jax.Array):
        layer = self.layer
        if self.scan_layers:
            stacked = self.stack_params(params)
            kv = jax.vmap(
                lambda p: layer.cross_attn.precompute_cross_kv(
                    p['cross_attention'], source))(stacked)
            return kv  # tuple-like pytree with leading [L]
        return tuple(
            layer.cross_attn.precompute_cross_kv(
                params[f'layer{i}']['cross_attention'], source)
            for i in range(self.num_layers))

    def __call__(self, params: dict, x: jax.Array,
                 caches: tp.Optional[tp.Tuple[KVCache, ...]] = None,
                 cross_attention_src: tp.Optional[jax.Array] = None,
                 cross_kv: tp.Optional[tuple] = None,
                 offsets: tp.Optional[jax.Array] = None,
                 attn_mask: tp.Optional[jax.Array] = None,
                 ) -> tp.Tuple[jax.Array, tp.Optional[tp.Tuple[KVCache, ...]]]:
        B, T, C = x.shape
        if offsets is None:
            if caches is None:
                offsets = jnp.zeros((B,), jnp.int32)
            elif self.scan_layers:
                offsets = jnp.broadcast_to(caches.index[0], (B,))
            else:
                offsets = jnp.broadcast_to(caches[0].index, (B,))
        if self.positional_embedding in ('sin', 'sin_rope'):
            positions = jnp.arange(T).reshape(1, -1, 1) + offsets.reshape(-1, 1, 1)
            pos_emb = create_sin_embedding(positions, C, self.max_period)
            x = x + self.positional_scale * pos_emb.astype(x.dtype)

        layer = self.layer
        if self.scan_layers:
            stacked = self.stack_params(params)

            def body(y, per):
                p, c, ck = per
                y, nc = layer(p, y, cache=c,
                              cross_attention_src=cross_attention_src
                              if ck is None else None,
                              cross_kv=ck, attn_mask=attn_mask)
                return y, nc

            fn = jax.checkpoint(body) if self.checkpointing else body
            # None scans transparently (no leaves), so absent caches/cross-kv
            # need no special casing
            x, new_caches = lax.scan(fn, x, (stacked, caches, cross_kv))
            return x, new_caches

        new_caches = [] if caches is not None else None
        for i in range(self.num_layers):
            cache_i = caches[i] if caches is not None else None
            fn = layer
            if self.checkpointing:
                fn = jax.checkpoint(
                    lambda p, y, c: layer(p, y, cache=c,
                                          cross_attention_src=cross_attention_src,
                                          cross_kv=None if cross_kv is None else cross_kv[i],
                                          attn_mask=attn_mask))
                x, nc = fn(params[f'layer{i}'], x, cache_i)
            else:
                x, nc = layer(params[f'layer{i}'], x, cache=cache_i,
                              cross_attention_src=cross_attention_src,
                              cross_kv=None if cross_kv is None else cross_kv[i],
                              attn_mask=attn_mask)
            if new_caches is not None:
                new_caches.append(nc)
        return x, (tuple(new_caches) if new_caches is not None else None)
