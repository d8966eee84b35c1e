"""MusicGen transformer LM on multiple codebook streams — functional JAX.

Re-design of ``/root/reference/audiocraft/models/lm.py`` (LMModel):
* Per-codebook embeddings are one stacked ``[K, card+1, dim]`` table summed
  via gather (lm.py:165,244); per-codebook output heads one stacked
  ``[K, dim, card]`` einsum (lm.py:174,262).
* ``compute_predictions`` (lm.py:270-321): pattern-build -> forward ->
  pattern-revert with NaN specials.
* ``generate`` (lm.py:420-588): the S-step AR loop becomes prefill (one
  forward over the prompt chunk) + a ``lax.scan`` over single decode steps
  with fixed-shape KV caches — zero host syncs in the loop, one compile per
  (B, prompt-bucket, max_gen_len) shape.
* Classifier-free guidance by batch-doubling (lm.py:389-399): conditional and
  null conditions stacked on the batch axis, logits recombined as
  ``uncond + coef * (cond - uncond)``.

Weight init matches lm.py:37-96 (gaussian/uniform with optional depthwise
rescaling) so from-scratch training starts from the same distribution family.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
from jax import lax

from flax import struct

from ..cond.fuser import ConditionFuser, ConditionType
from ..nn.transformer import (KVCache, StreamingTransformer, grow_cache,
                              layer_norm)
from ..patterns.pattern import CodebooksPatternProvider
from .sampling import sample_token


def _plan_cache_segments(first: int, S: int, prepend_len: int,
                         capacities: tp.Sequence[int]
                         ) -> tp.List[tp.Tuple[int, int, int]]:
    """Split the decode offsets ``[first, S)`` into segments of growing KV
    capacity: ``[(start, end, capacity), ...]``.

    The step at offset ``o`` writes cache position ``prepend_len + o - 1``,
    so a segment running under capacity ``c`` may cover offsets
    ``o <= c - prepend_len`` (strictly ``prepend_len + o - 1 < c``).  The
    first segment must additionally hold the prefill (``prepend_len + first``
    positions).  Capacities are used in ascending order; the full capacity
    ``S + prepend_len`` is always appended as the final bucket."""
    full = S + prepend_len
    caps = sorted({int(c) for c in capacities if int(c) < full}) + [full]
    # drop buckets too small for the prefill + first step write
    caps = [c for c in caps if c >= prepend_len + first] or [full]
    segs: tp.List[tp.Tuple[int, int, int]] = []
    start = first
    for c in caps:
        if start >= S:
            break
        end = S if c >= full else min(S, c - prepend_len + 1)
        if end > start:
            segs.append((start, end, c))
            start = end
    if not segs:                       # prompt == max_gen_len: prefill only
        segs = [(first, S, caps[0])]
    if segs[-1][1] < S:
        segs.append((segs[-1][1], S, full))
    return segs


def _auto_capacities(full: int, min_bucket: int = 256) -> tp.List[int]:
    """Doubling bucket ladder below ``full`` (256, 512, 1024, ...).

    Engages only when the full capacity is >= 1024: measured on-chip
    (scripts/perf_kv_buckets.py) the ladder is 1.19x end-to-end on 30 s
    stride windows (S=1553: 45.5 -> 38.3 s for a B=8 120 s long-form
    request) but a ~3 % wash at 10 s clips (S~503), where the grow copies
    and extra scan programs cost what the small masked reads save."""
    if full < 1024:
        return []
    caps = []
    c = min_bucket
    while c < full:
        caps.append(c)
        c *= 2
    return caps


@struct.dataclass
class LMOutput:
    logits: jax.Array  # [B, K, T, card]
    mask: jax.Array    # [B, K, T]


@dataclasses.dataclass(frozen=True, eq=False)
class LMModel:
    pattern_provider: CodebooksPatternProvider
    fuser: ConditionFuser
    n_q: int = 8
    card: int = 1024
    dim: int = 128
    num_heads: int = 8
    num_layers: int = 8
    hidden_scale: int = 4
    norm_first: bool = False
    bias_proj: bool = True
    cross_attention: bool = False
    causal: bool = True
    past_context: tp.Optional[int] = None
    positional_embedding: str = 'sin'
    layer_scale: tp.Optional[float] = None
    two_step_cfg: bool = False
    cfg_coef: float = 3.0
    weight_init: tp.Optional[str] = None
    depthwise_init: tp.Optional[str] = None
    zero_bias_init: bool = False
    bias_ff: bool = True
    bias_attn: bool = True
    qk_layer_norm: bool = False
    qk_layer_norm_cross: bool = False
    kv_repeat: int = 1
    activation: str = 'gelu'
    checkpointing: bool = False
    # scan-over-layers decode/training (one layer body in the compiled
    # program; see nn/transformer.py) — numerically identical, much faster
    # XLA compiles for the deep production stacks
    scan_layers: bool = False
    # flash-fused full-sequence self-attention for the compute-bound paths
    # (training CE, MAGNeT stage-0 forwards); decode steps are unaffected
    attn_kernel: tp.Union[bool, str] = False

    @property
    def special_token_id(self) -> int:
        return self.card

    @property
    def num_codebooks(self) -> int:
        return self.n_q

    @property
    def transformer(self) -> StreamingTransformer:
        return StreamingTransformer(
            d_model=self.dim, num_heads=self.num_heads, num_layers=self.num_layers,
            dim_feedforward=int(self.hidden_scale * self.dim),
            causal=self.causal, past_context=self.past_context,
            cross_attention=self.cross_attention, layer_scale=self.layer_scale,
            positional_embedding=self.positional_embedding,
            norm_first=self.norm_first, bias_ff=self.bias_ff,
            scan_layers=self.scan_layers,
            bias_attn=self.bias_attn, qk_layer_norm=self.qk_layer_norm,
            qk_layer_norm_cross=self.qk_layer_norm_cross,
            kv_repeat=self.kv_repeat, activation=self.activation,
            checkpointing=self.checkpointing, attn_kernel=self.attn_kernel)

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> dict:
        embed_dim = self.card + 1
        k_emb, k_tr, k_out = jax.random.split(key, 3)
        params = {
            'emb': self._init_emb(k_emb, embed_dim),
            'transformer': self.transformer.init(k_tr),
            'linears': self._init_linears(k_out),
        }
        if self.norm_first:
            params['out_norm'] = {'weight': jnp.ones((self.dim,)),
                                  'bias': jnp.zeros((self.dim,))}
        return params

    def _std(self, input_dim: int, depth: tp.Optional[int]) -> float:
        std = 1 / math.sqrt(input_dim)
        if depth is not None:
            std = std / math.sqrt(2 * depth)
        return std

    def _init_emb(self, key: jax.Array, embed_dim: int) -> jax.Array:
        std = self._std(self.dim, None)
        if self.weight_init == 'gaussian':
            w = std * jax.random.truncated_normal(
                key, -3.0, 3.0, (self.n_q, embed_dim, self.dim))
        elif self.weight_init == 'uniform':
            bound = math.sqrt(3) * std
            w = jax.random.uniform(key, (self.n_q, embed_dim, self.dim),
                                   minval=-bound, maxval=bound)
        else:
            w = jax.random.normal(key, (self.n_q, embed_dim, self.dim))
        return w

    def _init_linears(self, key: jax.Array) -> dict:
        std = self._std(self.dim, None)
        if self.weight_init == 'uniform':
            bound = math.sqrt(3) * std
            w = jax.random.uniform(key, (self.n_q, self.card, self.dim),
                                   minval=-bound, maxval=bound)
        else:
            w = std * jax.random.truncated_normal(
                key, -3.0, 3.0, (self.n_q, self.card, self.dim))
        out = {'weight': w}
        if self.bias_proj:
            out['bias'] = jnp.zeros((self.n_q, self.card))
        return out

    def init_cache(self, batch: int, capacity: int, dtype=jnp.float32,
                   kv_dtype: tp.Optional[str] = None):
        return self.transformer.init_cache(batch, capacity, dtype,
                                           kv_dtype=kv_dtype)

    # --------------------------------------------------------------- forward
    def embed_sequence(self, params: dict, sequence: jax.Array) -> jax.Array:
        """sequence: [B, K, S] int -> summed embeddings [B, S, dim]."""
        emb = params['emb']  # [K, card+1, dim]
        gathered = jax.vmap(lambda table, ids: jnp.take(table, ids, axis=0),
                            in_axes=(0, 1), out_axes=1)(emb, sequence)
        # gathered: [B, K, S, dim] -> sum over K
        return jnp.sum(gathered, axis=1)

    def apply_heads(self, params: dict, out: jax.Array) -> jax.Array:
        """out: [B, S, dim] -> logits [B, K, S, card]."""
        w = params['linears']['weight']  # [K, card, dim] (or quantized leaf)
        if isinstance(w, dict) and 'q' in w:
            logits = jnp.einsum('bsd,kcd->bksc', out,
                                w['q'].astype(out.dtype),
                                preferred_element_type=jnp.float32)
            logits = logits * w['s'][None, :, None, :]
        elif isinstance(w, dict) and ('q4' in w or 'q4p' in w):
            if 'q4' in w:
                q = w['q4']                    # [K, card, D] int4 (prepared)
            else:
                from .quantize import unpack_int4
                q = unpack_int4(w['q4p'])      # [K, card, D]
            sc = w['s']                        # [K, card, G]
            g = sc.shape[-1]
            gs = q.shape[-1] // g
            outg = out.reshape(*out.shape[:-1], g, gs)
            qg = q.reshape(*q.shape[:-1], g, gs).astype(out.dtype)
            t = jnp.einsum('bsgl,kcgl->bkscg', outg, qg,
                           preferred_element_type=jnp.float32)
            logits = jnp.einsum('bkscg,kcg->bksc', t, sc)
        else:
            logits = jnp.einsum('bsd,kcd->bksc', out, w,
                                preferred_element_type=jnp.float32)
        if 'bias' in params['linears']:
            logits = logits + params['linears']['bias'][None, :, None, :]
        return logits

    def forward(self, params: dict, sequence: jax.Array,
                condition_tensors: tp.Dict[str, ConditionType],
                caches: tp.Optional[tp.Tuple[KVCache, ...]] = None,
                cross_kv: tp.Optional[tuple] = None,
                first_step: bool = True,
                attn_mask: tp.Optional[jax.Array] = None,
                ) -> tp.Tuple[jax.Array, tp.Optional[tp.Tuple[KVCache, ...]]]:
        """sequence: [B, K, S] -> logits [B, K, S, card] (reference lm.py:221-268)."""
        B, K, S = sequence.shape
        assert K == self.num_codebooks
        input_ = self.embed_sequence(params, sequence)
        input_, cross_src = self.fuser(input_, condition_tensors,
                                       first_step=first_step)
        if cross_kv is not None:
            cross_src = None
        out, new_caches = self.transformer(
            params['transformer'], input_, caches=caches,
            cross_attention_src=cross_src, cross_kv=cross_kv,
            attn_mask=attn_mask)
        if 'out_norm' in params:
            out = layer_norm(out, **params['out_norm'])
        logits = self.apply_heads(params, out)
        if self.fuser.has_prepend:
            logits = logits[:, :, -S:]
        return logits, new_caches

    def compute_predictions(self, params: dict, codes: jax.Array,
                            condition_tensors: tp.Dict[str, ConditionType],
                            keep_only_valid_steps: bool = True) -> LMOutput:
        """Training forward through the interleaving pattern (lm.py:270-321)."""
        B, K, T = codes.shape
        pattern = self.pattern_provider.get_pattern(T)
        sequence_codes, _, _ = pattern.build_pattern_sequence(
            codes, self.special_token_id, keep_only_valid_steps=keep_only_valid_steps)
        logits, _ = self.forward(params, sequence_codes, condition_tensors)
        logits = jnp.transpose(logits, (0, 3, 1, 2))  # [B, card, K, S]
        logits, _, logits_mask = pattern.revert_pattern_logits(
            logits, float('nan'), keep_only_valid_steps=keep_only_valid_steps)
        logits = jnp.transpose(logits, (0, 2, 3, 1))  # [B, K, T, card]
        mask = jnp.broadcast_to(jnp.asarray(logits_mask)[None], (B, K, T))
        return LMOutput(logits=logits, mask=mask)

    # -------------------------------------------------------------- generate
    def _combine_cfg(self, all_logits: jax.Array, B: int, has_cfg: bool,
                     cfg_coef: float,
                     cfg_coef_beta: tp.Optional[float] = None) -> jax.Array:
        if not has_cfg:
            return all_logits
        if cfg_coef_beta is not None:
            # double CFG (MusicGen-Style, lm.py:362-377): groups are
            # [text+style cond, style-only cond, uncond]
            cond_logits = all_logits[:B]
            wav_logits = all_logits[B:2 * B]
            uncond_logits = all_logits[2 * B:3 * B]
            return uncond_logits + cfg_coef * (
                wav_logits + cfg_coef_beta * (cond_logits - wav_logits)
                - uncond_logits)
        cond_logits = all_logits[:B]
        uncond_logits = all_logits[B:2 * B]
        return uncond_logits + (cond_logits - uncond_logits) * cfg_coef

    def generate(self, params: dict, key: jax.Array,
                 prompt: tp.Optional[jax.Array] = None,
                 condition_tensors: tp.Optional[tp.Union[
                     tp.Dict[str, ConditionType],
                     tp.Tuple[tp.Dict[str, ConditionType],
                              tp.Dict[str, ConditionType]]]] = None,
                 num_samples: int = 1,
                 max_gen_len: int = 256,
                 use_sampling: bool = True,
                 temp: float = 1.0,
                 top_k: int = 250,
                 top_p: float = 0.0,
                 cfg_coef: tp.Optional[float] = None,
                 cfg_coef_beta: tp.Optional[float] = None,
                 two_step_cfg: tp.Optional[bool] = None,
                 remove_prompts: bool = False,
                 compute_dtype: tp.Optional[tp.Any] = None,
                 kv_dtype: tp.Optional[str] = None,
                 kv_buckets: tp.Union[None, str, tp.Sequence[int]] = None,
                 ) -> jax.Array:
        """AR generation over the pattern sequence (reference lm.py:420-588).

        CFG variants (lm.py:352-416):
        * 1-pass CFG (default): ``condition_tensors`` is a dict whose rows are
          the concatenated [conditions; null_conditions] along the batch axis;
          the model input is batch-doubled.
        * double CFG (``cfg_coef_beta``, MusicGen-Style): rows are
          [text+style; style-only; null]; model input is batch-tripled.
        * two-step CFG: ``condition_tensors`` is a (cond, null) tuple; two
          forwards per step with independent KV caches (the reference's
          streaming-state swap trick, lm.py:378-387, becomes two explicit
          cache pytrees).

        ``kv_buckets``: bucketed KV-cache growth — run the decode scan in
        segments of doubling cache capacity instead of one full-capacity
        buffer, cutting the dominant per-step KV read traffic at long
        sequence lengths (token-exact; see nn/transformer.grow_cache).
        ``'auto'`` uses a 256/512/1024/... ladder; a sequence gives explicit
        capacities; None (default, the parity path) keeps one buffer.

        Returns codes [B, K, max_gen_len] (prompt included unless
        ``remove_prompts``).
        """
        cfg_coef = self.cfg_coef if cfg_coef is None else cfg_coef
        two_step_cfg = self.two_step_cfg if two_step_cfg is None else two_step_cfg
        if compute_dtype is not None:
            # bf16 decode: transformer/embedding matmuls in the MXU-native
            # dtype; attention softmax, output logits, CFG combine, and
            # sampling stay fp32 (see nn/transformer._attend / apply_heads).
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if hasattr(a, 'dtype') and jnp.issubdtype(a.dtype, jnp.floating)
                else a, t)
            params = cast(params)
            if condition_tensors is not None:
                condition_tensors = jax.tree.map(
                    lambda a: a.astype(compute_dtype)
                    if hasattr(a, 'dtype') and jnp.issubdtype(a.dtype, jnp.floating)
                    else a, condition_tensors)
        if self.scan_layers:
            # stack once, OUTSIDE the decode scan (stacking copies weights)
            params = dict(params)
            params['transformer'] = self.transformer.stack_params(
                params['transformer'])
        from .quantize import prepare_for_decode
        params = prepare_for_decode(params)
        if prompt is None:
            prompt = jnp.zeros((num_samples, self.num_codebooks, 0), jnp.int32)
        B, K, T = prompt.shape
        start_offset = T
        # == is allowed: only the trailing delayed codebook entries get
        # generated then (reference lm.py:525 asserts <=)
        assert start_offset <= max_gen_len

        pattern = self.pattern_provider.get_pattern(max_gen_len)
        unknown_token = -1
        gen_codes = jnp.full((B, K, max_gen_len), unknown_token, jnp.int32)
        if T > 0:
            gen_codes = gen_codes.at[..., :T].set(prompt.astype(jnp.int32))
        gen_sequence, _, mask_np = pattern.build_pattern_sequence(
            gen_codes, self.special_token_id)
        S = gen_sequence.shape[-1]
        mask = jnp.asarray(mask_np)  # [K, S]

        start_offset_sequence = pattern.get_first_step_with_timesteps(start_offset)
        assert start_offset_sequence is not None

        is_two_step = isinstance(condition_tensors, tuple)
        if is_two_step:
            assert two_step_cfg or True  # tuple input implies two-step mode
            cond_tensors, null_tensors = condition_tensors
            has_cfg = len(cond_tensors) > 0
            condition_tensors = cond_tensors
        else:
            has_cfg = condition_tensors is not None and len(condition_tensors) > 0
        if condition_tensors is None:
            condition_tensors = {}
        n_groups = 1
        if has_cfg and not is_two_step:
            n_groups = 3 if cfg_coef_beta is not None else 2
        model_batch = n_groups * B

        # capacity: S steps + prepended conditioning length
        prepend_len = 0
        if self.fuser.has_prepend and has_cfg:
            for name in self.fuser.fuse_list('prepend'):
                if name in condition_tensors:
                    prepend_len += condition_tensors[name][0].shape[1]
        capacity = S + prepend_len
        if kv_buckets is None:
            segments = [(start_offset_sequence + 1, S, capacity)]
        else:
            caps = (_auto_capacities(capacity) if kv_buckets == 'auto'
                    else kv_buckets)
            segments = _plan_cache_segments(start_offset_sequence + 1, S,
                                            prepend_len, caps)
        cache_dtype = compute_dtype or jnp.float32

        def make_cross_kv(tensors, batch):
            if not (self.cross_attention and tensors):
                return None
            _, cross_src = self.fuser(
                jnp.zeros((batch, 1, self.dim)), tensors, first_step=False)
            if cross_src is None:
                return None
            return self.transformer.precompute_cross_kv(
                params['transformer'], cross_src)

        init_capacity = segments[0][2]
        if is_two_step and has_cfg:
            caches = (self.init_cache(B, init_capacity, cache_dtype, kv_dtype),
                      self.init_cache(B, init_capacity, cache_dtype, kv_dtype))
            cross_kv_cond = make_cross_kv(condition_tensors, B)
            cross_kv_null = make_cross_kv(null_tensors, B)

            def model_step(seq_chunk, caches, first_step):
                cond_caches, null_caches = caches
                cond_logits, cond_caches = self.forward(
                    params, seq_chunk, condition_tensors, caches=cond_caches,
                    cross_kv=cross_kv_cond, first_step=first_step)
                uncond_logits, null_caches = self.forward(
                    params, seq_chunk, null_tensors, caches=null_caches,
                    cross_kv=cross_kv_null, first_step=first_step)
                logits = uncond_logits + (cond_logits - uncond_logits) * cfg_coef
                return logits, (cond_caches, null_caches)
        else:
            caches = self.init_cache(model_batch, init_capacity, cache_dtype,
                                     kv_dtype)
            cross_kv = make_cross_kv(condition_tensors, model_batch)

            def model_step(seq_chunk, caches, first_step):
                """seq_chunk: [B, K, s] -> logits [B, K, s, card] after CFG."""
                tiled = jnp.concatenate([seq_chunk] * n_groups, axis=0) \
                    if has_cfg else seq_chunk
                logits, new_caches = self.forward(
                    params, tiled, condition_tensors, caches=caches,
                    cross_kv=cross_kv, first_step=first_step)
                logits = self._combine_cfg(logits, B, has_cfg, cfg_coef,
                                           cfg_coef_beta)
                return logits, new_caches

        keys = jax.random.split(key, S)

        # ---- prefill over [0, start_offset_sequence) --------------------
        S0 = start_offset_sequence
        prefill_seq = gen_sequence[..., :S0]
        logits, caches = model_step(prefill_seq, caches, first_step=True)
        last_logits = logits[:, :, -1, :]  # [B, K, card]

        def write_token(gen_sequence, offset, logits, skey):
            next_token = sample_token(skey, logits, use_sampling, temp,
                                      top_k, top_p).astype(jnp.int32)
            valid = lax.dynamic_slice_in_dim(mask, offset, 1, axis=1)[:, 0]  # [K]
            next_token = jnp.where(valid[None, :], next_token,
                                   self.special_token_id)
            curr = lax.dynamic_slice_in_dim(gen_sequence, offset, 1, axis=2)[..., 0]
            token = jnp.where(curr == unknown_token, next_token, curr)
            gen_sequence = lax.dynamic_update_slice_in_dim(
                gen_sequence, token[..., None], offset, axis=2)
            return gen_sequence

        gen_sequence = write_token(gen_sequence, S0, last_logits, keys[S0])

        # ---- scan over single decode steps ------------------------------
        def step(carry, offset):
            gen_sequence, caches = carry
            curr = lax.dynamic_slice_in_dim(gen_sequence, offset - 1, 1, axis=2)
            logits, caches = model_step(curr, caches, first_step=False)
            gen_sequence = write_token(gen_sequence, offset,
                                       logits[:, :, -1, :], keys[offset])
            return (gen_sequence, caches), None

        current_capacity = init_capacity
        for seg_start, seg_end, seg_capacity in segments:
            if seg_capacity > current_capacity:
                caches = grow_cache(caches, seg_capacity)
                current_capacity = seg_capacity
            if seg_start < seg_end:
                (gen_sequence, caches), _ = lax.scan(
                    step, (gen_sequence, caches),
                    jnp.arange(seg_start, seg_end))

        # ---- revert pattern --------------------------------------------
        out_codes, _, out_mask = pattern.revert_pattern_sequence(
            gen_sequence, special_token=unknown_token)
        out_start = start_offset if remove_prompts else 0
        return out_codes[..., out_start:max_gen_len]
