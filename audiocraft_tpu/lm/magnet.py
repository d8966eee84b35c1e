"""MAGNeT: non-autoregressive masked parallel decoding over RVQ streams.

Re-design of ``/root/reference/audiocraft/models/lm_magnet.py`` (MagnetLMModel):
* Per-stage restricted-context self-attention masks for codebooks > 0
  (lm_magnet.py:48-115) — precomputed [S, S] additive biases.
* Stage loop over the n_q codebooks (:241-260), each running iterative
  mask-predict decoding: cosine masking schedule, CFG with linearly annealed
  coefficient max->min (:384-391), linearly annealed temperature, and
  re-masking of the least probable non-overlapping spans (:365-372).

TPU notes: the masking schedule is static — ``num_masked`` per iteration is a
Python int, so every ``top_k`` has a static k and the whole decode unrolls
into one jittable program with fixed shapes.  Both span arrangements are
implemented: 'nonoverlap' (released-model default, chunked top-k re-masking)
and 'stride1' (overlapping least-probable-span masking via a fixed-shape
coverage scan instead of the reference's data-dependent binary search).
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..cond.fuser import ConditionType
from .model import LMModel
from .sampling import sample_token

DONT_REMASK_ME_SCORE = -1e4


@dataclasses.dataclass(frozen=True, eq=False)
class MagnetLMModel(LMModel):
    subcodes_context: int = 5
    compression_model_framerate: int = 50
    segment_duration: int = 10
    span_len: int = 3

    def restricted_context_attn_mask(self, seq_len: int) -> jax.Array:
        """Local (|Δt| <= context) non-causal attention bias (lm_magnet.py:49-68)."""
        pos = jnp.arange(seq_len)
        delta = pos[:, None] - pos[None, :]
        valid = jnp.abs(delta) <= self.subcodes_context
        return jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[None, None]

    def stage_attn_mask(self, stage: int, seq_len: int) -> tp.Optional[jax.Array]:
        if stage > 0 and self.subcodes_context > -1:
            return self.restricted_context_attn_mask(seq_len)
        return None

    def _least_probable_span_masking(self, scores: jax.Array,
                                     num_masked_trg: int) -> jax.Array:
        """Overlapping (stride-1) span masking: cover the tokens of the u
        least-probable spans, with u chosen so the total masked count is as
        close as possible to ``num_masked_trg`` (reference lm_magnet.py:442-500;
        the reference finds u by binary search — here the cumulative coverage
        of score-ordered spans is computed in one scan and u selected directly,
        same criterion).

        scores: [T] (higher = mask first).  Returns bool [T].
        """
        L = self.span_len
        T = scores.shape[-1]
        num_masked_trg = max(num_masked_trg, L)
        M = T - L + 1  # number of spans
        # span score: sum of token scores over the span window
        csum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(scores)])
        span_scores = csum[L:] - csum[:-L]  # [M]
        order = jnp.argsort(-span_scores)   # span starts, best (most maskable) first
        ranks = jnp.zeros((M,), jnp.int32).at[order].set(jnp.arange(M, dtype=jnp.int32))

        # cumulative newly-covered token counts as spans are added in order
        token_pos = jnp.arange(T)

        def cover_count(covered, start):
            window = (token_pos >= start) & (token_pos < start + L)
            new = jnp.sum(window & ~covered)
            return covered | window, new

        _, added = jax.lax.scan(cover_count, jnp.zeros((T,), bool), order)
        cum = jnp.cumsum(added)  # [M] tokens covered by first u spans

        min_u = num_masked_trg // L
        max_u = max(num_masked_trg - L + 1, min_u)
        u_candidates = jnp.arange(1, M + 1)
        feasible = (cum <= num_masked_trg) & (u_candidates <= max_u)
        u = jnp.maximum(jnp.max(jnp.where(feasible, u_candidates, 0)), min_u)

        # token mask: any span with rank < u covers it
        chosen = ranks < u  # [M] indicator over span starts
        ind = jnp.concatenate([jnp.zeros(L - 1, jnp.int32),
                               chosen.astype(jnp.int32)])
        icum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(ind)])
        # token t covered by starts in [t-L+1, t] -> window sum > 0
        win = icum[token_pos + L] - icum[token_pos]
        return win > 0

    def generate_magnet(self, params: dict, key: jax.Array,
                        prompt: tp.Optional[jax.Array] = None,
                        condition_tensors: tp.Optional[tp.Dict[str, ConditionType]] = None,
                        num_samples: int = 1,
                        max_gen_len: int = 256,
                        use_sampling: bool = True,
                        temp: float = 3.0,
                        top_k: int = 0,
                        top_p: float = 0.9,
                        max_cfg_coef: float = 10.0,
                        min_cfg_coef: float = 1.0,
                        decoding_steps: tp.Sequence[int] = (20, 10, 10, 10),
                        anneal_temp: bool = True,
                        span_scoring: str = 'max',
                        span_arrangement: str = 'nonoverlap') -> jax.Array:
        """Iterative mask-predict decode (reference _generate_magnet, :152-262)."""
        assert span_arrangement in ('nonoverlap', 'stride1')
        assert len(decoding_steps) == self.n_q

        if prompt is None:
            prompt = jnp.zeros((num_samples, self.num_codebooks, 0), jnp.int32)
        B, K, prompt_length = prompt.shape
        assert prompt_length < max_gen_len
        mask_id = self.special_token_id

        has_cfg = condition_tensors is not None and len(condition_tensors) > 0
        condition_tensors = condition_tensors or {}

        gen_sequence = jnp.full((B, K, max_gen_len), mask_id, jnp.int32)
        if prompt_length:
            gen_sequence = gen_sequence.at[..., :prompt_length].set(prompt)

        cross_kv = None
        if self.cross_attention and condition_tensors:
            model_batch = 2 * B if has_cfg else B
            _, cross_src = self.fuser(
                jnp.zeros((model_batch, 1, self.dim)), condition_tensors,
                first_step=False)
            if cross_src is not None:
                cross_kv = self.transformer.precompute_cross_kv(
                    params['transformer'], cross_src)

        curr = gen_sequence
        for stage, n_steps in zip(range(self.n_q), decoding_steps):
            key, sub = jax.random.split(key)
            curr = self._generate_stage(
                params, sub, curr, condition_tensors, has_cfg, stage=stage,
                prompt=prompt, prompt_length=prompt_length, temp=temp,
                max_cfg_coef=max_cfg_coef, min_cfg_coef=min_cfg_coef,
                top_k=top_k, top_p=top_p, timesteps=n_steps,
                anneal_temp=anneal_temp, span_scoring=span_scoring,
                use_sampling=use_sampling, cross_kv=cross_kv,
                span_arrangement=span_arrangement)
        return curr

    def _generate_stage(self, params, key, gen_sequence, condition_tensors,
                        has_cfg: bool, stage: int, prompt, prompt_length: int,
                        temp: float, max_cfg_coef: float, min_cfg_coef: float,
                        top_k: int, top_p: float, timesteps: int,
                        anneal_temp: bool, span_scoring: str,
                        use_sampling: bool, cross_kv,
                        span_arrangement: str = 'nonoverlap') -> jax.Array:
        """One codebook level of iterative decoding (reference :293-441)."""
        B, K, T = gen_sequence.shape
        mask_id = self.special_token_id
        lps_masking = span_arrangement == 'stride1' and self.span_len > 1
        chunk_masking = self.span_len > 1 and not lps_masking
        span_len = self.span_len if chunk_masking else 1

        n_chunks = T // span_len
        T_trim = span_len * n_chunks
        gen_sequence = gen_sequence[..., :T_trim]
        T = T_trim

        stage_gen_seq = jnp.full((B, 1, T), mask_id, jnp.int32)
        if lps_masking:
            # token-wise scores (reference :339-343)
            token_ids = jnp.arange(T)
            scores = jnp.where(token_ids[None, None, :] < prompt_length,
                               DONT_REMASK_ME_SCORE, 0.0).astype(jnp.float32)
            gen_T = T - prompt_length
            n_prompt_chunks = 0
            num_chunks_to_gen = n_chunks
        else:
            n_prompt_chunks = prompt_length // span_len
            chunk_ids = jnp.arange(n_chunks)
            scores = jnp.where(chunk_ids[None, None, :] < n_prompt_chunks,
                               DONT_REMASK_ME_SCORE, 0.0).astype(jnp.float32)
            num_chunks_to_gen = n_chunks - n_prompt_chunks

        attn_mask = self.stage_attn_mask(stage, T)
        keys = jax.random.split(key, timesteps)
        timestep_vals = np.linspace(0, 1, timesteps)

        chunks_mask = jnp.zeros((B, 1, n_chunks), bool)
        for it, (timestep, steps_left) in enumerate(
                zip(timestep_vals, reversed(range(timesteps)))):
            mask_p = float(np.cos(timestep * math.pi * 0.5))
            if lps_masking:
                num_masked = max(int(mask_p * gen_T), 1)
                mask = jax.vmap(
                    lambda s: self._least_probable_span_masking(s, num_masked)
                )(scores[:, 0, :])[:, None, :]  # [B, 1, T]
                chunks_mask = mask  # token-wise fixed-score mask in this mode
            else:
                num_masked = max(int(mask_p * num_chunks_to_gen), 1)
                # re-mask the num_masked least-probable chunks (static k topk)
                masked_idx = jax.lax.top_k(scores, num_masked)[1]  # [B, 1, k]
                chunks_mask = jnp.zeros((B, 1, n_chunks), bool)
                chunks_mask = chunks_mask.at[
                    jnp.arange(B)[:, None, None],
                    jnp.zeros((1, 1, 1), jnp.int32),
                    masked_idx].set(True)
                mask = jnp.repeat(chunks_mask, span_len, axis=-1)  # [B, 1, T]
            stage_gen_seq = jnp.where(mask, mask_id, stage_gen_seq)

            if prompt_length:
                stage_gen_seq = stage_gen_seq.at[..., :prompt_length].set(
                    prompt[:, stage:stage + 1, :])
            gen_sequence = gen_sequence.at[:, stage:stage + 1, :].set(stage_gen_seq)

            seq = jnp.concatenate([gen_sequence, gen_sequence], axis=0) \
                if has_cfg else gen_sequence
            all_logits, _ = self.forward(params, seq, condition_tensors,
                                         cross_kv=cross_kv, first_step=True,
                                         attn_mask=attn_mask)
            if has_cfg:
                cond_logits = all_logits[:B]
                uncond_logits = all_logits[B:]
                cfg_coef = mask_p * max_cfg_coef + (1 - mask_p) * min_cfg_coef
                logits = uncond_logits + (cond_logits - uncond_logits) * cfg_coef
            else:
                logits = all_logits

            t = temp * (steps_left / timesteps) if anneal_temp else temp
            logits = logits[:, stage:stage + 1, :, :]  # [B, 1, T, card]
            scaled = logits / max(t, 1e-2)
            probs = jax.nn.softmax(scaled, axis=-1)
            if use_sampling:
                sampled = sample_token(keys[it], scaled, True, 1.0, top_k, top_p)
            else:
                sampled = jnp.argmax(logits, axis=-1)
            sampled = sampled.astype(jnp.int32)  # [B, 1, T]

            still_masked = stage_gen_seq == mask_id
            stage_gen_seq = jnp.where(still_masked, sampled, stage_gen_seq)
            gen_sequence = gen_sequence.at[:, stage:stage + 1, :].set(stage_gen_seq)

            sampled_probs = jnp.take_along_axis(
                probs, sampled[..., None], axis=-1)[..., 0]  # [B, 1, T]

            if lps_masking:
                # prod in log space, token-wise (reference :417)
                scores = -jnp.log(jnp.maximum(sampled_probs, 1e-30))
                scores = jnp.where(mask, scores, DONT_REMASK_ME_SCORE)
            elif span_scoring == 'max':
                scores = 1 - jnp.max(
                    sampled_probs.reshape(B, 1, n_chunks, -1), axis=-1)
                scores = jnp.where(chunks_mask, scores, DONT_REMASK_ME_SCORE)
            elif span_scoring == 'prod':
                scores = jnp.sum(
                    -jnp.log(jnp.maximum(sampled_probs, 1e-30))
                    .reshape(B, 1, n_chunks, -1), axis=-1)
                scores = jnp.where(chunks_mask, scores, DONT_REMASK_ME_SCORE)
            else:
                raise NotImplementedError(span_scoring)

        return gen_sequence
