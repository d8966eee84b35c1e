"""Token sampling: greedy / temperature / top-k / top-p.

Semantics mirror ``/root/reference/audiocraft/utils/utils.py:91-144``:
top-k keeps values >= the k-th largest then renormalizes; top-p sorts
descending, keeps the smallest prefix whose (cumsum - p_i) <= p, renormalizes,
samples in sorted space and maps back.  Greedy is plain argmax (first-index
ties, matching torch).  RNG differs from torch by construction — distributional
parity only, except greedy which is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def multinomial(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Sample one index per row from probabilities on the last axis."""
    logits = jnp.log(jnp.maximum(probs, 1e-30))
    return jax.random.categorical(key, logits, axis=-1)


def sample_top_k(key: jax.Array, probs: jax.Array, k: int) -> jax.Array:
    # k beyond the vocab degenerates to plain sampling (small debug/test
    # vocabularies with the serving default top_k=250)
    k = min(k, probs.shape[-1])
    top_k_value = jax.lax.top_k(probs, k)[0]
    min_value_top_k = top_k_value[..., -1:]
    probs = probs * (probs >= min_value_top_k)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return multinomial(key, probs)


def sample_top_p(key: jax.Array, probs: jax.Array, p: float) -> jax.Array:
    sort_idx = jnp.argsort(-probs, axis=-1)
    probs_sort = jnp.take_along_axis(probs, sort_idx, axis=-1)
    probs_sum = jnp.cumsum(probs_sort, axis=-1)
    mask = (probs_sum - probs_sort) > p
    probs_sort = jnp.where(mask, 0.0, probs_sort)
    probs_sort = probs_sort / jnp.sum(probs_sort, axis=-1, keepdims=True)
    next_sorted = multinomial(key, probs_sort)
    return jnp.take_along_axis(sort_idx, next_sorted[..., None], axis=-1)[..., 0]


def sample_token(key: jax.Array, logits: jax.Array, use_sampling: bool,
                 temp: float, top_k: int, top_p: float) -> jax.Array:
    """logits: [..., card] -> token indices [...]. Mirrors lm.py:407-416."""
    if use_sampling and temp > 0.0:
        probs = jax.nn.softmax(logits / temp, axis=-1)
        if top_p > 0.0:
            return sample_top_p(key, probs, top_p)
        if top_k > 0:
            return sample_top_k(key, probs, top_k)
        return multinomial(key, probs)
    return jnp.argmax(logits, axis=-1)
