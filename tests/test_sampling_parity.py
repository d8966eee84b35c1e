"""Deterministic parity of the top-k / top-p probability filtering vs the
reference samplers (utils/utils.py:111-144).  The RNG draw differs between
frameworks by construction, but the filtered+renormalized distribution each
sampler draws from must match exactly."""

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax
import jax.numpy as jnp


def _ref_utils():
    return ref_module("audiocraft.utils.utils")


def _probs(shape=(2, 3, 50), seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(*shape).astype(np.float32) * 2
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


@pytest.mark.parametrize("k", [1, 5, 20])
def test_top_k_filtered_distribution_matches(k):
    import torch
    probs = _probs()
    # reference filtering (sample_top_k mutates probs before multinomial)
    p_ref = to_torch(probs.copy())
    top_k_value, _ = torch.topk(p_ref, k, dim=-1)
    min_value_top_k = top_k_value[..., [-1]]
    p_ref *= (p_ref >= min_value_top_k).float()
    p_ref.div_(p_ref.sum(dim=-1, keepdim=True))

    p = jnp.asarray(probs)
    kth = jax.lax.top_k(p, k)[0][..., -1:]
    ours = p * (p >= kth)
    ours = ours / jnp.sum(ours, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(ours), to_np(p_ref),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("p_val", [0.3, 0.9])
def test_top_p_filtered_distribution_matches(p_val):
    import torch
    probs = _probs(seed=4)
    p_ref = to_torch(probs.copy())
    probs_sort, probs_idx = torch.sort(p_ref, dim=-1, descending=True)
    probs_sum = torch.cumsum(probs_sort, dim=-1)
    mask = probs_sum - probs_sort > p_val
    probs_sort *= (~mask).float()
    probs_sort.div_(probs_sort.sum(dim=-1, keepdim=True))
    # scatter back to vocabulary order for comparison
    ref_full = torch.zeros_like(p_ref).scatter(-1, probs_idx, probs_sort)

    p = jnp.asarray(probs)
    sort_idx = jnp.argsort(-p, axis=-1)
    sorted_p = jnp.take_along_axis(p, sort_idx, axis=-1)
    csum = jnp.cumsum(sorted_p, axis=-1)
    keep = (csum - sorted_p) <= p_val
    filtered = jnp.where(keep, sorted_p, 0.0)
    filtered = filtered / jnp.sum(filtered, axis=-1, keepdims=True)
    ours_full = jnp.zeros_like(p).at[
        jnp.arange(p.shape[0])[:, None, None],
        jnp.arange(p.shape[1])[None, :, None],
        sort_idx].set(filtered)
    np.testing.assert_allclose(np.asarray(ours_full), to_np(ref_full),
                               atol=1e-6, rtol=1e-5)


def test_greedy_matches_reference_argmax():
    import torch
    logits = np.random.RandomState(1).randn(3, 4, 30).astype(np.float32)
    # duplicate the max to exercise tie-breaking
    logits[0, 0, 7] = logits[0, 0, 20] = logits[0, 0].max() + 1
    ref = to_np(torch.argmax(to_torch(logits), dim=-1))
    from audiocraft_tpu.lm.sampling import sample_token
    ours = np.asarray(sample_token(jax.random.PRNGKey(0), jnp.asarray(logits),
                                   use_sampling=False, temp=1.0, top_k=0,
                                   top_p=0.0))
    np.testing.assert_array_equal(ours, ref)


def test_wrapped_compression_model():
    from audiocraft_tpu.builders import (get_debug_compression_model,
                                         get_wrapped_compression_model)
    base = get_debug_compression_model()
    w = get_wrapped_compression_model(base, interleave_stereo=True, n_q=2)
    assert w.channels == 2 and w.num_codebooks == 4  # 2 per channel
    w2 = get_wrapped_compression_model(base, n_q=3)
    assert w2.num_codebooks == 3
