"""MAGNeT masked-parallel decoding tests."""

import numpy as np

import jax
import jax.numpy as jnp

from audiocraft_tpu.gen.magnet import get_debug_magnet
from oracle import ref_module, to_np


def test_restricted_context_mask_matches_reference():
    import torch
    ref_mod = ref_module("audiocraft.models.lm_magnet")
    mg = get_debug_magnet(jax.random.PRNGKey(0))
    seq_len = 16
    ours = np.asarray(mg.lm.restricted_context_attn_mask(seq_len))[0, 0]
    # reference builds the same mask inside MagnetLMModel; replicate inputs
    qpos = torch.arange(seq_len).view(-1, 1)
    kpos = torch.arange(seq_len).view(1, -1)
    valid = (qpos - kpos).abs() <= mg.lm.subcodes_context
    ref = torch.where(valid, torch.zeros([]), torch.full([], float('-inf')))
    assert (np.isneginf(ours) == np.isneginf(to_np(ref))).all()
    np.testing.assert_array_equal(np.nan_to_num(ours, neginf=-1),
                                  np.nan_to_num(to_np(ref), neginf=-1))


def test_magnet_generate_end_to_end():
    mg = get_debug_magnet(jax.random.PRNGKey(1))
    audio, tokens = mg.generate(['a short jingle'], key=jax.random.PRNGKey(2),
                                return_tokens=True)
    tokens = np.asarray(tokens)
    max_gen_len = int(mg.duration * mg.frame_rate)
    # span trim: length is a multiple of span_len
    assert tokens.shape[0] == 1 and tokens.shape[1] == 4
    assert tokens.shape[2] == (max_gen_len // mg.lm.span_len) * mg.lm.span_len
    assert (tokens >= 0).all() and (tokens < 400).all(), \
        "all mask tokens must be resolved"
    assert np.isfinite(np.asarray(audio)).all()


def test_magnet_generate_with_prompt():
    mg = get_debug_magnet(jax.random.PRNGKey(3))
    max_gen_len = int(mg.duration * mg.frame_rate)
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, 400, (1, 4, 6)))
    cond = (jnp.zeros((2, 3, 16)), jnp.ones((2, 3), jnp.int32))
    tokens = mg.lm.generate_magnet(
        mg.lm_params, jax.random.PRNGKey(4), prompt=prompt,
        condition_tensors={'description': cond},
        num_samples=1, max_gen_len=max_gen_len,
        decoding_steps=mg.decoding_steps)
    tokens = np.asarray(tokens)
    assert (tokens[..., :6] == np.asarray(prompt)).all(), \
        "prompt must be preserved"
    assert (tokens < 400).all()


def test_magnet_stride1_generation():
    mg = get_debug_magnet(jax.random.PRNGKey(5))
    mg.set_generation_params(decoding_steps=(3, 2, 2, 2),
                             span_arrangement='stride1')
    audio, tokens = mg.generate(['overlapping spans'],
                                key=jax.random.PRNGKey(6), return_tokens=True)
    tokens = np.asarray(tokens)
    assert (tokens >= 0).all() and (tokens < 400).all()
    assert np.isfinite(np.asarray(audio)).all()


def test_least_probable_span_masking_coverage():
    mg = get_debug_magnet(jax.random.PRNGKey(7))
    lm = mg.lm
    T = 30
    scores = jnp.asarray(np.random.RandomState(0).rand(T).astype(np.float32))
    for target in (3, 6, 12):
        mask = np.asarray(lm._least_probable_span_masking(scores, target))
        n = int(mask.sum())
        # at least span_len tokens masked; close to the target from below,
        # never wildly above it
        assert n >= lm.span_len
        assert n <= max(target, lm.span_len) + lm.span_len
        # masked region is a union of spans of length >= span_len
        runs = np.diff(np.flatnonzero(np.diff(
            np.concatenate(([0], mask.astype(int), [0])))).reshape(-1, 2),
            axis=1)
        assert (runs >= lm.span_len).all()
