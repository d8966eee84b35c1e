"""Pattern provider parity vs reference codebooks_patterns."""

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax.numpy as jnp

from audiocraft_tpu.patterns import (
    DelayedPatternProvider, ParallelPatternProvider, UnrolledPatternProvider,
    CoarseFirstPattern, MusicLMPattern,
)

PAIRS = [
    ("DelayedPatternProvider", DelayedPatternProvider, {}),
    ("DelayedPatternProvider", DelayedPatternProvider, {"delays": [0, 2, 4, 6]}),
    ("DelayedPatternProvider", DelayedPatternProvider,
     {"flatten_first": 2, "empty_initial": 3}),
    ("ParallelPatternProvider", ParallelPatternProvider, {}),
    ("UnrolledPatternProvider", UnrolledPatternProvider, {}),
    ("UnrolledPatternProvider", UnrolledPatternProvider,
     {"flattening": [0, 1, 1, 2], "delays": [0, 0, 0, 0]}),
    ("CoarseFirstPattern", CoarseFirstPattern, {}),
    ("MusicLMPattern", MusicLMPattern, {}),
]


@pytest.mark.parametrize("ref_name,our_cls,kwargs", PAIRS)
@pytest.mark.parametrize("timesteps", [8, 16])
def test_layout_matches(ref_name, our_cls, kwargs, timesteps):
    ref_mod = ref_module("audiocraft.modules.codebooks_patterns")
    n_q = 4
    ref_provider = getattr(ref_mod, ref_name)(n_q, **kwargs)
    our_provider = our_cls(n_q, **kwargs)
    ref_pattern = ref_provider.get_pattern(timesteps)
    our_pattern = our_provider.get_pattern(timesteps)
    ref_layout = [[(c.t, c.q) for c in step] for step in ref_pattern.layout]
    our_layout = [[(c.t, c.q) for c in step] for step in our_pattern.layout]
    assert ref_layout == our_layout
    assert ref_pattern.max_delay == our_pattern.max_delay
    assert ref_pattern.num_sequence_steps == our_pattern.num_sequence_steps


@pytest.mark.parametrize("ref_name,our_cls,kwargs", PAIRS)
def test_build_revert_matches(ref_name, our_cls, kwargs):
    import torch
    ref_mod = ref_module("audiocraft.modules.codebooks_patterns")
    n_q, T, B = 4, 10, 2
    special = 999
    ref_provider = getattr(ref_mod, ref_name)(n_q, **kwargs)
    our_provider = our_cls(n_q, **kwargs)
    ref_pattern = ref_provider.get_pattern(T)
    our_pattern = our_provider.get_pattern(T)

    z = np.random.RandomState(0).randint(0, 100, (B, n_q, T)).astype(np.int64)
    v_ref, i_ref, m_ref = ref_pattern.build_pattern_sequence(to_torch(z), special)
    v, i, m = our_pattern.build_pattern_sequence(jnp.asarray(z), special)
    assert (np.asarray(v) == to_np(v_ref)).all()
    assert (np.asarray(i) == to_np(i_ref)).all()
    assert (np.asarray(m) == to_np(m_ref)).all()

    r_ref, ri_ref, rm_ref = ref_pattern.revert_pattern_sequence(v_ref, special)
    r, ri, rm = our_pattern.revert_pattern_sequence(v, special)
    assert (np.asarray(r) == to_np(r_ref)).all()
    assert (np.asarray(rm) == to_np(rm_ref)).all()
    # revert(build(z)) recovers z wherever the mask is set
    rec = np.asarray(r)
    mask = np.asarray(rm)
    assert (rec[:, mask] == z[:, mask]).all()


def test_revert_logits_matches():
    import torch
    ref_mod = ref_module("audiocraft.modules.codebooks_patterns")
    n_q, T, B, card = 4, 6, 2, 11
    ref_pattern = ref_mod.DelayedPatternProvider(n_q).get_pattern(T)
    our_pattern = DelayedPatternProvider(n_q).get_pattern(T)
    S = len(ref_pattern.layout)
    logits = np.random.RandomState(1).randn(B, card, n_q, S).astype(np.float32)
    v_ref, _, m_ref = ref_pattern.revert_pattern_logits(to_torch(logits), float('nan'))
    v, _, m = our_pattern.revert_pattern_logits(jnp.asarray(logits), float('nan'))
    np.testing.assert_array_equal(np.asarray(m), to_np(m_ref))
    np.testing.assert_allclose(np.asarray(v), to_np(v_ref), atol=0, equal_nan=True)


def test_keep_only_valid_steps():
    import torch
    ref_mod = ref_module("audiocraft.modules.codebooks_patterns")
    n_q, T, B = 4, 10, 1
    ref_pattern = ref_mod.DelayedPatternProvider(n_q).get_pattern(T)
    our_pattern = DelayedPatternProvider(n_q).get_pattern(T)
    z = np.random.RandomState(2).randint(0, 50, (B, n_q, T)).astype(np.int64)
    v_ref, _, m_ref = ref_pattern.build_pattern_sequence(
        to_torch(z), 77, keep_only_valid_steps=True)
    v, _, m = our_pattern.build_pattern_sequence(
        jnp.asarray(z), 77, keep_only_valid_steps=True)
    assert (np.asarray(v) == to_np(v_ref)).all()
    assert (np.asarray(m) == to_np(m_ref)).all()
