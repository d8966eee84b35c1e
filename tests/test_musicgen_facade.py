"""End-to-end MusicGen facade tests (debug models), mirroring the reference
tests/models/test_musicgen.py sample-count exactness checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.gen.musicgen import get_debug_musicgen


@pytest.fixture(scope="module")
def mg():
    m = get_debug_musicgen(jax.random.PRNGKey(0))
    m.set_generation_params(duration=2.0, use_sampling=True, top_k=50)
    return m


def test_generate_text(mg):
    wav = mg.generate(['a happy rock song', 'sad jazz'],
                      key=jax.random.PRNGKey(1))
    assert wav.shape == (2, 1, 64000)  # duration * sample_rate exactly
    assert bool(jnp.isfinite(wav).all())


def test_generate_unconditional(mg):
    wav = mg.generate_unconditional(3, key=jax.random.PRNGKey(2))
    assert wav.shape == (3, 1, 64000)


def test_generate_continuation(mg):
    prompt = np.random.RandomState(0).randn(1, 1, 16000).astype(np.float32) * 0.1
    wav = mg.generate_continuation(prompt, 32000, descriptions=['continue this'],
                                   key=jax.random.PRNGKey(3))
    assert wav.shape == (1, 1, 64000)


def test_generate_long_stride_extension(mg):
    mg.set_generation_params(duration=5.0, extend_stride=1.5)
    try:
        wav = mg.generate(['long song'], key=jax.random.PRNGKey(4))
    finally:
        mg.set_generation_params(duration=2.0)
    # duration 5 > max... (debug max_duration=30) — force small window instead
    assert wav.shape == (1, 1, 160000)


def test_stride_extension_beyond_max_duration():
    mg = get_debug_musicgen(jax.random.PRNGKey(5))
    mg.max_duration = 2.0
    mg.set_generation_params(duration=5.0, extend_stride=1.0, top_k=50)
    wav, tokens = mg.generate(['endless tune'], key=jax.random.PRNGKey(6),
                              return_tokens=True)
    assert tokens.shape[-1] == int(5.0 * mg.frame_rate)
    assert wav.shape == (1, 1, 160000)
