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


def test_stride_extension_batched():
    """Batched long-form: the stride-extension window loop must carry B>1
    streams (the serving-farm configuration, scripts/perf_longform_batch.py)
    with per-stream conditioning intact and exact sample counts."""
    mg = get_debug_musicgen(jax.random.PRNGKey(8))
    mg.max_duration = 2.0
    mg.set_generation_params(duration=5.0, extend_stride=1.0, top_k=50)
    wav, tokens = mg.generate(['tune one', 'tune two', 'tune three'],
                              key=jax.random.PRNGKey(9), return_tokens=True)
    assert tokens.shape == (3, mg.compression_model.num_codebooks,
                            int(5.0 * mg.frame_rate))
    assert wav.shape == (3, 1, 160000)
    assert np.isfinite(np.asarray(wav)).all()
    # distinct conditioning + per-stream sampling -> distinct streams
    t = np.asarray(tokens)
    assert (t[0] != t[1]).any() and (t[1] != t[2]).any()


def test_generate_audio_long_routes_chunked_batched(mg):
    """Chunked decode at B>1 (batched 720 s-class requests) matches the
    monolithic decode for every stream."""
    card = mg.compression_model.cardinality
    codes = jnp.asarray(np.random.RandomState(11).randint(
        0, card, (3, mg.compression_model.num_codebooks, 90)), jnp.int32)
    ref = mg.compression_model.decode(mg.codec_params, codes)
    old = mg.decode_chunk_frames
    try:
        mg.decode_chunk_frames = 48
        out = mg.generate_audio(codes)
    finally:
        mg.decode_chunk_frames = old
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=0)


def test_generate_audio_long_routes_chunked(mg):
    """Token sequences beyond decode_chunk_frames route through the
    chunked decode (the 720 s OOM path) and match the monolithic decode."""
    card = mg.compression_model.cardinality
    codes = jnp.asarray(np.random.RandomState(7).randint(
        0, card, (1, mg.compression_model.num_codebooks, 90)), jnp.int32)
    ref = mg.compression_model.decode(mg.codec_params, codes)
    old = mg.decode_chunk_frames
    try:
        mg.decode_chunk_frames = 48
        out = mg.generate_audio(codes)
    finally:
        mg.decode_chunk_frames = old
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=0)


def test_long_prompt_encode_routes_chunked(mg):
    """Continuation prompts beyond the chunk threshold encode through
    chunked_encode (same OOM wall as long decodes) — token-identical to
    the monolithic encode on hop-multiple prompts."""
    hop = int(mg.sample_rate / mg.frame_rate)
    prompt = jnp.asarray(np.random.RandomState(9).randn(1, 1, 40 * hop)
                         .astype(np.float32) * 0.1)
    ref, _ = mg.compression_model.encode(mg.codec_params, prompt)
    old = mg.decode_chunk_frames
    try:
        mg.decode_chunk_frames = 32
        _, tokens = mg._prepare_tokens_and_attributes(['x'], prompt)
    finally:
        mg.decode_chunk_frames = old
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref))


def test_stereo_facade_generate():
    """The stereo-* variant wiring: interleaved codec (2x codebooks) + an LM
    over the doubled stream, producing 2-channel audio end to end."""
    import dataclasses
    from audiocraft_tpu.builders import (get_debug_compression_model,
                                         get_wrapped_compression_model)
    from audiocraft_tpu.cond.conditioners import (ConditioningProvider,
                                                  LUTConditioner)
    from audiocraft_tpu.cond.fuser import ConditionFuser
    from audiocraft_tpu.gen.musicgen import MusicGen
    from audiocraft_tpu.lm.model import LMModel
    from audiocraft_tpu.patterns import DelayedPatternProvider

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    codec = get_wrapped_compression_model(get_debug_compression_model(32000),
                                          interleave_stereo=True)
    assert codec.num_codebooks == 8 and codec.channels == 2
    provider = ConditioningProvider.from_dict({
        'description': LUTConditioner(n_bins=64, dim=16, output_dim=16)})
    lm = LMModel(pattern_provider=DelayedPatternProvider(8),
                 fuser=ConditionFuser.from_dict({'cross': ('description',)}),
                 n_q=8, card=400, dim=16, num_heads=4, num_layers=2,
                 cross_attention=True, causal=True)
    mg = MusicGen(name='musicgen-stereo-debug', compression_model=codec,
                  codec_params=codec.init(k1), lm=lm, lm_params=lm.init(k2),
                  condition_provider=provider, cond_params=provider.init(k3),
                  max_duration=30.0)
    mg.set_generation_params(duration=0.5)
    wav = mg.generate(['stereo test'], key=jax.random.PRNGKey(5))
    # duration quantizes to whole frames: int(0.5 * 25) = 12 -> 12 * 1280
    assert np.asarray(wav).shape == (1, 2, 15360)
    assert np.isfinite(np.asarray(wav)).all()
