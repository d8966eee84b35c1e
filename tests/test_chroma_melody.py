"""Chroma extraction, melody conditioning, and segment-stitch extension."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.nn.chroma import ChromaExtractor, chroma_filterbank
from audiocraft_tpu.gen.extend import (plan_segments, separate_audio_segments,
                                       stitch_segments)
from audiocraft_tpu.gen.musicgen import get_debug_melody_musicgen


def test_chroma_filterbank_shape_and_rows():
    fb = chroma_filterbank(32000, 4096, 12)
    assert fb.shape == (12, 2049)
    assert np.isfinite(fb).all()
    assert (fb >= 0).all()


def test_chroma_sine_hits_expected_pitch_class():
    sr = 32000
    t = np.arange(sr * 2) / sr
    # A4 = 440 Hz -> pitch class A = index 9 with base C ordering
    wav = jnp.asarray(np.sin(2 * np.pi * 440.0 * t).astype(np.float32))[None]
    ext = ChromaExtractor(sample_rate=sr, n_chroma=12, radix2_exp=12)
    chroma = np.asarray(ext(wav))  # [1, frames, 12]
    assert chroma.shape[-1] == 12
    dominant = np.bincount(chroma[0].argmax(-1), minlength=12).argmax()
    assert dominant == 9, f"expected pitch class A (9), got {dominant}"


def test_chroma_short_input_padding():
    ext = ChromaExtractor(sample_rate=32000, n_chroma=12, radix2_exp=12)
    out = ext(jnp.zeros((2, 1, 5)))
    assert out.shape[0] == 2 and out.shape[-1] == 12
    assert np.isfinite(np.asarray(out)).all()


def test_separate_audio_segments():
    sr = 1000
    audio = (sr, np.arange(sr * 10, dtype=np.float32))
    segs = separate_audio_segments(audio, segment_duration=3, overlap=1)
    assert all(len(s[1]) == 3 * sr for s in segs)
    assert len(segs) >= 4
    # overlap: second segment starts 2s in
    assert segs[1][1][0] == 2 * sr
    short = separate_audio_segments((sr, np.zeros(100, np.float32)), 3, 1)
    assert len(short) == 1


def test_plan_segments():
    total, duration, excess = plan_segments(70, 30, 2)
    assert total >= 3
    total1, _, _ = plan_segments(10, 30, 1)
    assert total1 == 1


def test_stitch_segments_crossfade():
    sr = 1000
    seg = jnp.ones((1, 1, 3 * sr))
    out = stitch_segments([seg, seg, seg], sr, overlap=1)
    arr = np.asarray(out)
    assert arr.shape[0:2] == (1, 1)
    assert np.isfinite(arr).all()
    # crossfaded sum of two linear ramps stays near 1 in the overlap
    assert arr.max() <= 1.5 and arr.min() >= 0.0
    out0 = stitch_segments([seg, seg], sr, overlap=0)
    assert out0.shape[-1] == 6 * sr


@pytest.fixture(scope="module")
def melody_mg():
    m = get_debug_melody_musicgen(jax.random.PRNGKey(0))
    m.set_generation_params(duration=1.0, top_k=50)
    return m


def test_generate_with_chroma(melody_mg):
    sr = 32000
    t = np.arange(sr * 2) / sr
    melody = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[None]
    wav = melody_mg.generate_with_chroma(['follow this melody'], [melody], sr,
                                         key=jax.random.PRNGKey(1))
    assert wav.shape == (1, 1, 32000)
    assert bool(jnp.isfinite(wav).all())


def test_generate_with_chroma_none_melody(melody_mg):
    wav = melody_mg.generate_with_chroma(['no melody'], [None], 32000,
                                         key=jax.random.PRNGKey(2))
    assert wav.shape == (1, 1, 32000)


def test_generate_music_segments_end_to_end(melody_mg):
    from audiocraft_tpu.gen.extend import generate_music_segments
    sr = 32000
    t = np.arange(sr * 4) / sr
    melody_data = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    melody_mg.set_generation_params(duration=2.0, top_k=50, extend_stride=1.0)
    segments, excess = generate_music_segments(
        'looping melody', (sr, melody_data), seed=42, model=melody_mg,
        duration=4, overlap=1, segment_duration=2)
    assert len(segments) >= 2
    stitched = stitch_segments(segments, sr, overlap=1)
    assert stitched.shape[0] == 1
    assert bool(jnp.isfinite(stitched).all())
