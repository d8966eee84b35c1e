"""Quality metrics: FAD math, KLD protocol, CLAP score, chroma cosine."""

import numpy as np
import pytest

from audiocraft_tpu.metrics import (FrechetAudioDistance, chroma_cosine,
                                    clap_score, frechet_distance,
                                    kl_divergence_metric)


def test_frechet_distance_analytic():
    d = 4
    mu, sigma = np.zeros(d), np.eye(d)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0,
                                                                   abs=1e-8)
    # two isotropic gaussians: |dmu|^2 + d*(1 - sqrt(s))^2 for S2 = s*I
    mu2 = np.full(d, 2.0)
    s = 4.0
    expect = float(mu2 @ mu2) + d * (1 - np.sqrt(s)) ** 2
    assert frechet_distance(mu, sigma, mu2, s * np.eye(d)) == pytest.approx(
        expect, rel=1e-6)


def test_fad_separates_distributions():
    rng = np.random.RandomState(0)

    def embed(wav, sr):
        # toy embedder: per-sample (mean, std, absmean, energy) features
        w = wav.reshape(wav.shape[0], -1)
        return np.stack([w.mean(1), w.std(1), np.abs(w).mean(1),
                         (w ** 2).mean(1)], axis=1)

    fad_same = FrechetAudioDistance(embed, 16000)
    fad_diff = FrechetAudioDistance(embed, 16000)
    ref = rng.randn(64, 1, 400).astype(np.float32)
    same = rng.randn(64, 1, 400).astype(np.float32)
    diff = (3.0 * rng.randn(64, 1, 400) + 1.0).astype(np.float32)
    fad_same.add(reference=ref, generated=same)
    fad_diff.add(reference=ref, generated=diff)
    assert fad_diff.compute() > 10 * fad_same.compute() >= 0


def test_kld_protocol():
    p = np.asarray([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]])
    out = kl_divergence_metric(p, p)
    assert out['kld'] == pytest.approx(0.0, abs=1e-8)
    q = np.asarray([[0.1, 0.2, 0.7], [0.8, 0.1, 0.1]])
    out = kl_divergence_metric(p, q)
    assert out['kld'] > 0.5 and out['kld_inverse'] > 0.5
    assert out['kld_symmetric'] == pytest.approx(
        0.5 * (out['kld'] + out['kld_inverse']))


def test_clap_score_cosine():
    t = np.eye(3)
    assert clap_score(t, t) == pytest.approx(1.0)
    a = np.asarray([[0, 1.0, 0], [0, 0, 1.0], [1.0, 0, 0]])
    assert clap_score(t, a) == pytest.approx(0.0, abs=1e-8)


def test_chroma_cosine_melody_adherence():
    sr = 16000
    t = np.arange(2 ** 13) / sr
    a440 = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None, None]
    a440_oct = np.sin(2 * np.pi * 880 * t).astype(np.float32)[None, None]
    a466 = np.sin(2 * np.pi * 466.16 * t).astype(np.float32)[None, None]
    same = chroma_cosine(a440, a440, sr)
    octave = chroma_cosine(a440, a440_oct, sr)  # same pitch class
    semitone = chroma_cosine(a440, a466, sr)    # different pitch class
    assert same == pytest.approx(1.0, abs=1e-5)
    assert octave > 0.9
    assert semitone < octave - 0.2
