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


# ---- default (codec-latent) embedder: the self-contained FAD/KLD path ----

def _assets_mono(duration=8.0):
    from pathlib import Path
    import jax.numpy as jnp
    from audiocraft_tpu.io.audio_utils import convert_audio
    from audiocraft_tpu.io.wav import audio_read
    wavs = []
    for name in ('bach.mp3', 'bolero_ravel.mp3'):
        path = Path('/root/reference/assets') / name
        if not path.exists():
            pytest.skip('reference assets unavailable')
        w, sr = audio_read(path, duration=duration)
        wavs.append(np.asarray(convert_audio(jnp.asarray(w), sr, 32000, 1))[None])
    t = min(q.shape[-1] for q in wavs)
    return np.concatenate([w[..., :t] for w in wavs])


@pytest.fixture(scope='module')
def codec_and_params():
    import jax
    from audiocraft_tpu.builders import get_debug_compression_model
    model = get_debug_compression_model(32000)
    return model, model.init(jax.random.PRNGKey(0))


def test_codec_embed_fn_shapes_and_determinism(codec_and_params):
    from audiocraft_tpu.metrics import make_codec_embed_fn
    model, params = codec_and_params
    embed = make_codec_embed_fn(model, params)
    rng = np.random.RandomState(0)
    wav = (rng.randn(3, 1, 32000 * 2) * 0.1).astype(np.float32)
    e = embed(wav, 32000)
    # 2 windows of 1 s per clip, mean+std over the latent dim
    assert e.shape == (3 * 2, 2 * model.quantizer.dimension)
    assert np.array_equal(e, embed(wav, 32000))
    # resampling path: 16 kHz input maps into the model's 32 kHz world
    e16 = embed(wav[..., :16000 * 2], 16000)
    assert e16.shape == e.shape and np.isfinite(e16).all()


def test_codec_fad_kld_pinned_on_assets(codec_and_params):
    """Regression pin for the offline quality-metric path (VERDICT r3 #2):
    codec-FAD / codec-KLD between the reference assets and their roundtrip
    through the deterministic debug codec (PRNGKey(0) weights, CPU fp32).

    The embedder is the codec's own encoder (metrics.make_codec_embed_fn) —
    the self-contained stand-in for VGGish/PaSST (MODEL_CARD.md:31-37).
    """
    from audiocraft_tpu.metrics import (FrechetAudioDistance,
                                        kl_divergence_metric,
                                        make_codec_embed_fn,
                                        make_codec_prob_fn)
    import jax.numpy as jnp
    model, params = codec_and_params
    x = _assets_mono()
    embed = make_codec_embed_fn(model, params)
    prob = make_codec_prob_fn(model, params)

    codes, scale = model.encode(params, jnp.asarray(x))
    recon = np.asarray(model.decode(params, codes, scale))[..., :x.shape[-1]]

    fad = FrechetAudioDistance(embed, 32000)
    fad.add(reference=x, generated=recon)
    value = fad.compute()
    # pinned 2026-08: 0.0031762 (debug codec, 2x8s assets, 1s windows)
    assert value == pytest.approx(0.00317624, rel=5e-2), value

    # identical sets -> ~0 (sanity floor)
    self_fad = FrechetAudioDistance(embed, 32000)
    self_fad.add(reference=x, generated=x)
    assert abs(self_fad.compute()) < 1e-6

    # roundtrip re-encodes to the same tokens for this codec -> KLD == 0.
    # (A *random-init* debug codec collapses codebook-0 to one token, so
    # cross-clip separation needs trained weights; the protocol's
    # separation behavior is covered by the synthetic-histogram tests.)
    p_ref, p_gen = prob(x, 32000), prob(recon, 32000)
    assert p_ref.shape == (2, model.cardinality)
    assert np.allclose(p_ref.sum(axis=1), 1.0)
    kld = kl_divergence_metric(p_ref, p_gen)
    assert kld['kld'] == pytest.approx(0.0, abs=1e-9)


def test_eval_codec_cli_fad(tmp_path):
    """`apps.eval_codec --fad` works offline end-to-end (VERDICT r3 #2
    done-criterion) and reports finite codec-FAD/KLD numbers."""
    from audiocraft_tpu.apps.eval_codec import main
    out = tmp_path / 'metrics.json'
    m = main(['--synthetic', '--batches', '2', '--batch', '2',
              '--segment', '1.0', '--fad', '--json', str(out)])
    assert np.isfinite(m['fad_codec'])
    assert np.isfinite(m['kld_codec'])
    assert out.exists()
