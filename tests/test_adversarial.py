"""Adversarial codec training stack: MS-STFT discriminator, hinge losses,
feature matching, gradient balancer, and the full GAN train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from audiocraft_tpu.adversarial import (MultiScaleSTFTDiscriminator,
                                        STFTDiscriminator,
                                        feature_matching_loss, hinge_d_loss,
                                        hinge_g_loss)
from audiocraft_tpu.losses import (Balancer, MultiScaleMelSpectrogramLoss,
                                   balanced_cotangent, mel_filterbank,
                                   mel_spectrogram, sisnr, stft)


def test_stft_matches_torch():
    """Our jnp stft == torch.stft (hann, center, normalized) — the
    discriminator's front end must see the same spectrogram."""
    import torch
    x = np.random.RandomState(0).randn(2, 1, 2048).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), 512, 128, 512))
    ref = torch.stft(torch.from_numpy(x).view(2, 2048), n_fft=512,
                     hop_length=128, win_length=512,
                     window=torch.hann_window(512), center=True,
                     normalized=True, return_complex=True).numpy()
    np.testing.assert_allclose(ours.reshape(ref.shape), ref, atol=2e-5)


def test_mel_filterbank_and_spectrogram():
    """Filterbank: HTK triangles peaking (=1) at mel-spaced centers;
    spectrogram: mel of a pure tone concentrates at the tone's mel bin
    (torchaudio is absent here — verify against the mel-scale math)."""
    sr, n_fft, n_mels = 16000, 512, 64
    fb = mel_filterbank(sr, n_fft, n_mels)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert (fb >= 0).all() and fb.max() <= 1.0 + 1e-6
    # centers are mel-equidistant: hz->mel of per-row argmax is ~linear
    centers_hz = np.linspace(0, sr / 2, n_fft // 2 + 1)[fb.argmax(axis=1)]
    mel = 2595.0 * np.log10(1.0 + centers_hz / 700.0)
    gaps = np.diff(mel)
    assert gaps.std() / gaps.mean() < 0.2  # quantized to bins, so not exact

    # a 1 kHz tone lands in the filter whose center is nearest 1 kHz
    t = np.arange(8000) / sr
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None, None]
    m = np.asarray(mel_spectrogram(jnp.asarray(tone), sr, n_fft, 128,
                                   n_mels))
    hot = m.mean(axis=-1).ravel().argmax()
    expect = np.abs(centers_hz - 1000).argmin()
    assert abs(int(hot) - int(expect)) <= 1


def test_discriminator_shapes_and_features():
    disc = STFTDiscriminator(n_fft=256, hop_length=64, filters=8)
    params = disc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 1, 4000).astype(np.float32))
    logits, feats = disc(params, x)
    assert logits.shape[0] == 2 and logits.shape[1] == 1
    assert len(feats) == len(disc.dilations) + 2
    # time axis downsampled by stride (1,2) per dilated conv
    assert feats[-1].shape[-1] < feats[0].shape[-1]

    ms = MultiScaleSTFTDiscriminator(filters=8, n_ffts=(256, 128),
                                     hop_lengths=(64, 32),
                                     win_lengths=(256, 128))
    mp = ms.init(jax.random.PRNGKey(1))
    all_logits, all_feats = ms(mp, x)
    assert len(all_logits) == 2 and len(all_feats) == 2


def test_hinge_and_feature_losses():
    real = [jnp.full((1, 1, 4, 4), 2.0)]
    fake = [jnp.full((1, 1, 4, 4), -2.0)]
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_g_loss(fake)) == 2.0
    feats_a = [[jnp.ones((1, 2, 3, 3))]]
    feats_b = [[jnp.ones((1, 2, 3, 3))]]
    assert float(feature_matching_loss(feats_a, feats_b)) == 0.0


def test_balancer_equalizes_shares():
    """Two losses with wildly different gradient scales: the balanced
    cotangent must contribute per-loss norms proportional to the weights."""
    recon = jnp.asarray(np.random.RandomState(0)
                        .randn(8, 16).astype(np.float32))
    tgt = jnp.zeros_like(recon)
    loss_fns = {
        'big': lambda r: 1e4 * jnp.mean((r - tgt) ** 2),
        'small': lambda r: 1e-4 * jnp.mean(jnp.abs(r - tgt)),
    }
    bal = Balancer(weights={'big': 1.0, 'small': 1.0}, ema_decay=0.0)
    state = bal.init_state()
    cot, state, metrics = balanced_cotangent(bal, recon, loss_fns, state)
    # each loss's scaled contribution should have norm ~= 0.5 (share of
    # rescale_total=1) despite the 1e8 raw-scale gap
    g_big = jax.grad(loss_fns['big'])(recon)
    contrib_big = g_big * (0.5 / (metrics['big_norm'] + 1e-12))
    assert abs(float(jnp.linalg.norm(contrib_big.ravel())) - 0.5) < 1e-4
    assert np.isfinite(np.asarray(cot)).all()
    assert float(jnp.linalg.norm(cot.ravel())) == pytest.approx(
        1.0, rel=0.5)  # two roughly-independent 0.5-norm contributions


def test_balancer_grouped_matches_ungrouped():
    """grouped_fns (shared-forward vjp) must be mathematically identical to
    listing the same losses individually in loss_fns."""
    recon = jnp.asarray(np.random.RandomState(1)
                        .randn(4, 32).astype(np.float32))
    tgt = jnp.asarray(np.random.RandomState(2)
                      .randn(4, 32).astype(np.float32))

    def shared(r):
        h = jnp.tanh(r @ r.T)  # "expensive" shared forward
        return {'a': jnp.mean(h ** 2), 'b': jnp.mean(jnp.abs(h - 1.0))}

    fns = {'l1': lambda r: jnp.mean(jnp.abs(r - tgt)),
           'a': lambda r: shared(r)['a'],
           'b': lambda r: shared(r)['b']}
    bal = Balancer(weights={'l1': 1.0, 'a': 2.0, 'b': 0.5})
    cot_u, st_u, m_u = balanced_cotangent(bal, recon, fns, bal.init_state())
    cot_g, st_g, m_g = balanced_cotangent(
        bal, recon, {'l1': fns['l1']}, bal.init_state(),
        grouped_fns=(shared,))
    np.testing.assert_allclose(np.asarray(cot_u), np.asarray(cot_g),
                               rtol=1e-6, atol=1e-7)
    for k in m_u:
        np.testing.assert_allclose(float(m_u[k]), float(m_g[k]), rtol=1e-6)
    for k in st_u:
        np.testing.assert_allclose(float(st_u[k]), float(st_g[k]), rtol=1e-6)


def test_sisnr_and_msspec_basics():
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(2, 1, 4096).astype(np.float32))
    assert float(sisnr(x, x)) < -50  # perfect estimate: very negative loss
    loss = MultiScaleMelSpectrogramLoss(sample_rate=16000, range_start=6,
                                        range_end=8)
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-5)
    y = x + 0.1 * jnp.asarray(np.random.RandomState(3)
                              .randn(2, 1, 4096).astype(np.float32))
    assert float(loss(x, y)) > 0.01


def test_gan_train_step_runs_and_improves():
    """Full GAN step on the debug codec: finite losses, all four param/state
    groups update, and the reconstruction improves over a few steps."""
    from audiocraft_tpu.builders import (get_debug_compression_model,
                                         init_debug_compression_model)
    from audiocraft_tpu.dist.train import make_encodec_gan_train_step
    from audiocraft_tpu.losses import Balancer

    model = get_debug_compression_model(32000)
    params = init_debug_compression_model(model, jax.random.PRNGKey(0))
    ema = params.pop('quantizer')
    disc = MultiScaleSTFTDiscriminator(filters=4, n_ffts=(256, 128),
                                       hop_lengths=(64, 32),
                                       win_lengths=(256, 128))
    d_params = disc.init(jax.random.PRNGKey(1))
    g_opt, d_opt = optax.adam(1e-3), optax.adam(1e-3)
    bal = Balancer(weights={'l1': 0.1, 'l2': 1.0, 'msspec': 3.0,
                            'adv': 4.0, 'feat': 4.0})
    step = jax.jit(make_encodec_gan_train_step(model, disc, g_opt, d_opt,
                                               balancer=bal))
    # a structured (sine) signal so reconstruction loss can actually fall
    t = np.arange(8000) / 32000
    x = jnp.asarray((0.5 * np.sin(2 * np.pi * 440 * t))
                    .astype(np.float32))[None, None].repeat(2, 0)

    gp, es, gs = params, ema, g_opt.init(params)
    dp, ds = d_params, d_opt.init(d_params)
    bs = bal.init_state()
    l1_hist = []
    for i in range(6):
        gp, es, gs, dp, ds, bs, metrics = step(gp, es, gs, dp, ds, bs, x,
                                               jax.random.PRNGKey(i))
        l1_hist.append(float(metrics['l1']))
        for v in metrics.values():
            assert np.isfinite(float(v)), metrics
    assert l1_hist[-1] < l1_hist[0]
    # discriminator actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         d_params, dp)
    assert max(jax.tree.leaves(moved)) > 0
