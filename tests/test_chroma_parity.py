"""Chroma filterbank + STFT parity pins.

librosa itself is absent from this environment, so the reference
`librosa.filters.chroma` (used by /root/reference/audiocraft/modules/chroma.py:40)
cannot be run directly.  Instead:

* `_librosa_chroma_scalar` is an independent, deliberately *unvectorized*
  transcription of librosa's published algorithm (hz_to_octs -> gaussian
  bumps -> per-bin L2 normalize -> octave weighting -> base-C roll), compared
  element-for-element against our vectorized `chroma_filterbank`.
* The STFT half is compared against live `torch.stft` with torchaudio
  `Spectrogram(power=2, center=True, normalized=True)` semantics (the exact
  transform the reference uses, chroma.py:43-45).
* Tempered-tone pitch-class behavior pins the end-to-end extractor.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from audiocraft_tpu.nn.chroma import ChromaExtractor, chroma_filterbank, stft_power


def _librosa_chroma_scalar(sr, n_fft, n_chroma=12, tuning=0.0, ctroct=5.0,
                           octwidth=2.0, base_c=True):
    """Unvectorized librosa.filters.chroma: per-element loops, no numpy
    broadcasting, so a transcription slip in either version shows up."""
    # fft bin center frequencies over the FULL fft (librosa slices later)
    freqs = [sr * k / n_fft for k in range(1, n_fft)]
    a440 = 440.0 * 2.0 ** (tuning / n_chroma)
    frqbins = [n_chroma * math.log2(f / (a440 / 16)) for f in freqs]
    frqbins = [frqbins[0] - 1.5 * n_chroma] + frqbins          # DC placeholder
    binwidth = [max(frqbins[i + 1] - frqbins[i], 1.0)
                for i in range(len(frqbins) - 1)] + [1.0]
    n2 = round(n_chroma / 2.0)
    wts = np.zeros((n_chroma, n_fft))
    for c in range(n_chroma):
        for k in range(n_fft):
            d = ((frqbins[k] - c) + n2 + 10 * n_chroma) % n_chroma - n2
            wts[c, k] = math.exp(-0.5 * (2 * d / binwidth[k]) ** 2)
    for k in range(n_fft):                                      # column L2
        nrm = math.sqrt(sum(wts[c, k] ** 2 for c in range(n_chroma)))
        if nrm > 0:
            for c in range(n_chroma):
                wts[c, k] /= nrm
    if octwidth is not None:
        for k in range(n_fft):
            w = math.exp(-0.5 * (((frqbins[k] / n_chroma - ctroct)
                                  / octwidth) ** 2))
            for c in range(n_chroma):
                wts[c, k] *= w
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return wts[:, : int(1 + n_fft / 2)]


@pytest.mark.parametrize("sr,n_fft,n_chroma,tuning", [
    (22050, 512, 12, 0.0),
    (32000, 4096, 12, 0.0),      # the melody-model config (radix2_exp=12)
    (16000, 1024, 24, 0.3),
])
def test_filterbank_matches_independent_transcription(sr, n_fft, n_chroma,
                                                      tuning):
    ours = chroma_filterbank(sr, n_fft, n_chroma, tuning=tuning)
    independent = _librosa_chroma_scalar(sr, n_fft, n_chroma, tuning=tuning)
    assert ours.shape == independent.shape == (n_chroma, 1 + n_fft // 2)
    np.testing.assert_allclose(ours, independent, rtol=1e-5, atol=1e-7)


def test_filterbank_structure():
    """Structural librosa invariants: pre-weighting columns are unit-L2 (the
    octave weight is a rank-1 multiplier), and base_c rolls A-bin 9 -> C 0."""
    fb = chroma_filterbank(22050, 512, 12)
    fb_no_oct = chroma_filterbank.__wrapped__(22050, 512, 12, octwidth=None)
    norms = np.sqrt((fb_no_oct ** 2).sum(axis=0))
    np.testing.assert_allclose(norms[1:], 1.0, atol=1e-6)
    # the octave weighting must be a per-column scalar: ratio constant
    ratio = fb[:, 10] / np.maximum(fb_no_oct[:, 10], 1e-20)
    assert np.ptp(ratio[fb_no_oct[:, 10] > 1e-12]) < 1e-5


def test_stft_matches_torch_spectrogram():
    """stft_power == torch.stft under torchaudio Spectrogram semantics
    (hann periodic window, center reflect pad, power 2, window-normalized)."""
    import torch
    sr, winlen, nfft, hop = 16000, 256, 512, 64
    wav = np.random.RandomState(5).randn(3, sr // 4).astype(np.float32)
    ours = np.asarray(stft_power(jnp.asarray(wav), nfft, winlen, hop))

    window = torch.hann_window(winlen, periodic=True)
    spec = torch.stft(torch.from_numpy(wav), n_fft=nfft, hop_length=hop,
                      win_length=winlen, window=window, center=True,
                      pad_mode='reflect', normalized=False,
                      onesided=True, return_complex=True)
    power = spec.abs().pow(2) / window.pow(2).sum()  # torchaudio normalized=True
    np.testing.assert_allclose(ours, power.numpy(), rtol=1e-4, atol=1e-5)


def test_extractor_pitch_classes_with_tuning():
    """Equal-tempered tones across octaves land on their pitch class."""
    sr = 32000
    ex = ChromaExtractor(sample_rate=sr, n_chroma=12, radix2_exp=12,
                         argmax=True)
    # C4, E4, G4, A4, C5, G2 -> classes 0, 4, 7, 9, 0, 7 (base C)
    midi = [60, 64, 67, 69, 72, 43]
    expect = [0, 4, 7, 9, 0, 7]
    t = np.arange(sr) / sr
    wavs = np.stack([np.sin(2 * np.pi * 440.0 * 2 ** ((m - 69) / 12) * t)
                     for m in midi]).astype(np.float32)
    chroma = np.asarray(ex(jnp.asarray(wavs)))
    classes = chroma.mean(axis=1).argmax(axis=-1)
    assert list(classes) == expect


def test_filterbank_matches_pinned_goldens():
    """Regression pin: the filterbank values are frozen in tests/goldens so
    any future change to the transcription is caught (librosa itself is not
    installable here to regenerate an independent oracle)."""
    import pathlib
    path = pathlib.Path(__file__).parent / "goldens" / "chroma_fbank.npz"
    if not path.exists():
        pytest.skip("goldens not generated")
    with np.load(path) as g:
        np.testing.assert_allclose(chroma_filterbank(32000, 4096, 12),
                                   g["fb_32k_4096_12"], atol=1e-7)
        np.testing.assert_allclose(
            chroma_filterbank(22050, 512, 12, tuning=0.25),
            g["fb_22050_512_12_t025"], atol=1e-7)
