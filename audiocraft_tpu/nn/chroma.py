"""Chroma feature extraction in JAX — melody conditioning front-end.

Counterpart of ``/root/reference/audiocraft/modules/chroma.py`` (ChromaExtractor):
STFT power spectrogram -> chroma filterbank projection -> inf-norm normalize ->
optional argmax one-hot.  The reference uses torchaudio's Spectrogram
(center=True reflect pad, window-normalized) and librosa's chroma filterbank
(``librosa.filters.chroma(sr, n_fft, tuning=0)``); neither library exists
here, so both are reimplemented from their published math:

* STFT: hann window of ``winlen`` zero-padded centrally to ``nfft``, reflect
  center padding, rFFT, power 2, divided by ``sum(window^2)`` (torchaudio
  ``normalized=True`` semantics).
* Chroma filterbank: gaussian bumps in log-frequency (octave) space wrapped to
  ``n_chroma`` pitch classes, L2-normalized per FFT bin, gaussian octave
  weighting centered at ``ctroct``, rolled so bin 0 = C (librosa
  ``base_c=True``).
"""

from __future__ import annotations

import dataclasses
import typing as tp
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(8)
def chroma_filterbank(sr: int, n_fft: int, n_chroma: int = 12,
                      tuning: float = 0.0, ctroct: float = 5.0,
                      octwidth: float = 2.0, base_c: bool = True) -> np.ndarray:
    """[n_chroma, 1 + n_fft//2] chroma filterbank (librosa.filters.chroma math)."""
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    a440 = 440.0 * 2.0 ** (tuning / n_chroma)
    frqbins = n_chroma * np.log2(frequencies / (a440 / 16))
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate(
        (np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]))
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype='d')).T
    n_chroma2 = np.round(float(n_chroma) / 2)
    D = np.remainder(D + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    # L2-normalize each column (FFT bin) across chroma bins
    norms = np.sqrt(np.sum(wts ** 2, axis=0, keepdims=True))
    norms[norms == 0] = 1.0
    wts = wts / norms
    if octwidth is not None:
        wts *= np.tile(
            np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)),
            (n_chroma, 1))
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, : int(1 + n_fft / 2)], dtype=np.float32)


def stft_power(wav: jax.Array, nfft: int, winlen: int, winhop: int,
               normalized: bool = True) -> jax.Array:
    """[..., T] -> power spectrogram [..., 1 + nfft//2, frames].

    torchaudio.Spectrogram semantics: center=True reflect padding, periodic
    hann window of winlen centrally zero-padded to nfft.
    """
    window = jnp.asarray(np.hanning(winlen + 1)[:-1].astype(np.float32))
    if winlen < nfft:
        left = (nfft - winlen) // 2
        window = jnp.pad(window, (left, nfft - winlen - left))
    pad = nfft // 2
    x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode='reflect')
    T = x.shape[-1]
    n_frames = 1 + (T - nfft) // winhop
    idx = (jnp.arange(n_frames)[:, None] * winhop
           + jnp.arange(nfft)[None, :])  # [frames, nfft]
    frames = x[..., idx] * window  # [..., frames, nfft]
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(jnp.abs(spec))
    if normalized:
        power = power / jnp.sum(jnp.square(window))
    return jnp.swapaxes(power, -1, -2)  # [..., freq, frames]


@dataclasses.dataclass(frozen=True)
class ChromaExtractor:
    sample_rate: int
    n_chroma: int = 12
    radix2_exp: int = 12
    nfft: tp.Optional[int] = None
    winlen: tp.Optional[int] = None
    winhop: tp.Optional[int] = None
    argmax: bool = False
    norm: float = np.inf

    @property
    def _winlen(self) -> int:
        return self.winlen or 2 ** self.radix2_exp

    @property
    def _nfft(self) -> int:
        return self.nfft or self._winlen

    @property
    def _winhop(self) -> int:
        return self.winhop or self._winlen // 4

    def __call__(self, wav: jax.Array) -> jax.Array:
        """wav: [B, C, T] or [B, T] -> chroma [B, frames, n_chroma]."""
        T = wav.shape[-1]
        nfft = self._nfft
        if T < nfft:  # nullified/short conds get padded (reference :50-54)
            pad = nfft - T
            r = 0 if pad % 2 == 0 else 1
            cfg = [(0, 0)] * (wav.ndim - 1) + [(pad // 2, pad // 2 + r)]
            wav = jnp.pad(wav, cfg)
        spec = stft_power(wav, nfft, self._winlen, self._winhop)
        if spec.ndim == 4:  # [B, C, F, T'] -> mono squeeze like reference
            spec = spec[:, 0] if spec.shape[1] == 1 else jnp.mean(spec, axis=1)
        fbanks = jnp.asarray(chroma_filterbank(self.sample_rate, nfft,
                                               self.n_chroma))
        raw = jnp.einsum('cf,bft->bct', fbanks, spec)
        # p=inf normalize over the chroma axis (reference :63)
        denom = jnp.maximum(jnp.max(jnp.abs(raw), axis=-2, keepdims=True), 1e-6)
        norm_chroma = raw / denom
        norm_chroma = jnp.swapaxes(norm_chroma, -1, -2)  # [B, T', C]
        if self.argmax:
            idx = jnp.argmax(norm_chroma, axis=-1)
            norm_chroma = jax.nn.one_hot(idx, self.n_chroma,
                                         dtype=norm_chroma.dtype)
        return norm_chroma
