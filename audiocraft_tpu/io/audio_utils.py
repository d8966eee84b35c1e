"""Audio utility ops: channel conversion, resampling, normalization, fades.

Functional counterparts of ``/root/reference/audiocraft/data/audio_utils.py``:
* ``convert_audio_channels`` (:16-46) — mono downmix / channel duplication.
* ``convert_audio`` (:49-55) — channels + julius-math resample.
* ``normalize_loudness`` (:58-89) — ITU-R BS.1770 loudness normalization.
* peak / rms / clip normalize (:92-146).
* ``f32_pcm`` / ``i16_pcm`` (:149-177).
* fork fades ``apply_tafade`` / ``apply_fade`` (:179-296) used by the
  segment-stitch extension.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .resample import resample_frac


def convert_audio_channels(wav: jax.Array, channels: int = 2) -> jax.Array:
    """[..., C, T] -> [..., channels, T] (reference audio_utils.py:16-46)."""
    *shape, src_channels, length = wav.shape
    if src_channels == channels:
        return wav
    if channels == 1:
        return jnp.mean(wav, axis=-2, keepdims=True)
    if src_channels == 1:
        return jnp.broadcast_to(wav, (*shape, channels, length))
    if src_channels >= channels:
        return wav[..., :channels, :]
    raise ValueError('The audio file has less channels than requested but is '
                     'not mono.')


def convert_audio(wav: jax.Array, from_rate: int, to_rate: int,
                  to_channels: int) -> jax.Array:
    wav = resample_frac(wav, int(from_rate), int(to_rate))
    return convert_audio_channels(wav, to_channels)


def normalize_loudness(wav: jax.Array, sample_rate: int,
                       loudness_headroom_db: float = 14.0,
                       loudness_compressor: bool = False,
                       energy_floor: float = 2e-3) -> jax.Array:
    """ITU-R BS.1770-style loudness normalize (reference audio_utils.py:58-89).

    Simplified K-weighting: 2-stage biquad (shelf + highpass) applied via
    scipy-free direct form on host is avoided — we implement the filters as
    explicit IIR with lax.scan for full device residency.
    """
    energy = jnp.sqrt(jnp.mean(jnp.square(wav)))
    loudness = _bs1770_loudness(wav, sample_rate)
    volume = 10 ** ((-loudness_headroom_db - loudness) / 20)
    out = wav * volume
    if loudness_compressor:
        out = jnp.tanh(out)
    return jnp.where(energy < energy_floor, wav, out)


def _biquad(x: jax.Array, b: np.ndarray, a: np.ndarray) -> jax.Array:
    """Direct-form II transposed biquad over the last axis via lax.scan."""
    b0, b1, b2 = [jnp.float32(v) for v in b]
    a1, a2 = [jnp.float32(v) for v in a[1:]]

    def step(carry, xt):
        z1, z2 = carry
        yt = b0 * xt + z1
        z1 = b1 * xt - a1 * yt + z2
        z2 = b2 * xt - a2 * yt
        return (z1, z2), yt

    flat = x.reshape(-1, x.shape[-1])
    zeros = jnp.zeros(flat.shape[0], x.dtype)
    _, y = jax.lax.scan(step, (zeros, zeros), flat.T)
    return y.T.reshape(x.shape)


def _kweighting_coeffs(sr: int):
    """High-shelf + high-pass biquads per ITU-R BS.1770-4."""
    # pre-filter (high shelf)
    f0, G, Q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
    K = np.tan(np.pi * f0 / sr)
    Vh = 10 ** (G / 20.0)
    Vb = Vh ** 0.4996667741545416
    denom = 1 + K / Q + K * K
    b_shelf = np.array([(Vh + Vb * K / Q + K * K) / denom,
                        2 * (K * K - Vh) / denom,
                        (Vh - Vb * K / Q + K * K) / denom])
    a_shelf = np.array([1.0, 2 * (K * K - 1) / denom,
                        (1 - K / Q + K * K) / denom])
    # RLB high-pass
    f0, Q = 38.13547087602444, 0.5003270373238773
    K = np.tan(np.pi * f0 / sr)
    denom = 1 + K / Q + K * K
    b_hp = np.array([1.0, -2.0, 1.0])
    a_hp = np.array([1.0, 2 * (K * K - 1) / denom, (1 - K / Q + K * K) / denom])
    b_hp = b_hp / denom * 1.0
    return (b_shelf, a_shelf), (b_hp * denom / denom, a_hp)


def _bs1770_loudness(wav: jax.Array, sr: int) -> jax.Array:
    (bs, as_), (bh, ah) = _kweighting_coeffs(sr)
    y = _biquad(wav, bs, as_)
    y = _biquad(y, bh, ah)
    power = jnp.mean(jnp.square(y))
    return -0.691 + 10 * jnp.log10(power + 1e-12)


def normalize_audio(wav: jax.Array, normalize: bool = True,
                    strategy: str = 'peak', peak_clip_headroom_db: float = 1.0,
                    rms_headroom_db: float = 18.0, loudness_headroom_db: float = 14.0,
                    loudness_compressor: bool = False,
                    sample_rate: tp.Optional[int] = None) -> jax.Array:
    """Normalize per strategy (reference audio_utils.py:92-146)."""
    scale_peak = 10 ** (-peak_clip_headroom_db / 20)
    scale_rms = 10 ** (-rms_headroom_db / 20)
    if strategy == 'peak':
        rescaling = scale_peak / jnp.maximum(jnp.max(jnp.abs(wav)), 1e-12)
        if normalize:
            wav = wav * rescaling
    elif strategy == 'clip':
        wav = jnp.clip(wav, -scale_peak, scale_peak)
    elif strategy == 'rms':
        mono = jnp.mean(wav, axis=0, keepdims=True) if wav.ndim > 1 else wav
        rescaling = scale_rms / jnp.maximum(
            jnp.sqrt(jnp.mean(jnp.square(mono))), 1e-12)
        if normalize:
            wav = wav * rescaling
        wav = jnp.clip(wav, -1.0, 1.0)
    elif strategy == 'loudness':
        assert sample_rate is not None
        wav = normalize_loudness(wav, sample_rate, loudness_headroom_db,
                                 loudness_compressor)
        wav = jnp.clip(wav, -1.0, 1.0)
    elif strategy in ('', 'none', None):
        pass
    else:
        raise ValueError(f"unknown strategy {strategy}")
    return wav


def f32_pcm(wav: np.ndarray) -> np.ndarray:
    if wav.dtype.kind == 'f':
        return wav.astype(np.float32)
    assert wav.dtype == np.int16 or wav.dtype == np.int32
    bits = 15 if wav.dtype == np.int16 else 31
    return (wav.astype(np.float32) / (2 ** bits))


def i16_pcm(wav: np.ndarray) -> np.ndarray:
    if wav.dtype.kind == 'i':
        return wav.astype(np.int16)
    assert wav.dtype.kind == 'f'
    return np.clip(wav * (2 ** 15), -2 ** 15, 2 ** 15 - 1).astype(np.int16)


# ---------------------------------------------------------------- fork fades

def apply_tafade(audio: jax.Array, sample_rate: int, duration: float = 3.0,
                 out: bool = True, start: bool = True,
                 shape: str = 'linear') -> jax.Array:
    """Time-aligned fade over the first/last `duration` seconds
    (reference audio_utils.py:179-240, torchaudio.transforms.Fade shapes)."""
    length = audio.shape[-1]
    fade_samples = min(int(sample_rate * duration), length)
    t = jnp.linspace(0.0, 1.0, fade_samples)
    if shape == 'linear':
        curve = t
    elif shape == 'exponential':
        curve = jnp.power(2.0, (t - 1)) * t
    elif shape == 'logarithmic':
        curve = jnp.sqrt(t)
    elif shape == 'quarter_sine':
        curve = jnp.sin(t * jnp.pi / 2)
    elif shape == 'half_sine':
        curve = jnp.sin(t * jnp.pi - jnp.pi / 2) / 2 + 0.5
    else:
        raise ValueError(f"unknown fade shape {shape}")
    if out:
        curve = curve[::-1]
    ramp = jnp.ones(length).at[
        (slice(0, fade_samples) if start else slice(length - fade_samples, length))
    ].set(curve)
    return audio * ramp


def apply_fade(audio: jax.Array, sample_rate: int, duration: float = 3.0,
               out: bool = True, start: bool = True,
               curve_start: float = 0.0, curve_end: float = 1.0,
               current_device: tp.Any = None) -> jax.Array:
    """Linear fade between arbitrary gain endpoints (reference :243-296)."""
    length = audio.shape[-1]
    fade_samples = min(int(sample_rate * duration), length)
    curve = jnp.linspace(curve_start, curve_end, fade_samples)
    if out:
        curve = curve[::-1]
    ramp = jnp.ones(length).at[
        (slice(0, fade_samples) if start else slice(length - fade_samples, length))
    ].set(curve)
    return audio * ramp
