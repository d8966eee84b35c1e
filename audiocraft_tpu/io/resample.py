"""Sinc-based sample-rate conversion, math-compatible with julius.ResampleFrac
(the resampler the reference uses via ``convert_audio``,
/root/reference/audiocraft/data/audio_utils.py:49-55).

The kernel bank is built host-side in numpy exactly as julius does (windowed
sinc, ``zeros=24`` taps, cutoff at the lower Nyquist), then applied as one
strided conv — which XLA maps straight onto the MXU.  Resampling must be
math-identical to julius for token parity on resampled inputs.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(32)
def _kernels(old_sr: int, new_sr: int, zeros: int = 24, rolloff: float = 0.945
             ) -> np.ndarray:
    """[new_sr, 1, kernel_width] filter bank (julius.resample.ResampleFrac)."""
    gcd = math.gcd(old_sr, new_sr)
    old_sr //= gcd
    new_sr //= gcd
    sr = min(new_sr, old_sr) * rolloff
    width = math.ceil(zeros * old_sr / sr)
    idx = np.arange(-width, width + old_sr, dtype=np.float64)
    kernels = []
    for i in range(new_sr):
        t = (-i / new_sr + idx / old_sr) * sr
        t = np.clip(t, -zeros, zeros)
        window = np.cos(t / zeros / 2 * np.pi) ** 2
        kernel = np.sinc(t) * window
        kernels.append(kernel)
    scale = sr / old_sr
    return (np.stack(kernels) * scale)[:, None, :].astype(np.float32)


def resample_frac(x: jax.Array, old_sr: int, new_sr: int, zeros: int = 24,
                  rolloff: float = 0.945) -> jax.Array:
    """Resample the last axis of ``x`` from old_sr to new_sr (julius math)."""
    if old_sr == new_sr:
        return x
    gcd = math.gcd(old_sr, new_sr)
    old_sr_r = old_sr // gcd
    new_sr_r = new_sr // gcd
    length = x.shape[-1]
    shape = x.shape[:-1]
    x2 = x.reshape(-1, 1, length)
    kernels = jnp.asarray(_kernels(old_sr, new_sr, zeros, rolloff))
    width = (kernels.shape[-1] - old_sr_r) // 2
    x2 = jnp.pad(x2, ((0, 0), (0, 0), (width, width + old_sr_r)))
    dn = jax.lax.conv_dimension_numbers(x2.shape, kernels.shape,
                                        ('NCH', 'OIH', 'NCH'))
    ys = jax.lax.conv_general_dilated(
        x2, kernels, window_strides=(old_sr_r,), padding=((0, 0),),
        dimension_numbers=dn)  # [N, new_sr_r, frames]
    y = jnp.transpose(ys, (0, 2, 1)).reshape(x2.shape[0], -1)
    target_length = int(math.ceil(new_sr_r * length / old_sr_r))
    return y[..., :target_length].reshape(*shape, target_length)
