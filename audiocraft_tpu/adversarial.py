"""Adversarial training for the codec: multi-scale STFT discriminator,
hinge losses, and feature matching.

The reference fork stripped the upstream ``audiocraft/adversarial`` package
(SURVEY.md ground facts); this rebuilds its role TPU-first.  The MS-STFT
discriminator is the EnCodec paper's adversary: per STFT scale, a 2-D conv
stack over the complex spectrogram viewed as (real, imag) channels, with
frequency-dilated convs and time-strided downsampling.  Everything is a
frozen-dataclass module over plain param dicts, like the rest of ``nn/``;
XLA maps the 2-D convs straight onto the MXU (channel counts are 32+ from
layer 1, the shapes the perf study showed XLA handles at 46-100 % of peak).

Losses are the hinge pair (D: relu(1-real) + relu(1+fake); G: -mean(fake))
plus L1 feature matching over the intermediate activations, normalized per
layer by the reference-feature magnitude.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp

from .losses import stft

__all__ = ['STFTDiscriminator', 'MultiScaleSTFTDiscriminator',
           'hinge_d_loss', 'hinge_g_loss', 'feature_matching_loss']


def _conv2d(x: jax.Array, w: jax.Array, b: tp.Optional[jax.Array],
            stride: tp.Tuple[int, int] = (1, 1),
            dilation: tp.Tuple[int, int] = (1, 1)) -> jax.Array:
    """NCHW conv with torch-style 'same-ish' symmetric padding
    (((k-1)*d)//2 per side)."""
    pads = tuple((((k - 1) * d) // 2, ((k - 1) * d + 1) // 2)
                 for k, d in zip(w.shape[2:], dilation))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pads,
        rhs_dilation=dilation,
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    if b is not None:
        y = y + b[None, :, None, None]
    return y


@dataclasses.dataclass(frozen=True)
class STFTDiscriminator:
    """One STFT-scale discriminator: complex spectrogram -> logit map.

    Returns ``(logits, features)`` where ``features`` are the activations
    after every conv (for feature matching).
    """
    n_fft: int = 1024
    hop_length: int = 256
    win_length: tp.Optional[int] = None
    filters: int = 32
    in_channels: int = 1
    out_channels: int = 1
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: tp.Tuple[int, int] = (3, 9)
    dilations: tp.Tuple[int, ...] = (1, 2, 4)
    stride: tp.Tuple[int, int] = (1, 2)
    negative_slope: float = 0.2

    def _channels(self) -> tp.List[tp.Tuple[int, int]]:
        """(in, out) channel pairs for every conv in order."""
        chans = [(2 * self.in_channels, self.filters)]
        in_chs = self.filters
        for i in range(len(self.dilations)):
            out_chs = min(self.filters * self.filters_scale ** (i + 1),
                          self.max_filters)
            chans.append((in_chs, out_chs))
            in_chs = out_chs
        out_chs = min(self.filters
                      * self.filters_scale ** (len(self.dilations) + 1),
                      self.max_filters)
        chans.append((in_chs, out_chs))          # square pre-post conv
        chans.append((out_chs, self.out_channels))  # conv_post
        return chans

    def _kernels(self) -> tp.List[tp.Tuple[int, int]]:
        kh, kw = self.kernel_size
        n = len(self.dilations)
        return [(kh, kw)] * (n + 1) + [(kh, kh), (kh, kh)]

    def init(self, key: jax.Array) -> dict:
        params = {}
        chans, kernels = self._channels(), self._kernels()
        keys = jax.random.split(key, len(chans))
        for i, ((cin, cout), (kh, kw)) in enumerate(zip(chans, kernels)):
            fan_in = cin * kh * kw
            bound = 1.0 / math.sqrt(fan_in)
            k1, k2 = jax.random.split(keys[i])
            params[f'conv{i}'] = {
                'weight': jax.random.uniform(k1, (cout, cin, kh, kw),
                                             minval=-bound, maxval=bound),
                'bias': jax.random.uniform(k2, (cout,),
                                           minval=-bound, maxval=bound),
            }
        return params

    def __call__(self, params: dict, x: jax.Array
                 ) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        assert x.ndim == 3  # [B, C, T]
        spec = stft(x, self.n_fft, self.hop_length,
                    self.win_length or self.n_fft)      # [B, C, F, T']
        z = jnp.concatenate([spec.real, spec.imag], axis=1)  # [B, 2C, F, T']
        feats = []
        n_dil = len(self.dilations)
        for i in range(n_dil + 2):
            p = params[f'conv{i}']
            if i == 0:
                z = _conv2d(z, p['weight'], p['bias'])
            elif i <= n_dil:
                z = _conv2d(z, p['weight'], p['bias'], stride=self.stride,
                            dilation=(self.dilations[i - 1], 1))
            else:
                z = _conv2d(z, p['weight'], p['bias'])
            z = jax.nn.leaky_relu(z, self.negative_slope)
            feats.append(z)
        post = params[f'conv{n_dil + 2}']
        logits = _conv2d(z, post['weight'], post['bias'])
        return logits, feats


@dataclasses.dataclass(frozen=True)
class MultiScaleSTFTDiscriminator:
    """EnCodec's MS-STFT adversary: one STFTDiscriminator per scale."""
    filters: int = 32
    in_channels: int = 1
    n_ffts: tp.Tuple[int, ...] = (1024, 2048, 512)
    hop_lengths: tp.Tuple[int, ...] = (256, 512, 128)
    win_lengths: tp.Tuple[int, ...] = (1024, 2048, 512)

    def _subs(self) -> tp.List[STFTDiscriminator]:
        return [STFTDiscriminator(n_fft=n, hop_length=h, win_length=w,
                                  filters=self.filters,
                                  in_channels=self.in_channels)
                for n, h, w in zip(self.n_ffts, self.hop_lengths,
                                   self.win_lengths)]

    def init(self, key: jax.Array) -> dict:
        subs = self._subs()
        keys = jax.random.split(key, len(subs))
        return {f'scale{i}': s.init(k)
                for i, (s, k) in enumerate(zip(subs, keys))}

    def __call__(self, params: dict, x: jax.Array
                 ) -> tp.Tuple[tp.List[jax.Array],
                               tp.List[tp.List[jax.Array]]]:
        logits, feats = [], []
        for i, sub in enumerate(self._subs()):
            lg, ft = sub(params[f'scale{i}'], x)
            logits.append(lg)
            feats.append(ft)
        return logits, feats


# --------------------------------------------------------------------- losses

def hinge_d_loss(real_logits: tp.List[jax.Array],
                 fake_logits: tp.List[jax.Array]) -> jax.Array:
    """Discriminator hinge loss, averaged over scales."""
    total = jnp.zeros(())
    for lr, lf in zip(real_logits, fake_logits):
        total = total + jnp.mean(jax.nn.relu(1.0 - lr)) \
            + jnp.mean(jax.nn.relu(1.0 + lf))
    return total / len(real_logits)


def hinge_g_loss(fake_logits: tp.List[jax.Array]) -> jax.Array:
    """Generator hinge loss, averaged over scales."""
    total = jnp.zeros(())
    for lf in fake_logits:
        total = total - jnp.mean(lf)
    return total / len(fake_logits)


def feature_matching_loss(real_feats: tp.List[tp.List[jax.Array]],
                          fake_feats: tp.List[tp.List[jax.Array]],
                          eps: float = 1e-8) -> jax.Array:
    """L1 between D activations on real vs fake, normalized per layer by the
    real-feature magnitude, averaged over layers and scales."""
    total = jnp.zeros(())
    n = 0
    for rs, fs in zip(real_feats, fake_feats):
        for r, f in zip(rs, fs):
            total = total + jnp.mean(jnp.abs(r - f)) \
                / (jnp.mean(jnp.abs(r)) + eps)
            n += 1
    return total / max(n, 1)
