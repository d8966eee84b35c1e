"""Streamable 1d convolutions with exact Audiocraft padding semantics.

TPU-first design notes
----------------------
* All shapes are static at trace time, so every padding amount is a Python int
  computed from the (static) input length — there is no dynamic-shape logic for
  XLA to choke on.
* Convolutions lower to ``lax.conv_general_dilated`` which XLA tiles onto the
  MXU; transposed convolutions are expressed as lhs-dilated convolutions with a
  flipped/transposed kernel (mathematically identical to torch's
  ``ConvTranspose1d`` with padding=0).
* Weight normalization is handled at checkpoint-import time (the effective
  weight ``g * v / ||v||`` is materialized); an optional reparameterized form is
  provided for training.

Behavioral parity with the reference implementation
(``/root/reference/audiocraft/modules/conv.py``):
* ``get_extra_padding_for_conv1d`` (conv.py:47-54): pad so the last conv window
  is full.
* ``pad1d`` (conv.py:72-89): reflect-pad with zero-extension when the input is
  shorter than the padding (small-input edge case).
* ``unpad1d`` (conv.py:92-98).
* ``StreamableConv1d.forward`` (conv.py:187-203): causal => all padding left;
  non-causal => asymmetric split with the *larger* half on the left.
* ``StreamableConvTranspose1d.forward`` (conv.py:227-245): trim ``k - s`` total
  padding from the output, split per ``trim_right_ratio`` (causal) or
  asymmetrically (non-causal).
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def get_extra_padding_for_conv1d(length: int, kernel_size: int, stride: int,
                                 padding_total: int = 0) -> int:
    """Extra right-padding so that the last conv window is full.

    Pure integer math on static lengths (cf. reference conv.py:47-54).
    """
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad1d(x: jax.Array, paddings: tp.Tuple[int, int], mode: str = 'constant',
          value: float = 0.) -> jax.Array:
    """Pad the last axis, supporting reflect padding on inputs shorter than the pad.

    When ``mode == 'reflect'`` and the signal is shorter than the largest pad,
    zeros are appended on the right before reflecting, and the extension is
    stripped afterwards (cf. reference conv.py:72-89).
    """
    length = x.shape[-1]
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    nd = x.ndim
    if mode == 'reflect':
        max_pad = max(padding_left, padding_right)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            cfg = [(0, 0)] * (nd - 1) + [(0, extra_pad)]
            x = jnp.pad(x, cfg)
        cfg = [(0, 0)] * (nd - 1) + [(padding_left, padding_right)]
        padded = jnp.pad(x, cfg, mode='reflect')
        end = padded.shape[-1] - extra_pad
        return padded[..., :end]
    cfg = [(0, 0)] * (nd - 1) + [(padding_left, padding_right)]
    return jnp.pad(x, cfg, mode='constant', constant_values=value)


def unpad1d(x: jax.Array, paddings: tp.Tuple[int, int]) -> jax.Array:
    padding_left, padding_right = paddings
    assert padding_left >= 0 and padding_right >= 0, (padding_left, padding_right)
    assert (padding_left + padding_right) <= x.shape[-1]
    end = x.shape[-1] - padding_right
    return x[..., padding_left:end]


def conv1d(x: jax.Array, weight: jax.Array, bias: tp.Optional[jax.Array] = None,
           stride: int = 1, dilation: int = 1, groups: int = 1) -> jax.Array:
    """Plain valid (no padding) 1d convolution, NCT layout, torch Conv1d semantics.

    weight: [out_channels, in_channels // groups, kernel]
    """
    dn = lax.conv_dimension_numbers(x.shape, weight.shape, ('NCH', 'OIH', 'NCH'))
    y = lax.conv_general_dilated(
        x, weight, window_strides=(stride,), padding=((0, 0),),
        rhs_dilation=(dilation,), dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias[None, :, None]
    return y


def conv_transpose1d(x: jax.Array, weight: jax.Array,
                     bias: tp.Optional[jax.Array] = None,
                     stride: int = 1) -> jax.Array:
    """Valid transposed 1d convolution, torch ConvTranspose1d semantics (padding=0).

    weight: [in_channels, out_channels, kernel] (torch layout).
    Implemented as an lhs-dilated convolution with the kernel flipped along time
    and in/out axes swapped — the adjoint of ``conv1d``.
    """
    k = weight.shape[-1]
    w = jnp.swapaxes(weight, 0, 1)[:, :, ::-1]  # [out, in, k], flipped
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ('NCH', 'OIH', 'NCH'))
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((k - 1, k - 1),),
        lhs_dilation=(stride,), dimension_numbers=dn,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias[None, :, None]
    return y



def conv1d_im2col_mono(x: jax.Array, weight: jax.Array,
                       bias: tp.Optional[jax.Array]) -> jax.Array:
    """Stride-1 mono conv as an im2col matmul (pre-padded input).

    x: [B, 1, T+k-1], weight [C_out, 1, K] -> [B, C_out, T].  Numerically a
    reassociation of the conv sum (fp32 accumulation).

    Standalone this beats XLA's C_in=1 NCW conv at batch 32 (8.3 ms vs
    14.7 ms, scripts/perf_conv0.py, bit-identical outputs), but wired into
    the full encode graph it regressed at batch >= 64 and OOM'd batch 128
    (the [B, K, T] im2col materialization breaks XLA's fusion/memory plan),
    so the encoder keeps the plain conv; kept for kernel experiments.
    """
    k = weight.shape[-1]
    T = x.shape[-1] - (k - 1)
    flat = x[:, 0, :]
    cols = jnp.stack([flat[:, i:i + T] for i in range(k)], axis=1)  # [B,K,T]
    y = jnp.einsum('bkt,ck->bct', cols, weight[:, 0, :],
                   preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias[None, :, None].astype(jnp.float32)
    return y.astype(x.dtype)


def conv1d_banded_mono(x: jax.Array, weight: jax.Array,
                       bias: tp.Optional[jax.Array], *,
                       block: int = 128) -> jax.Array:
    """Stride-1 mono conv as a banded-matrix matmul (pre-padded input).

    x: [B, 1, T+K-1], weight [C_out, 1, K] -> [B, C_out, T].

    XLA lowers the C_in=1 NCW conv ~7x off roofline (PERF.md): the
    contraction is only K taps, far below the MXU's 128 tile.  Reformulate:
    view time as lane-width rows ``x2 = xp.reshape(B, R+1, block)``, pair each
    row with its successor ``uu[r] = x2[r] ++ x2[r+1]`` (every output at
    ``t = r*block + l`` reads inputs ``t .. t+K-1``, i.e. columns
    ``l .. l+K-1`` of the 2*block window), and contract with a banded weight
    tensor ``bmat[c, m, l] = w[c, m-l]`` (zero outside the band).  The matmul
    runs with contraction 2*block and N=block — ideal MXU shapes; the
    2*block/K FLOP redundancy is free because the op is far from the compute
    roofline.  The extra terms are multiplications by structural zeros; only
    the fp32 summation order differs from the native conv (measured 3e-8
    max diff on-chip).
    """
    k = weight.shape[-1]
    c_out = weight.shape[0]
    b = x.shape[0]
    t_out = x.shape[-1] - (k - 1)
    flat = x[:, 0, :]
    rows = -(-t_out // block)
    pad = (rows + 1) * block - flat.shape[-1]
    xp = jnp.pad(flat, ((0, 0), (0, pad)))
    x2 = xp.reshape(b, rows + 1, block)
    uu = jnp.concatenate([x2[:, :rows, :], x2[:, 1:, :]], axis=-1)
    # bmat[c, m, l] = weight[c, 0, m - l] on the band 0 <= m - l < k
    m_idx = np.arange(2 * block)[:, None]
    l_idx = np.arange(block)[None, :]
    diag = m_idx - l_idx
    band = jnp.asarray((diag >= 0) & (diag < k), x.dtype)
    gather = jnp.asarray(np.clip(diag, 0, k - 1))
    bmat = weight[:, 0, gather].astype(x.dtype) * band[None]
    y = jnp.einsum('brm,cml->bcrl', uu, bmat,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias[None, :, None, None].astype(jnp.float32)
    return y.reshape(b, c_out, rows * block)[..., :t_out].astype(x.dtype)


def conv1d_merged_rows(x: jax.Array, weight: jax.Array,
                       bias: tp.Optional[jax.Array], stride: int) -> jax.Array:
    """Strided conv with kernel == 2*stride as one dense matmul (pre-padded).

    x: [B, C_in, T + s] (already carries the k - s = s pad), weight
    [C_out, C_in, 2s] -> [B, C_out, T // s].  The downsample window for
    output u covers inputs [s*u, s*u + 2s): merge s time steps into the
    channel dim (``[B, U+1, s*C]``) and pair adjacent merged rows, giving a
    single [U, 2*s*C_in] x [2*s*C_in, C_out] contraction — exactly the true
    FLOPs, MXU-shaped.  SEANet's downsample convs (kernel = 2*ratio,
    stride = ratio) all match this pattern.
    """
    s = stride
    c_in = x.shape[1]
    k = weight.shape[-1]
    assert k == 2 * s, (k, s)
    t_in = x.shape[-1]
    assert t_in % s == 0, (t_in, s)
    u_out = t_in // s - 1
    xw = jnp.swapaxes(x, 1, 2)                       # [B, T+s, C]
    x2 = xw.reshape(x.shape[0], t_in // s, s * c_in)  # [B, U+1, s*C]
    uu = jnp.concatenate([x2[:, :-1, :], x2[:, 1:, :]], axis=-1)
    # w2[(j, c), o] = weight[o, c, j] for tap j = slot within the 2s window
    w2 = jnp.transpose(weight, (2, 1, 0)).reshape(2 * s * c_in, -1)
    y = jnp.einsum('bum,mo->bou', uu, w2.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    assert y.shape[-1] == u_out
    if bias is not None:
        y = y + bias[None, :, None].astype(jnp.float32)
    return y.astype(x.dtype)


def weight_norm_effective(v: jax.Array, g: jax.Array) -> jax.Array:
    """Effective weight for torch-style weight normalization over dim 0.

    ``w = g * v / ||v||`` with the norm over all axes but the first.
    Used both by the reparameterized training path and the checkpoint importer.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / norm


@dataclasses.dataclass(frozen=True)
class StreamableConv1d:
    """Conv1d with built-in causal / asymmetric padding (reference conv.py:167-203).

    Stores plain weights; normalization choices other than 'none'/'weight_norm'
    ('time_group_norm') attach a GroupNorm after the conv.
    """
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    causal: bool = False
    norm: str = 'none'
    pad_mode: str = 'reflect'

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels * self.kernel_size // self.groups
        bound = 1.0 / math.sqrt(fan_in)
        params = {
            'weight': jax.random.uniform(
                k1, (self.out_channels, self.in_channels // self.groups, self.kernel_size),
                minval=-bound, maxval=bound, dtype=jnp.float32),
        }
        if self.bias:
            params['bias'] = jax.random.uniform(
                k2, (self.out_channels,), minval=-bound, maxval=bound, dtype=jnp.float32)
        if self.norm == 'time_group_norm':
            params['gn_scale'] = jnp.ones((self.out_channels,), jnp.float32)
            params['gn_bias'] = jnp.zeros((self.out_channels,), jnp.float32)
        return params

    @property
    def effective_kernel_size(self) -> int:
        return (self.kernel_size - 1) * self.dilation + 1

    def output_length(self, length: int) -> int:
        """Static output length for a given (static) input length."""
        ks = self.effective_kernel_size
        padding_total = ks - self.stride
        extra = get_extra_padding_for_conv1d(length, ks, self.stride, padding_total)
        padded = length + padding_total + extra
        return (padded - ks) // self.stride + 1

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        ks = self.effective_kernel_size
        padding_total = ks - self.stride
        extra_padding = get_extra_padding_for_conv1d(
            x.shape[-1], ks, self.stride, padding_total)
        if self.causal:
            x = pad1d(x, (padding_total, extra_padding), mode=self.pad_mode)
        else:
            padding_right = padding_total // 2
            padding_left = padding_total - padding_right
            x = pad1d(x, (padding_left, padding_right + extra_padding), mode=self.pad_mode)
        y = conv1d(x, params['weight'], params.get('bias'),
                   stride=self.stride, dilation=self.dilation, groups=self.groups)
        if self.norm == 'time_group_norm':
            # GroupNorm(1, C): normalize over (C, T) jointly per batch element.
            mean = jnp.mean(y, axis=(1, 2), keepdims=True)
            var = jnp.var(y, axis=(1, 2), keepdims=True)
            y = (y - mean) * lax.rsqrt(var + 1e-5)
            y = y * params['gn_scale'][None, :, None] + params['gn_bias'][None, :, None]
        return y


@dataclasses.dataclass(frozen=True)
class StreamableConvTranspose1d:
    """ConvTranspose1d with right-trim handling (reference conv.py:206-245)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    causal: bool = False
    norm: str = 'none'
    trim_right_ratio: float = 1.
    bias: bool = True

    def __post_init__(self):
        assert self.causal or self.trim_right_ratio == 1., \
            "`trim_right_ratio` != 1.0 only makes sense for causal convolutions"
        assert 0. <= self.trim_right_ratio <= 1.

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        params = {
            # torch ConvTranspose1d layout: [in, out, kernel]
            'weight': jax.random.uniform(
                k1, (self.in_channels, self.out_channels, self.kernel_size),
                minval=-bound, maxval=bound, dtype=jnp.float32),
        }
        if self.bias:
            params['bias'] = jax.random.uniform(
                k2, (self.out_channels,), minval=-bound, maxval=bound, dtype=jnp.float32)
        return params

    def output_length(self, length: int) -> int:
        full = (length - 1) * self.stride + self.kernel_size
        return full - (self.kernel_size - self.stride)

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        padding_total = self.kernel_size - self.stride
        y = conv_transpose1d(x, params['weight'], params.get('bias'), stride=self.stride)
        if self.causal:
            padding_right = math.ceil(padding_total * self.trim_right_ratio)
            padding_left = padding_total - padding_right
        else:
            padding_right = padding_total // 2
            padding_left = padding_total - padding_right
        return unpad1d(y, (padding_left, padding_right))
