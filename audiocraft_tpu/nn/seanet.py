"""SEANet encoder/decoder — the EnCodec convolutional front-end, functional JAX.

Topology parity with ``/root/reference/audiocraft/modules/seanet.py``:
* Encoder (seanet.py:63-153): init conv -> per downsampling ratio
  [n_residual x ResnetBlock, activation, strided conv (kernel = 2*ratio) doubling
  channels] -> optional LSTM -> activation -> final conv to `dimension`.
  Ratios are applied in *reversed* order of the decoder's list.
* Decoder (seanet.py:156-258): mirror with transposed convs halving channels
  and an optional final activation.
* Resnet block (seanet.py:16-62): [act, conv(k, dilation), act, conv(1)] with a
  bottleneck `dim // compress`, plus identity (true_skip) or 1x1-conv shortcut.
* `disable_norm_outer_blocks` counts from the input side of the encoder and the
  output side of the decoder (seanet.py:106-120, 146, 208-246).

The whole stack is a static Python composition of `StreamableConv1d` /
`StreamableConvTranspose1d` / `StreamableLSTM` calls — XLA sees one flat graph
of convolutions and fuses the ELU elementwise ops into them.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .activations import get_activation_fn
from .conv import (StreamableConv1d, StreamableConvTranspose1d,
                   get_extra_padding_for_conv1d, pad1d)
from .lstm import StreamableLSTM


def _act(name: str, params: dict):
    # torch activations are classes (e.g. nn.ELU); configs carry torch names.
    name = name.lower()
    fn = get_activation_fn(name)
    alpha = params.get('alpha', 1.0)
    if name == 'elu':
        return lambda x: jax.nn.elu(x, alpha)
    return fn


def corruption_radius(layers, lo: int, hi: int) -> tp.Tuple[int, int]:
    """(left, right) corruption radius of the layer slice ``[lo, hi)`` run on
    an interior time chunk: how far wrong values at the chunk edges (the
    layers' own local pads standing in for the true neighboring signal)
    propagate into the slice's output, in output-timebase units.

    Per conv (stride ``s``, one-sided pads ``pl``/``pr``): output ``t``
    reads inputs ``[t*s - pl, t*s - pl + ke - 1]``, so a corrupt input
    region of width ``c`` corrupts ``ceil((c + pl) / s)`` outputs.  Per
    transposed conv (trims ``pl``/``pr`` after the full overlap-add):
    corrupt/missing inputs ``< c`` touch full outputs ``< c*s + (k - s)``,
    i.e. ``c*s + pr`` after the left trim (mirrored on the right).
    Pointwise layers (activations, residual skips) are radius-neutral."""
    c_l = c_r = 0
    for i, (kind, mod) in enumerate(layers):
        if i < lo or i >= hi:
            continue
        assert kind != 'lstm', "LSTM has unbounded receptive field"
        if kind == 'convtr':
            p = mod.kernel_size - mod.stride
            if mod.causal:
                pr = int(np.ceil(p * mod.trim_right_ratio))
                pl = p - pr
            else:
                pr = p // 2
                pl = p - pr
            c_l = c_l * mod.stride + pr
            c_r = c_r * mod.stride + pl
            continue
        convs: tp.List[StreamableConv1d] = []
        if kind == 'conv':
            convs = [mod]
        elif kind == 'res':
            convs = mod._convs()  # skip path is pointwise: radius-neutral
        for conv in convs:
            ke = conv.effective_kernel_size
            p = ke - conv.stride
            pl = p if conv.causal else p // 2
            pr = p - pl
            s = conv.stride
            # corrupt-left: t*s - pl < c_l  ->  t <= ceil((c_l+pl)/s)-1
            c_l = max(0, -(-(c_l + pl) // s))
            c_r = max(0, -(-(c_r + pr) // s))
    return c_l, c_r


@dataclasses.dataclass(frozen=True)
class SEANetResnetBlock:
    dim: int
    kernel_sizes: tp.Tuple[int, ...] = (3, 1)
    dilations: tp.Tuple[int, ...] = (1, 1)
    activation: str = 'ELU'
    activation_alpha: float = 1.0
    norm: str = 'none'
    causal: bool = False
    pad_mode: str = 'reflect'
    compress: int = 2
    true_skip: bool = True

    def _convs(self) -> tp.List[StreamableConv1d]:
        hidden = self.dim // self.compress
        convs = []
        n = len(self.kernel_sizes)
        for i, (ks, dil) in enumerate(zip(self.kernel_sizes, self.dilations)):
            in_chs = self.dim if i == 0 else hidden
            out_chs = self.dim if i == n - 1 else hidden
            convs.append(StreamableConv1d(
                in_chs, out_chs, kernel_size=ks, dilation=dil, norm=self.norm,
                causal=self.causal, pad_mode=self.pad_mode))
        return convs

    def init(self, key: jax.Array) -> dict:
        convs = self._convs()
        keys = jax.random.split(key, len(convs) + 1)
        params = {f'conv{i}': c.init(keys[i]) for i, c in enumerate(convs)}
        if not self.true_skip:
            shortcut = StreamableConv1d(self.dim, self.dim, kernel_size=1,
                                        norm=self.norm, causal=self.causal,
                                        pad_mode=self.pad_mode)
            params['shortcut'] = shortcut.init(keys[-1])
        return params

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        act = _act(self.activation, {'alpha': self.activation_alpha})
        y = x
        for i, conv in enumerate(self._convs()):
            y = act(y)
            y = conv(params[f'conv{i}'], y)
        if self.true_skip:
            shortcut = x
        else:
            sc = StreamableConv1d(self.dim, self.dim, kernel_size=1, norm=self.norm,
                                  causal=self.causal, pad_mode=self.pad_mode)
            shortcut = sc(params['shortcut'], x)
        return shortcut + y


@dataclasses.dataclass(frozen=True)
class SEANetEncoder:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 3
    ratios: tp.Tuple[int, ...] = (8, 5, 4, 2)  # decoder order; reversed internally
    activation: str = 'ELU'
    activation_alpha: float = 1.0
    norm: str = 'none'
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = 'reflect'
    true_skip: bool = True
    compress: int = 2
    lstm: int = 0
    disable_norm_outer_blocks: int = 0

    @property
    def enc_ratios(self) -> tp.Tuple[int, ...]:
        return tuple(reversed(self.ratios))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @property
    def n_blocks(self) -> int:
        return len(self.ratios) + 2

    def _layers(self):
        """Static layer list: sequence of ('conv'|'res'|'lstm'|'act', module)."""
        assert 0 <= self.disable_norm_outer_blocks <= self.n_blocks
        layers: tp.List[tp.Tuple[str, tp.Any]] = []
        mult = 1
        norm0 = 'none' if self.disable_norm_outer_blocks >= 1 else self.norm
        layers.append(('conv', StreamableConv1d(
            self.channels, mult * self.n_filters, self.kernel_size, norm=norm0,
            causal=self.causal, pad_mode=self.pad_mode)))
        for i, ratio in enumerate(self.enc_ratios):
            block_norm = 'none' if self.disable_norm_outer_blocks >= i + 2 else self.norm
            for j in range(self.n_residual_layers):
                layers.append(('res', SEANetResnetBlock(
                    mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    norm=block_norm, activation=self.activation,
                    activation_alpha=self.activation_alpha,
                    causal=self.causal, pad_mode=self.pad_mode,
                    compress=self.compress, true_skip=self.true_skip)))
            layers.append(('act', None))
            layers.append(('conv', StreamableConv1d(
                mult * self.n_filters, mult * self.n_filters * 2,
                kernel_size=ratio * 2, stride=ratio, norm=block_norm,
                causal=self.causal, pad_mode=self.pad_mode)))
            mult *= 2
        if self.lstm:
            layers.append(('lstm', StreamableLSTM(mult * self.n_filters,
                                                  num_layers=self.lstm)))
        normN = 'none' if self.disable_norm_outer_blocks == self.n_blocks else self.norm
        layers.append(('act', None))
        layers.append(('conv', StreamableConv1d(
            mult * self.n_filters, self.dimension, self.last_kernel_size,
            norm=normN, causal=self.causal, pad_mode=self.pad_mode)))
        return layers

    def init(self, key: jax.Array) -> dict:
        layers = self._layers()
        keys = jax.random.split(key, len(layers))
        params = {}
        for i, (kind, mod) in enumerate(layers):
            if kind != 'act':
                params[f'layer{i}'] = mod.init(keys[i])
        return params

    @property
    def split_index(self) -> int:
        """Layer index separating the time-local conv front (every layer
        strictly before it) from the sequence-global tail (LSTM onward, or
        the final act+conv when there is no LSTM).  The front is what
        ``dist/pod.py`` shards over time; everything at/after this index has
        unbounded receptive field (LSTM) or is cheap enough to replicate."""
        layers = self._layers()
        for i, (kind, _) in enumerate(layers):
            if kind == 'lstm':
                return i
        return len(layers) - 2  # final (act, conv) pair

    def front_corruption_radius(self) -> tp.Tuple[int, int]:
        """(left, right) corruption radius, in front-output frames, of the
        conv front (layers before ``split_index``) when it runs on an
        interior chunk whose edges carry the layer-local pads instead of the
        true neighboring signal (dist/pod.py halo sizing)."""
        return corruption_radius(self._layers(), 0, self.split_index)

    def __call__(self, params: dict, x: jax.Array, *,
                 fused_stages: int = 0, conv0_kernel: bool = False,
                 lstm_kernel: bool = False,
                 start_layer: int = 0, stop_layer: tp.Optional[int] = None,
                 interpret: bool = False) -> jax.Array:
        """Forward [B, C, T] -> [B, dimension, T/hop].

        ``fused_stages > 0`` routes the first N downsampling stages through
        the fused Pallas kernel (ops/seanet_pallas.py) when the topology and
        shapes are eligible, falling back to the XLA stack otherwise.
        ``conv0_kernel`` routes the mono input conv through the banded-matmul
        Pallas kernel (XLA lowers the C_in=1 conv ~2x off its memory floor,
        PERF.md); ineligible shapes fall back to the XLA conv.
        ``lstm_kernel`` routes the LSTM recurrence through the Pallas
        scan-in-one-program kernel (ops/lstm_pallas.py).
        ``start_layer``/``stop_layer`` run a half-open layer slice — the
        front/back split used by the time-parallel pod encode (dist/pod.py).
        """
        act = _act(self.activation, {'alpha': self.activation_alpha})
        start = start_layer
        if conv0_kernel and start_layer == 0:
            y = self._conv0_kernel(params, x, interpret=interpret)
            if y is not None:
                x, start = y, 1
        # the fused stage kernel runs its own input conv on the RAW signal —
        # incompatible with a conv0 already applied above
        if fused_stages and start == 0:
            from ..ops.seanet_pallas import fused_encoder_apply
            fused = fused_encoder_apply(self, params, x, fused_stages,
                                        interpret=interpret)
            if fused is not None:
                x, start = fused
        for i, (kind, mod) in enumerate(self._layers()):
            if i < start or (stop_layer is not None and i >= stop_layer):
                continue
            if kind == 'act':
                x = act(x)
            elif kind == 'lstm':
                x = mod(params[f'layer{i}'], x, kernel=lstm_kernel,
                        interpret=interpret)
            else:
                x = mod(params[f'layer{i}'], x)
        return x

    def _conv0_kernel(self, params: dict, x: jax.Array, *,
                      interpret: bool = False) -> tp.Optional[jax.Array]:
        """Input conv via ops/seanet_pallas.banded_mono_conv (None = fall
        back).  Reproduces StreamableConv1d's exact padding, then hands the
        pre-padded signal to the kernel."""
        mod = self._layers()[0][1]
        if (mod.in_channels != 1 or mod.stride != 1 or mod.dilation != 1
                or mod.groups != 1 or mod.norm == 'time_group_norm'):
            return None
        from ..ops.seanet_pallas import banded_mono_conv
        ks = mod.effective_kernel_size
        padding_total = ks - mod.stride
        extra = get_extra_padding_for_conv1d(x.shape[-1], ks, mod.stride,
                                             padding_total)
        if mod.causal:
            pads = (padding_total, extra)
        else:
            pr = padding_total // 2
            pads = (padding_total - pr, pr + extra)
        xp = pad1d(x, pads, mode=mod.pad_mode)
        p0 = params['layer0']
        bias = p0.get('bias')
        if bias is None:
            bias = jnp.zeros((mod.out_channels,), jnp.float32)
        return banded_mono_conv(xp, p0['weight'].astype(x.dtype), bias,
                                interpret=interpret)

    def output_length(self, length: int) -> int:
        for kind, mod in self._layers():
            if kind == 'conv':
                length = mod.output_length(length)
        return length


@dataclasses.dataclass(frozen=True)
class SEANetDecoder:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 3
    ratios: tp.Tuple[int, ...] = (8, 5, 4, 2)
    activation: str = 'ELU'
    activation_alpha: float = 1.0
    final_activation: tp.Optional[str] = None
    norm: str = 'none'
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = 'reflect'
    true_skip: bool = True
    compress: int = 2
    lstm: int = 0
    disable_norm_outer_blocks: int = 0
    trim_right_ratio: float = 1.0

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))

    @property
    def n_blocks(self) -> int:
        return len(self.ratios) + 2

    def _layers(self):
        assert 0 <= self.disable_norm_outer_blocks <= self.n_blocks
        layers: tp.List[tp.Tuple[str, tp.Any]] = []
        mult = int(2 ** len(self.ratios))
        norm0 = 'none' if self.disable_norm_outer_blocks == self.n_blocks else self.norm
        layers.append(('conv', StreamableConv1d(
            self.dimension, mult * self.n_filters, self.kernel_size, norm=norm0,
            causal=self.causal, pad_mode=self.pad_mode)))
        if self.lstm:
            layers.append(('lstm', StreamableLSTM(mult * self.n_filters,
                                                  num_layers=self.lstm)))
        for i, ratio in enumerate(self.ratios):
            block_norm = ('none' if self.disable_norm_outer_blocks >= self.n_blocks - (i + 1)
                          else self.norm)
            layers.append(('act', None))
            layers.append(('convtr', StreamableConvTranspose1d(
                mult * self.n_filters, mult * self.n_filters // 2,
                kernel_size=ratio * 2, stride=ratio, norm=block_norm,
                causal=self.causal, trim_right_ratio=self.trim_right_ratio)))
            for j in range(self.n_residual_layers):
                layers.append(('res', SEANetResnetBlock(
                    mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    activation=self.activation,
                    activation_alpha=self.activation_alpha,
                    norm=block_norm, causal=self.causal, pad_mode=self.pad_mode,
                    compress=self.compress, true_skip=self.true_skip)))
            mult //= 2
        normN = 'none' if self.disable_norm_outer_blocks >= 1 else self.norm
        layers.append(('act', None))
        layers.append(('conv', StreamableConv1d(
            self.n_filters, self.channels, self.last_kernel_size, norm=normN,
            causal=self.causal, pad_mode=self.pad_mode)))
        if self.final_activation is not None:
            layers.append(('final_act', None))
        return layers

    def init(self, key: jax.Array) -> dict:
        layers = self._layers()
        keys = jax.random.split(key, len(layers))
        params = {}
        for i, (kind, mod) in enumerate(layers):
            if kind not in ('act', 'final_act'):
                params[f'layer{i}'] = mod.init(keys[i])
        return params

    @property
    def split_index(self) -> int:
        """Layer index separating the sequence-global head (initial conv +
        LSTM, run replicated by dist/pod.py) from the time-local upsampling
        tail (everything from this index on, time-sharded)."""
        layers = self._layers()
        for i, (kind, _) in enumerate(layers):
            if kind == 'lstm':
                return i + 1
        return 1  # no LSTM: head = the initial conv only

    def tail_corruption_radius(self) -> tp.Tuple[int, int]:
        """(left, right) corruption radius, in output samples, of the
        upsampling tail (layers from ``split_index``) on an interior chunk
        (dist/pod.py halo sizing)."""
        return corruption_radius(self._layers(), self.split_index,
                                 len(self._layers()))

    def __call__(self, params: dict, z: jax.Array, *,
                 lstm_kernel: bool = False,
                 start_layer: int = 0, stop_layer: tp.Optional[int] = None,
                 interpret: bool = False) -> jax.Array:
        act = _act(self.activation, {'alpha': self.activation_alpha})
        x = z
        for i, (kind, mod) in enumerate(self._layers()):
            if i < start_layer or (stop_layer is not None and i >= stop_layer):
                continue
            if kind == 'act':
                x = act(x)
            elif kind == 'final_act':
                x = get_activation_fn(self.final_activation.lower())(x)
            elif kind == 'lstm':
                x = mod(params[f'layer{i}'], x, kernel=lstm_kernel,
                        interpret=interpret)
            else:
                x = mod(params[f'layer{i}'], x)
        return x
