"""Streaming (chunked) EnCodec inference: live tokenization and synthesis.

The reference supports this via the mutable ``StreamingModule`` protocol
(``/root/reference/audiocraft/modules/streaming.py``) threaded through its
convolutions: a causal EnCodec can encode/decode an unbounded stream chunk
by chunk.  The TPU-native redesign is explicit *functional carry state* —
the same answer we gave the transformer's streaming protocol (KV-cache
pytrees), applied to the conv front-end:

* causal ``StreamableConv1d`` (kernel K, stride S, dilation D): carry the
  last ``(K-1)*D + 1 - S`` raw input samples.  The first chunk applies the
  model's left padding (``pad_mode``!) exactly as whole-signal inference
  does, so chunked == full bit-for-bit; later chunks prepend the carry.
* causal ``StreamableConvTranspose1d``: overlap-add.  The transposed conv
  of ``T`` frames emits ``T*S`` samples plus a ``K - S`` tail that overlaps
  the next chunk's head; the tail (bias-free — bias is added once, on
  emission) is the carry.  The final tail is dropped, which IS the
  reference's causal right-trim.
* ``StreamableLSTM``: carry per-layer ``(h, c)``.

Everything is jit-friendly: chunk shapes are static, the carry is a pytree,
and one compiled "steady" program serves the whole stream (the first chunk
compiles a second, "start" variant for the initial padding).  Chunks must
be multiples of the model hop so every conv sees a stride-aligned length
(the ``CodecStreamer`` wrapper buffers arbitrary input for you).

Constraints (same as the reference's streaming mode): ``causal=True``
models only, no ``renormalize`` (its scale is per-utterance), and no
``time_group_norm`` (normalizes over the whole time axis).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.conv import (StreamableConv1d, StreamableConvTranspose1d, conv1d,
                       conv_transpose1d, pad1d)
from ..nn.seanet import SEANetDecoder, SEANetEncoder, SEANetResnetBlock, _act
from .encodec import EncodecModel, _q_state

__all__ = ['encode_stream', 'decode_stream', 'CodecStreamer']


def _check_streamable(module) -> None:
    assert module.causal, 'streaming requires a causal model'
    norm = getattr(module, 'norm', 'none')
    assert norm != 'time_group_norm', \
        'time_group_norm normalizes over the full time axis; not streamable'


def _conv_stream(conv: StreamableConv1d, p: dict, x: jax.Array,
                 buf: tp.Optional[jax.Array]
                 ) -> tp.Tuple[jax.Array, jax.Array]:
    """Chunked causal conv.  ``buf=None`` marks the stream start (apply the
    model's left padding); thereafter ``buf`` is the carried input tail."""
    _check_streamable(conv)
    ks = conv.effective_kernel_size
    pt = ks - conv.stride
    assert x.shape[-1] % conv.stride == 0, \
        f'chunk length {x.shape[-1]} not a multiple of stride {conv.stride}'
    if pt > 0:
        if buf is None:
            assert x.shape[-1] >= pt, 'first chunk shorter than the receptive tail'
            x = pad1d(x, (pt, 0), mode=conv.pad_mode)
        else:
            x = jnp.concatenate([buf, x], axis=-1)
        new_buf = x[..., x.shape[-1] - pt:]
    else:
        new_buf = jnp.zeros(x.shape[:-1] + (0,), x.dtype)
    y = conv1d(x, p['weight'].astype(x.dtype),
               None if p.get('bias') is None else p['bias'].astype(x.dtype),
               stride=conv.stride, dilation=conv.dilation, groups=conv.groups)
    return y, new_buf


def _convtr_stream(mod: StreamableConvTranspose1d, p: dict, x: jax.Array,
                   carry: tp.Optional[jax.Array]
                   ) -> tp.Tuple[jax.Array, jax.Array]:
    """Chunked causal transposed conv via overlap-add (see module docstring).
    The carry is bias-free; bias lands once on the emitted samples."""
    assert mod.causal, 'streaming requires a causal model'
    assert mod.trim_right_ratio == 1.0, \
        'streaming decode implemented for trim_right_ratio=1.0 (all published configs)'
    K, S = mod.kernel_size, mod.stride
    pt = K - S
    y = conv_transpose1d(x, p['weight'].astype(x.dtype), None, stride=S)
    emit_len = x.shape[-1] * S
    if pt > 0:
        if carry is not None:
            y = y.at[..., :pt].add(carry)
        out, new_carry = y[..., :emit_len], y[..., emit_len:]
    else:
        out = y
        new_carry = jnp.zeros(y.shape[:-1] + (0,), y.dtype)
    if p.get('bias') is not None:
        out = out + p['bias'].astype(x.dtype)[None, :, None]
    return out, new_carry


def _res_stream(block: SEANetResnetBlock, p: dict, x: jax.Array,
                st: tp.Optional[dict]) -> tp.Tuple[jax.Array, dict]:
    act = _act(block.activation, {'alpha': block.activation_alpha})
    y = x
    new_st: dict = {}
    for i, conv in enumerate(block._convs()):
        y = act(y)
        y, new_st[f'conv{i}'] = _conv_stream(
            conv, p[f'conv{i}'], y, None if st is None else st[f'conv{i}'])
    if block.true_skip:
        shortcut = x
    else:
        sc = StreamableConv1d(block.dim, block.dim, kernel_size=1,
                              norm=block.norm, causal=block.causal,
                              pad_mode=block.pad_mode)
        shortcut, _ = _conv_stream(sc, p['shortcut'], x, None)  # K=1: stateless
    return shortcut + y, new_st


def _stack_stream(layers, params: dict, x: jax.Array,
                  state: tp.Optional[dict], act, final_act
                  ) -> tp.Tuple[jax.Array, dict]:
    """Walk a SEANet ``_layers()`` list with carried state (mirrors the
    whole-signal ``__call__`` loops in nn/seanet.py)."""
    new_state: dict = {}
    for i, (kind, mod) in enumerate(layers):
        key = f'layer{i}'
        st = None if state is None else state.get(key)
        if kind == 'act':
            x = act(x)
        elif kind == 'final_act':
            x = final_act(x)
        elif kind == 'conv':
            x, new_state[key] = _conv_stream(mod, params[key], x, st)
        elif kind == 'convtr':
            x, new_state[key] = _convtr_stream(mod, params[key], x, st)
        elif kind == 'res':
            x, new_state[key] = _res_stream(mod, params[key], x, st)
        elif kind == 'lstm':
            x, new_state[key] = mod.stream(params[key], x, st)
        else:  # pragma: no cover
            raise AssertionError(kind)
    return x, new_state


def encoder_stream(encoder: SEANetEncoder, params: dict, x: jax.Array,
                   state: tp.Optional[dict] = None
                   ) -> tp.Tuple[jax.Array, dict]:
    """[B, C, Tc] chunk -> ([B, dim, Tc/hop], state).  ``state=None`` starts
    a stream; chunk lengths must be multiples of ``encoder.hop_length``."""
    assert x.shape[-1] % encoder.hop_length == 0, \
        f'chunk must be a multiple of hop {encoder.hop_length}'
    act = _act(encoder.activation, {'alpha': encoder.activation_alpha})
    return _stack_stream(encoder._layers(), params, x, state, act, None)


def decoder_stream(decoder: SEANetDecoder, params: dict, z: jax.Array,
                   state: tp.Optional[dict] = None
                   ) -> tp.Tuple[jax.Array, dict]:
    """[B, dim, Fc] latent chunk -> ([B, channels, Fc*hop], state)."""
    from ..nn.activations import get_activation_fn
    act = _act(decoder.activation, {'alpha': decoder.activation_alpha})
    final_act = (get_activation_fn(decoder.final_activation.lower())
                 if decoder.final_activation is not None else None)
    return _stack_stream(decoder._layers(), params, z, state, act, final_act)


def encode_stream(model: EncodecModel, params: dict, x: jax.Array,
                  state: tp.Optional[dict] = None,
                  compute_dtype: tp.Optional[tp.Any] = None
                  ) -> tp.Tuple[jax.Array, dict]:
    """Streaming :meth:`EncodecModel.encode`: wav chunk -> (codes, state).

    Token-exact vs whole-signal encode on hop-aligned streams (pinned by
    tests/test_streaming_codec.py).  ``compute_dtype`` mirrors ``encode``
    (default: the model's field; pass ``jnp.float32`` for the parity dtype).
    """
    assert model.causal, 'streaming encode requires the causal model'
    assert not model.renormalize, \
        'renormalize computes a per-utterance scale; not streamable'
    assert x.ndim == 3
    if compute_dtype is None and model.compute_dtype is not None:
        compute_dtype = jnp.dtype(model.compute_dtype)
    enc_params = params['encoder']
    if compute_dtype is not None:
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        enc_params = cast(enc_params)
        x = x.astype(compute_dtype)
    emb, state = encoder_stream(model.encoder, enc_params, x, state)
    codes = model.quantizer.encode(
        _q_state(model.quantizer, params['quantizer']),
        emb.astype(jnp.float32))
    return codes, state


def decode_stream(model: EncodecModel, params: dict, codes: jax.Array,
                  state: tp.Optional[dict] = None,
                  compute_dtype: tp.Optional[tp.Any] = None
                  ) -> tp.Tuple[jax.Array, dict]:
    """Streaming :meth:`EncodecModel.decode`: codes chunk -> (wav, state)."""
    assert model.causal, 'streaming decode requires the causal model'
    if compute_dtype is None and model.compute_dtype is not None:
        compute_dtype = jnp.dtype(model.compute_dtype)
    latent = model.quantizer.decode(
        _q_state(model.quantizer, params['quantizer']), codes)
    dec_params = params['decoder']
    if compute_dtype is not None:
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        dec_params = cast(dec_params)
        latent = latent.astype(compute_dtype)
    wav, state = decoder_stream(model.decoder, dec_params, latent, state)
    return wav.astype(jnp.float32), state


class CodecStreamer:
    """Host-side convenience wrapper: feed arbitrary-length audio, get codes
    (or feed codes, get audio), with fixed-shape jitted steps underneath.

    One "start" and one "steady" program compile per direction; the internal
    sample buffer aligns arbitrary input to ``chunk`` (a hop multiple).
    ``flush()`` zero-pads the remainder to a full chunk and reports how many
    output units are valid.
    """

    def __init__(self, model: EncodecModel, params: dict, chunk: int,
                 direction: str = 'encode',
                 compute_dtype: tp.Optional[tp.Any] = None):
        assert direction in ('encode', 'decode')
        hop = model.encoder.hop_length
        if direction == 'encode':
            assert chunk % hop == 0, f'chunk must be a multiple of hop {hop}'
        self.model = model
        self.params = params
        self.chunk = chunk
        self.hop = hop
        self.direction = direction
        self.state: tp.Optional[dict] = None
        self._buffer: tp.Optional[np.ndarray] = None
        fn = encode_stream if direction == 'encode' else decode_stream
        self._step = jax.jit(
            lambda p, x, st: fn(self.model, p, x, st,
                                compute_dtype=compute_dtype))
        self._start = jax.jit(
            lambda p, x: fn(self.model, p, x, None,
                            compute_dtype=compute_dtype))

    def feed(self, x: np.ndarray) -> tp.List[jax.Array]:
        """Append input; returns a list of output chunks ready so far."""
        x = np.asarray(x)
        assert x.ndim == 3
        self._buffer = (x if self._buffer is None
                        else np.concatenate([self._buffer, x], axis=-1))
        outs = []
        while self._buffer.shape[-1] >= self.chunk:
            piece = jnp.asarray(self._buffer[..., :self.chunk])
            self._buffer = self._buffer[..., self.chunk:]
            if self.state is None:
                out, self.state = self._start(self.params, piece)
            else:
                out, self.state = self._step(self.params, piece, self.state)
            outs.append(out)
        return outs

    def flush(self) -> tp.Tuple[tp.Optional[jax.Array], int]:
        """Process the buffered remainder (zero-padded to a full chunk).
        Returns ``(output, n_valid)`` where the first ``n_valid`` output
        units correspond to real input (frames for encode, samples for
        decode); ``(None, 0)`` if nothing is buffered."""
        if self._buffer is None or self._buffer.shape[-1] == 0:
            return None, 0
        rem = self._buffer.shape[-1]
        pad = self.chunk - rem
        piece = np.pad(self._buffer, [(0, 0), (0, 0), (0, pad)])
        self._buffer = self._buffer[..., :0]
        if self.state is None:
            out, self.state = self._start(self.params, jnp.asarray(piece))
        else:
            out, self.state = self._step(self.params, jnp.asarray(piece),
                                         self.state)
        n_valid = (rem // self.hop if self.direction == 'encode'
                   else rem * self.hop)
        return out, int(n_valid)
