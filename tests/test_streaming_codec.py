"""Streaming (chunked) codec inference == whole-signal inference.

The reference streams causal EnCodec through its mutable StreamingModule
protocol (streaming.py); our functional carry-state redesign must be
token-exact for encode and sample-accurate for decode across any chunking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiocraft_tpu.codec.encodec import EncodecModel
from audiocraft_tpu.codec.streaming import (CodecStreamer, decode_stream,
                                            encode_stream)
from audiocraft_tpu.nn.seanet import SEANetDecoder, SEANetEncoder
from audiocraft_tpu.quant.vq import ResidualVectorQuantizer


def tiny_causal_codec(pad_mode='reflect', lstm=1):
    seanet = dict(channels=1, dimension=16, n_filters=4,
                  n_residual_layers=2, ratios=(4, 2), causal=True,
                  pad_mode=pad_mode, lstm=lstm)
    encoder = SEANetEncoder(**seanet)
    decoder = SEANetDecoder(**seanet)
    quantizer = ResidualVectorQuantizer(dimension=16, n_q=3, bins=64)
    model = EncodecModel(encoder, decoder, quantizer, frame_rate=1000,
                         sample_rate=8000, channels=1, causal=True)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _wav(T, B=2, seed=0):
    return jnp.asarray(np.random.RandomState(seed)
                       .randn(B, 1, T).astype(np.float32) * 0.4)


@pytest.mark.parametrize('pad_mode', ['reflect', 'constant'])
def test_encode_stream_token_exact(pad_mode):
    model, params = tiny_causal_codec(pad_mode)
    hop = model.encoder.hop_length  # 8
    wav = _wav(30 * hop)
    full, _ = model.encode(params, wav)

    state = None
    chunks = []
    # uneven chunking (all hop multiples); the first chunk must cover the
    # deepest receptive tail (final K=7 conv -> >= 6 frames)
    for start, size in ((0, 8 * hop), (8 * hop, 10 * hop), (18 * hop, 12 * hop)):
        codes, state = encode_stream(model, params,
                                     wav[..., start:start + size], state)
        chunks.append(np.asarray(codes))
    streamed = np.concatenate(chunks, axis=-1)
    assert streamed.shape == full.shape
    assert (streamed == np.asarray(full)).all()


def test_decode_stream_matches_full():
    model, params = tiny_causal_codec()
    hop = model.encoder.hop_length
    wav = _wav(24 * hop, seed=3)
    codes, _ = model.encode(params, wav)
    full = np.asarray(model.decode(params, codes))

    state = None
    outs = []
    for start, size in ((0, 8), (8, 6), (14, 10)):
        out, state = decode_stream(model, params,
                                   codes[..., start:start + size], state)
        outs.append(np.asarray(out))
    streamed = np.concatenate(outs, axis=-1)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_real_causal_24khz_config_streams():
    """The published causal config (encodec_24khz shape, weight_norm,
    lstm=2) chunk-streams token-exactly."""
    from audiocraft_tpu.builders import get_encodec_24khz

    model = get_encodec_24khz(n_filters=8)   # published topology, thin
    params = model.init(jax.random.PRNGKey(1))
    hop = model.encoder.hop_length  # 320
    wav = _wav(10 * hop, B=1, seed=7)
    full, _ = model.encode(params, wav, compute_dtype=jnp.float32)

    state = None
    parts = []
    for start, size in ((0, 6 * hop), (6 * hop, 4 * hop)):
        codes, state = encode_stream(model, params,
                                     wav[..., start:start + size], state,
                                     compute_dtype=jnp.float32)
        parts.append(np.asarray(codes))
    assert (np.concatenate(parts, axis=-1) == np.asarray(full)).all()

    # decode side
    codes_full, _ = model.encode(params, wav, compute_dtype=jnp.float32)
    full_wav = np.asarray(model.decode(params, codes_full,
                                       compute_dtype=jnp.float32))
    state = None
    outs = []
    for start, size in ((0, 6), (6, 4)):
        out, state = decode_stream(model, params,
                                   codes_full[..., start:start + size], state,
                                   compute_dtype=jnp.float32)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(np.concatenate(outs, axis=-1), full_wav,
                               atol=2e-5)


def test_codec_streamer_buffers_arbitrary_feeds():
    model, params = tiny_causal_codec()
    hop = model.encoder.hop_length
    wav = np.asarray(_wav(24 * hop + 3, seed=5))  # hop-unaligned total
    full, _ = model.encode(params, jnp.asarray(wav[..., :24 * hop]))

    streamer = CodecStreamer(model, params, chunk=8 * hop)
    outs = []
    # ragged feeds: 7, 50, 1, rest
    for piece in (wav[..., :7], wav[..., 7:57], wav[..., 57:58],
                  wav[..., 58:]):
        outs.extend(np.asarray(o) for o in streamer.feed(piece))
    tail, n_valid = streamer.flush()
    assert n_valid == 0  # 3 leftover samples < one frame
    got = np.concatenate(outs, axis=-1)
    assert got.shape[-1] == 24  # three full 8-frame chunks
    assert (got == np.asarray(full)).all()


def test_stream_requires_causal():
    seanet = dict(channels=1, dimension=16, n_filters=4,
                  n_residual_layers=1, ratios=(4, 2), causal=False)
    model = EncodecModel(SEANetEncoder(**seanet), SEANetDecoder(**seanet),
                         ResidualVectorQuantizer(dimension=16, n_q=2, bins=32),
                         frame_rate=1000, sample_rate=8000, channels=1)
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match='causal'):
        encode_stream(model, params, _wav(64))
