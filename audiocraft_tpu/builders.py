"""Model factories: typed configs -> model instances.

Functional counterpart of ``/root/reference/audiocraft/models/builders.py``.
Instead of Hydra/OmegaConf configs we use the frozen dataclass configs directly
(they are hashable and jit-static); checkpoint-embedded configs round-trip as
plain dicts (see ckpt/).
"""

from __future__ import annotations

import typing as tp

import jax

from .codec.encodec import EncodecModel
from .nn.seanet import SEANetDecoder, SEANetEncoder
from .quant.vq import ResidualVectorQuantizer


def get_encodec_32khz(n_filters: int = 64, dimension: int = 128,
                      n_q: int = 4, bins: int = 2048,
                      causal: bool = False) -> EncodecModel:
    """The MusicGen tokenizer config: 32 kHz mono, hop 640, 50 Hz frame rate
    (reference loaders.py:104-117 fallback config; facebook/encodec_32khz)."""
    ratios = (8, 5, 4, 4)
    seanet = dict(channels=1, dimension=dimension, n_filters=n_filters,
                  n_residual_layers=1, ratios=ratios, norm='weight_norm',
                  lstm=2, causal=causal)
    encoder = SEANetEncoder(**seanet)
    decoder = SEANetDecoder(**seanet)
    quantizer = ResidualVectorQuantizer(dimension=dimension, n_q=n_q, bins=bins)
    return EncodecModel(encoder, decoder, quantizer, frame_rate=50,
                        sample_rate=32000, channels=1, causal=causal)


def get_debug_compression_model(sample_rate: int = 32000) -> EncodecModel:
    """Tiny codec for tests (reference builders.py:257-288)."""
    assert sample_rate in (16000, 32000)
    ratios = {16000: (10, 8, 8), 32000: (10, 8, 16)}[sample_rate]
    seanet = dict(channels=1, dimension=32, n_filters=4, n_residual_layers=1,
                  ratios=ratios)
    encoder = SEANetEncoder(**seanet)
    decoder = SEANetDecoder(**seanet)
    quantizer = ResidualVectorQuantizer(dimension=32, bins=400, n_q=4)
    return EncodecModel(encoder, decoder, quantizer, frame_rate=25,
                        sample_rate=sample_rate, channels=1)


def init_debug_compression_model(model: EncodecModel, key: jax.Array) -> dict:
    """Init params and warm the quantizer k-means on one random batch, like the
    reference debug builder (builders.py:277-278)."""
    import jax.numpy as jnp
    params = model.init(key)
    k1, k2 = jax.random.split(key)
    init_x = jax.random.normal(k1, (8, model.quantizer.dimension, 128))
    _, params = model.forward(params, jnp.zeros((1, 1, 1)), key=k2) \
        if False else (None, params)
    # warm kmeans directly on the latent batch
    res, new_state = model.quantizer.forward(
        params['quantizer'], init_x, frame_rate=1, key=k2, training=True)
    params['quantizer'] = new_state
    return params
