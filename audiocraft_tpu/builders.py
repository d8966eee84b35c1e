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
                      n_q: int = 4, bins: int = 2048, causal: bool = False,
                      compute_dtype: tp.Optional[str] = 'bfloat16'
                      ) -> EncodecModel:
    """The MusicGen tokenizer config: 32 kHz mono, hop 640, 50 Hz frame rate
    (reference loaders.py:104-117 fallback config; facebook/encodec_32khz).

    The production default encodes in bf16 (the TPU throughput path); pass
    ``compute_dtype=None`` for the fp32 parity/conformance dtype.
    """
    ratios = (8, 5, 4, 4)
    seanet = dict(channels=1, dimension=dimension, n_filters=n_filters,
                  n_residual_layers=1, ratios=ratios, norm='weight_norm',
                  lstm=2, causal=causal)
    encoder = SEANetEncoder(**seanet)
    decoder = SEANetDecoder(**seanet)
    quantizer = ResidualVectorQuantizer(dimension=dimension, n_q=n_q, bins=bins)
    return EncodecModel(encoder, decoder, quantizer, frame_rate=50,
                        sample_rate=32000, channels=1, causal=causal,
                        compute_dtype=compute_dtype, lstm_kernel='auto')


def get_encodec_24khz(n_filters: int = 32, dimension: int = 128,
                      n_q: int = 8, bins: int = 1024) -> EncodecModel:
    """The causal streaming EnCodec 24 kHz config (facebook/encodec_24khz:
    hop 320, 75 Hz frame rate, causal convs, renormalize)."""
    ratios = (8, 5, 4, 2)
    seanet = dict(channels=1, dimension=dimension, n_filters=n_filters,
                  n_residual_layers=1, ratios=ratios, norm='weight_norm',
                  lstm=2, causal=True)
    encoder = SEANetEncoder(**seanet)
    decoder = SEANetDecoder(**seanet)
    quantizer = ResidualVectorQuantizer(dimension=dimension, n_q=n_q, bins=bins)
    return EncodecModel(encoder, decoder, quantizer, frame_rate=75,
                        sample_rate=24000, channels=1, causal=True)


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
    params = model.init(key)
    k1, k2 = jax.random.split(key)
    init_x = jax.random.normal(k1, (8, model.quantizer.dimension, 128))
    # warm kmeans directly on the latent batch
    res, new_state = model.quantizer.forward(
        params['quantizer'], init_x, frame_rate=1, key=k2, training=True)
    params['quantizer'] = new_state
    return params


# ---------------------------------------------------------------- MusicGen

_MUSICGEN_SIZES = {
    # public MusicGen transformer shapes (300M / 1.5B / 3.3B)
    'small': dict(dim=1024, num_layers=24, num_heads=16),
    'medium': dict(dim=1536, num_layers=48, num_heads=24),
    'large': dict(dim=2048, num_layers=48, num_heads=32),
}


def get_debug_musicgen_lm():
    """Debug LM mirroring the reference test model (builders.py:309-335:
    dim=16, 2 layers, card=400, whitespace-LUT conditioner) so reference
    debug checkpoints import 1:1.  Returns (lm, provider)."""
    from .cond.conditioners import ConditioningProvider, LUTConditioner
    from .cond.fuser import ConditionFuser
    from .lm.model import LMModel
    from .patterns import DelayedPatternProvider

    provider = ConditioningProvider.from_dict({
        'description': LUTConditioner(n_bins=128, dim=16, output_dim=16,
                                      tokenizer='whitespace'),
    })
    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    lm = LMModel(pattern_provider=DelayedPatternProvider(4), fuser=fuser,
                 n_q=4, card=400, dim=16, num_heads=4, num_layers=2,
                 cross_attention=True, causal=True,
                 # torch nn.TransformerEncoderLayer defaults the reference
                 # debug model inherits
                 norm_first=False, activation='relu')
    return lm, provider


def get_musicgen_lm(size: str = 'small', melody: bool = False,
                    style: bool = False, n_q: int = 4, card: int = 2048):
    """MusicGen LM config for the published model sizes (reference
    musicgen.py:100-143 pretrained map; builders.py:136-175 cfg factory).
    Text conditions via T5 cross-attention; melody variants prepend chroma;
    style variants (musicgen-style) prepend the RVQ-bottlenecked style
    tokens and generate with double CFG."""
    from .cond.chroma_cond import ChromaConditioner
    from .cond.conditioners import ConditioningProvider, T5Conditioner
    from .cond.fuser import ConditionFuser
    from .lm.model import LMModel
    from .patterns import DelayedPatternProvider

    shape = _MUSICGEN_SIZES[size]
    conditioners = {
        'description': T5Conditioner(name='t5-base', output_dim=shape['dim']),
    }
    fuse = {'cross': ('description',)}
    if melody:
        conditioners['self_wav'] = ChromaConditioner(
            output_dim=shape['dim'], sample_rate=32000, n_chroma=12,
            radix2_exp=12, duration=30.0)
        fuse['prepend'] = ('self_wav',)
    if style:
        from .cond.style_cond import StyleConditioner
        assert not melody, 'style and melody conditioning are exclusive'
        conditioners['self_wav'] = StyleConditioner(
            feat_extractor=get_encodec_32khz(compute_dtype=None),
            output_dim=shape['dim'], sample_rate=32000)
        fuse['prepend'] = ('self_wav',)
    provider = ConditioningProvider.from_dict(conditioners)
    fuser = ConditionFuser.from_dict(fuse)
    lm = LMModel(
        pattern_provider=DelayedPatternProvider(n_q), fuser=fuser,
        n_q=n_q, card=card, hidden_scale=4, norm_first=True,
        bias_proj=False, bias_ff=False, bias_attn=False,
        cross_attention=True, causal=True, activation='gelu',
        positional_embedding='sin', two_step_cfg=False, cfg_coef=3.0,
        weight_init='gaussian', depthwise_init='current',
        zero_bias_init=True,
        # flash attention at long sequences only (30 s training segments,
        # where the einsum path's fp32 scores do not fit — PERF.md); decode
        # and 10 s forwards keep the einsum path, which measures faster there
        attn_kernel='auto', **shape)
    return lm, provider


def get_magnet_lm(size: str = 'small', n_q: int = 4, card: int = 2048,
                  segment_duration: int = 10):
    """MAGNeT LM config for the published model sizes (reference
    magnet.py:30-58 pretrained map — small 300M / medium 1.5B at 10 s or
    30 s — and loaders.py:217-240 cfg plumbing: span_len/segment_duration
    from the masking/dataset cfg, subcodes_context=5, non-causal)."""
    from .cond.conditioners import ConditioningProvider, T5Conditioner
    from .cond.fuser import ConditionFuser
    from .lm.magnet import MagnetLMModel
    from .patterns import ParallelPatternProvider

    shape = _MUSICGEN_SIZES[size]
    provider = ConditioningProvider.from_dict({
        'description': T5Conditioner(name='t5-base', output_dim=shape['dim']),
    })
    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    lm = MagnetLMModel(
        pattern_provider=ParallelPatternProvider(n_q), fuser=fuser,
        n_q=n_q, card=card, hidden_scale=4, norm_first=True,
        bias_proj=False, bias_ff=False, bias_attn=False,
        cross_attention=True, causal=False, activation='gelu',
        positional_embedding='sin', weight_init='gaussian',
        depthwise_init='current', zero_bias_init=True,
        subcodes_context=5, span_len=3,
        compression_model_framerate=50,
        segment_duration=segment_duration,
        # long-sequence-only flash routing (see get_musicgen_lm): the 30 s
        # variants' stage-0 forwards route, 10 s forwards keep einsum
        attn_kernel='auto', **shape)
    return lm, provider


def get_musicgen(size: str = 'small', melody: bool = False,
                 style: bool = False, stereo: bool = False, key=None):
    """Full MusicGen facade with the real architecture (random init; load
    published weights through ckpt.torch_import when available).

    ``stereo=True`` builds the stereo-* variants of the pretrained map: the
    mono codec wrapped in codebook interleaving (reference
    builders.py:338-351), so the LM models 2x the codebooks (n_q=8) and the
    facade decodes 2-channel audio.
    """
    import jax
    from .gen.musicgen import MusicGen

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    codec: tp.Any = get_encodec_32khz()
    if stereo:
        codec = get_wrapped_compression_model(codec, interleave_stereo=True)
    lm, provider = get_musicgen_lm(size, melody=melody, style=style,
                                   n_q=codec.num_codebooks)
    variant = ("stereo-" if stereo else "") + \
        ("melody-" if melody else "") + ("style-" if style else "")
    name = f'musicgen-{variant}{size}'
    return MusicGen(name=name, compression_model=codec,
                    codec_params=codec.init(k1), lm=lm, lm_params=lm.init(k2),
                    condition_provider=provider, cond_params=provider.init(k3),
                    max_duration=30.0)


def get_jasco_model(compression_model=None, dim: int = 512, num_heads: int = 8,
                    num_layers: int = 8, chords_dim: int = 16,
                    drums_dim: int = 16, melody_dim: int = 16,
                    flow_dim: int = 128, sequence_length: int = 500):
    """JASCO flow-matching model + conditioning provider (reference
    builders.py:94-124 + loaders.py:246-256).  Returns (model, provider)."""
    from .cond.conditioners import T5Conditioner
    from .cond.fuser import ConditionFuser
    from .cond.jasco_conditioners import (ChordsEmbConditioner,
                                          DrumsConditioner,
                                          JascoConditioningProvider,
                                          MelodyConditioner)
    from .lm.flow_matching import FlowMatchingModel

    codec = compression_model or get_encodec_32khz()
    provider = JascoConditioningProvider.from_dict({
        'description': T5Conditioner(name='t5-base', output_dim=dim),
        'chords': ChordsEmbConditioner(card=194, out_dim=chords_dim),
        'melody': MelodyConditioner(card=53, out_dim=melody_dim),
        'self_wav': DrumsConditioner(
            feat_extractor=codec, out_dim=drums_dim, sample_rate=32000,
            compression_model_latent_dim=codec.quantizer.dimension,
            compression_model_framerate=codec.frame_rate),
    }, sequence_length=sequence_length)
    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    model = FlowMatchingModel(
        fuser=fuser, dim=dim, num_heads=num_heads, num_layers=num_layers,
        flow_dim=flow_dim, chords_dim=chords_dim, drums_dim=drums_dim,
        melody_dim=melody_dim)
    return model, provider, codec


def get_wrapped_compression_model(compression_model: EncodecModel,
                                  interleave_stereo: bool = False,
                                  per_timestep: bool = False,
                                  n_q: tp.Optional[int] = None):
    """Optionally wrap the codec for stereo interleaving and/or override the
    active codebook count (reference builders.py:338-351)."""
    model: tp.Any = compression_model
    if n_q is not None:
        model = model.set_num_codebooks(n_q)
    if interleave_stereo:
        from .codec.stereo import InterleaveStereoCompressionModel
        model = InterleaveStereoCompressionModel(model,
                                                per_timestep=per_timestep)
    return model
