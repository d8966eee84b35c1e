"""Checkpoint round-trip: config + params save/load, stereo wrapper, dummy
quantizer codec."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from audiocraft_tpu.builders import get_debug_compression_model
from audiocraft_tpu.ckpt.io import (config_from_dict, config_to_dict,
                                    load_checkpoint, save_checkpoint)
from audiocraft_tpu.codec.stereo import InterleaveStereoCompressionModel
from audiocraft_tpu.quant.base import DummyQuantizer


def test_config_roundtrip_codec():
    model = get_debug_compression_model(32000)
    data = config_to_dict(model)
    back = config_from_dict(data)
    assert back == model


def test_config_roundtrip_lm():
    from audiocraft_tpu.cond.fuser import ConditionFuser
    from audiocraft_tpu.lm.model import LMModel
    from audiocraft_tpu.patterns import DelayedPatternProvider
    lm = LMModel(pattern_provider=DelayedPatternProvider(4, delays=[0, 1, 2, 3]),
                 fuser=ConditionFuser.from_dict({'cross': ('description',)}),
                 n_q=4, card=400, dim=16, num_heads=4, num_layers=2,
                 cross_attention=True)
    back = config_from_dict(config_to_dict(lm))
    assert back.n_q == lm.n_q and back.card == lm.card
    assert back.fuser == lm.fuser
    assert back.pattern_provider.delays == lm.pattern_provider.delays


def test_checkpoint_roundtrip(tmp_path):
    model = get_debug_compression_model(32000)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path / "ckpt", model, params, extra={'step': 7})
    model2, params2, meta = load_checkpoint(tmp_path / "ckpt")
    assert model2 == model
    assert meta['extra']['step'] == 7

    wav = jnp.asarray(np.random.RandomState(0).randn(1, 1, 16000)
                      .astype(np.float32) * 0.1)
    codes1, _ = model.encode(params, wav)
    # loaded params: quantizer comes back as a dict — accepted by the model
    codes2, _ = model2.encode(jax.tree.map(jnp.asarray, params2), wav)
    assert (np.asarray(codes1) == np.asarray(codes2)).all()


def test_stereo_interleave_roundtrip():
    mono = get_debug_compression_model(32000)
    params = mono.init(jax.random.PRNGKey(0))
    for per_timestep in (False, True):
        stereo = InterleaveStereoCompressionModel(mono, per_timestep=per_timestep)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 2, 16000)
                        .astype(np.float32) * 0.1)
        codes, scale = stereo.encode(params, x)
        if per_timestep:
            assert codes.shape[1] == mono.num_codebooks
            assert codes.shape[2] % 2 == 0
        else:
            assert codes.shape[1] == mono.num_codebooks * 2
        left, right = stereo.get_left_right_codes(codes)
        mono_codes, _ = mono.encode(params, x[:, 0:1])
        assert (np.asarray(left) == np.asarray(mono_codes)).all()
        out = stereo.decode(params, codes)
        assert out.shape[0] == 2 and out.shape[1] == 2


def test_dummy_quantizer_codec():
    model = get_debug_compression_model(32000)
    model = dataclasses.replace(model, quantizer=DummyQuantizer())
    params = model.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.RandomState(2).randn(1, 1, 8000)
                      .astype(np.float32) * 0.1)
    codes, scale = model.encode(params, wav)
    assert codes.shape[1] == 1  # fake codebook dim
    out = model.decode(params, codes)
    assert out.shape[0] == 1 and out.shape[1] == 1
