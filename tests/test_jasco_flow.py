"""JASCO flow matching + conditioners + UnetTransformer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from audiocraft_tpu.builders import get_debug_compression_model
from audiocraft_tpu.cond.attributes import (ConditioningAttributes,
                                            SymbolicCondition, WavCondition)
from audiocraft_tpu.cond.conditioners import LUTConditioner
from audiocraft_tpu.cond.fuser import ConditionFuser
from audiocraft_tpu.cond.jasco_conditioners import (ChordsEmbConditioner,
                                                    DrumsConditioner,
                                                    JascoConditioningProvider,
                                                    MelodyConditioner)
from audiocraft_tpu.lm.flow_matching import FlowMatchingModel, timestep_embedding
from audiocraft_tpu.nn.unet_transformer import UnetTransformer


def test_unet_transformer_skip_connections():
    tr = UnetTransformer(d_model=32, num_heads=4, num_layers=4,
                         causal=False, norm_first=True,
                         skip_connections=True)
    params = tr.init(jax.random.PRNGKey(0))
    assert len(params['skip_projections']) == 2
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32))
    y, _ = tr(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_timestep_embedding_matches_reference_math():
    import torch
    from oracle import ref_module
    # the reference embeds via FlowMatchingModel._get_timestep_embedding;
    # replicate its math directly (flow_matching.py:211-231)
    t = np.array([0.0, 0.25, 0.9], np.float32)
    dim = 16
    half = dim // 2
    emb_scale = np.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb_scale)
    args = t[:, None] * freqs[None, :]
    expected = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    ours = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_jasco_conditioners():
    codec = get_debug_compression_model(32000)
    codec_params = codec.init(jax.random.PRNGKey(0))
    provider = JascoConditioningProvider.from_dict({
        'description': LUTConditioner(n_bins=64, dim=8, output_dim=8,
                                      tokenizer='whitespace'),
        'chords': ChordsEmbConditioner(card=194, out_dim=8),
        'melody': MelodyConditioner(card=53, out_dim=8),
        'self_wav': DrumsConditioner(
            feat_extractor=codec, out_dim=8, sample_rate=32000,
            compression_model_latent_dim=codec.quantizer.dimension,
            compression_model_framerate=codec.frame_rate),
    }, sequence_length=50, melody_dim=53)
    params = provider.init(jax.random.PRNGKey(1), codec_params)

    attrs = ConditioningAttributes(text={'description': 'drum n bass'})
    attrs.symbolic['chords'] = SymbolicCondition(
        frame_chords=np.random.RandomState(0).randint(0, 194, (30,)))
    attrs.symbolic['melody'] = SymbolicCondition(
        melody=np.random.RandomState(1).rand(53, 40).astype(np.float32))
    attrs.wav['self_wav'] = WavCondition(
        wav=np.random.RandomState(2).randn(1, 1, 32000).astype(np.float32) * 0.1,
        length=np.asarray([32000]), sample_rate=[32000], path=[None],
        seek_time=[None])

    tokenized = provider.tokenize([attrs])
    tensors = provider(params, tokenized)
    assert set(tensors) == {'description', 'chords', 'melody', 'self_wav'}
    chords_emb, chords_mask = tensors['chords']
    assert chords_emb.shape == (1, 50, 8)
    melody_emb, _ = tensors['melody']
    assert melody_emb.shape == (1, 50, 8)
    drums_emb, _ = tensors['self_wav']
    assert drums_emb.shape[-1] == 8


def test_flow_matching_generate():
    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    model = FlowMatchingModel(fuser=fuser, dim=32, num_heads=4, num_layers=4,
                              flow_dim=16, chords_dim=8, hidden_scale=2,
                              time_embedding_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    B, T = 1, 20
    cond = {
        'description': (jnp.zeros((2 * B, 4, 32)), jnp.ones((2 * B, 4), jnp.int32)),
        'chords': (jax.random.normal(jax.random.PRNGKey(1), (2 * B, T, 8)),
                   jnp.ones((2 * B, T), jnp.int32)),
    }
    latents = model.generate(params, jax.random.PRNGKey(2), cond,
                             cfg_weights=(1.5, -0.5), num_samples=B,
                             max_gen_len=T, euler_steps=4)
    assert latents.shape == (B, T, 16)
    assert np.isfinite(np.asarray(latents)).all()

    # heun integration also works
    latents2 = model.generate(params, jax.random.PRNGKey(2), cond,
                              cfg_weights=(1.5, -0.5), num_samples=B,
                              max_gen_len=T, euler_steps=2, method='heun')
    assert latents2.shape == (B, T, 16)


def test_dopri5_agrees_with_fine_euler():
    """Adaptive dopri5 vs 400-step Euler on the debug flow model
    (reference flow_matching.py:478-514 odeint path)."""
    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    model = FlowMatchingModel(fuser=fuser, dim=32, num_heads=4, num_layers=4,
                              flow_dim=16, chords_dim=8, hidden_scale=2,
                              time_embedding_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    B, T = 1, 20
    cond = {
        'description': (jnp.zeros((2 * B, 4, 32)), jnp.ones((2 * B, 4), jnp.int32)),
        'chords': (jax.random.normal(jax.random.PRNGKey(1), (2 * B, T, 8)),
                   jnp.ones((2 * B, T), jnp.int32)),
    }
    kw = dict(cfg_weights=(1.5, -0.5), num_samples=B, max_gen_len=T)
    fine = model.generate(params, jax.random.PRNGKey(2), cond,
                          euler_steps=400, **kw)
    adaptive = model.generate(params, jax.random.PRNGKey(2), cond,
                              method='dopri5', ode_atol=1e-5, ode_rtol=1e-5,
                              **kw)
    assert adaptive.shape == fine.shape
    scale = np.abs(np.asarray(fine)).max()
    diff = np.abs(np.asarray(adaptive) - np.asarray(fine)).max()
    assert diff / scale < 5e-3, (diff, scale)
    # and it must jit (one compiled program, fixed shapes)
    jitted = jax.jit(lambda k: model.generate(params, k, cond,
                                              method='dopri5', **kw))
    out = jitted(jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(adaptive),
                               atol=1e-5)
