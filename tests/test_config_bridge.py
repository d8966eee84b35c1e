"""Reference-config bridge: xp.cfg dicts -> our dataclass models.

Published checkpoints embed the reference Hydra config (`xp.cfg`); the
bridge (audiocraft_tpu/config.py) must rebuild the SAME architecture our
hand-written builders describe, classify every non-architectural key, and
surface config drift loudly (round-2 verdict item: cross-check the
get_musicgen_lm fields against the shipped xp.cfg).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oracle import ref_module, to_np, to_torch

from audiocraft_tpu.config import (compression_model_from_cfg, diff_models,
                                   lm_from_cfg)


def encodec_32khz_cfg():
    """xp.cfg subtree as the published facebook/encodec_32khz export embeds
    it (schema per reference builders.py:56-91; values per loaders.py
    fallback + upstream config yamls)."""
    return {
        'compression_model': 'encodec',
        'device': 'cuda', 'dtype': 'float32',
        'encodec': {'autoencoder': 'seanet', 'quantizer': 'rvq',
                    'sample_rate': 32000, 'channels': 1, 'causal': False,
                    'renormalize': False},
        'seanet': {
            'dimension': 128, 'channels': 1, 'causal': False,
            'n_filters': 64, 'n_residual_layers': 1, 'ratios': [8, 5, 4, 4],
            'activation': 'ELU', 'activation_params': {'alpha': 1.0},
            'norm': 'weight_norm', 'norm_params': {},
            'kernel_size': 7, 'residual_kernel_size': 3,
            'last_kernel_size': 7, 'dilation_base': 2, 'pad_mode': 'reflect',
            'true_skip': True, 'compress': 2, 'lstm': 2,
            'disable_norm_outer_blocks': 0,
            'encoder': {},
            'decoder': {'trim_right_ratio': 1.0, 'final_activation': None,
                        'final_activation_params': None},
        },
        'rvq': {'n_q': 4, 'q_dropout': False, 'bins': 2048, 'decay': 0.99,
                'kmeans_init': True, 'kmeans_iters': 10,
                'threshold_ema_dead_code': 2.0,
                'orthogonal_reg_weight': 0.0,
                'orthogonal_reg_active_codes_only': False,
                'orthogonal_reg_max_codes': None},
    }


def musicgen_small_cfg():
    """xp.cfg subtree of a published musicgen-small LM export (schema per
    reference builders.py:136-254; field set from upstream
    config/model/lm/musicgen_lm.yaml, values = the small solver)."""
    return {
        'lm_model': 'transformer_lm',
        'device': 'cuda', 'dtype': 'float16',
        'transformer_lm': {
            'dim': 1024, 'num_heads': 16, 'num_layers': 24,
            'hidden_scale': 4, 'n_q': 4, 'card': 2048,
            'dropout': 0.0, 'emb_lr': None, 'activation': 'gelu',
            'norm_first': True, 'bias_ff': False, 'bias_attn': False,
            'bias_proj': False, 'past_context': None, 'causal': True,
            'custom': False, 'memory_efficient': True,
            'attention_as_float32': False, 'positional_embedding': 'sin',
            'xpos': False, 'checkpointing': 'none', 'weight_init': 'gaussian',
            'depthwise_init': 'current', 'zero_bias_init': True,
            'norm': 'layer_norm', 'cross_attention': False,
            'qk_layer_norm': False, 'qk_layer_norm_cross': False,
            'attention_dropout': None, 'kv_repeat': 1,
            'two_step_cfg': False, 'q_modeling': None,
        },
        'codebooks_pattern': {
            'modeling': 'delay',
            'delay': {'delays': [0, 1, 2, 3], 'flatten_first': 0,
                      'empty_initial': 0},
        },
        'conditioners': {
            'args': {'merge_text_conditions_p': 0.25, 'drop_desc_p': 0.5},
            'description': {'model': 't5',
                            't5': {'name': 't5-base', 'finetune': False,
                                   'word_dropout': 0.3,
                                   'normalize_text': False}},
        },
        'fuser': {'cross_attention_pos_emb': False,
                  'cross_attention_pos_emb_scale': 1.0,
                  'sum': [], 'prepend': [], 'cross': ['description'],
                  'input_interpolate': []},
        'classifier_free_guidance': {'training_dropout': 0.3,
                                     'inference_coef': 3.0},
        'attribute_dropout': {'args': {'active_on_eval': False},
                              'text': {}, 'wav': {'self_wav': 1.0}},
        'dataset': {'segment_duration': 30},
    }


def test_compression_cfg_matches_32khz_builder():
    """The embedded encodec_32khz xp.cfg must rebuild exactly the model
    get_encodec_32khz hardcodes — field-for-field (diff_models empty)."""
    from audiocraft_tpu.builders import get_encodec_32khz

    model, report = compression_model_from_cfg(encodec_32khz_cfg(),
                                               compute_dtype='bfloat16')
    assert report.unknown == {}
    fallback = get_encodec_32khz()
    assert diff_models(model, fallback) == []
    # encode path smoke: frame_rate derived from ratios, not hardcoded
    assert model.frame_rate == 50 and model.sample_rate == 32000


def test_lm_cfg_matches_small_builder():
    """The musicgen-small xp.cfg must rebuild exactly get_musicgen_lm('small')
    (the round-2 verdict cross-check), including the conditioning provider,
    fuser, and pattern provider."""
    from audiocraft_tpu.builders import get_musicgen_lm

    lm, provider, report = lm_from_cfg(musicgen_small_cfg())
    assert report.unknown == {}
    # training-only keys classified, not silently dropped
    assert 'classifier_free_guidance.training_dropout' in report.training_only
    assert 'conditioners.args.merge_text_conditions_p' in report.training_only
    assert 'transformer_lm.dropout' in report.training_only
    assert 'transformer_lm.memory_efficient' in report.runtime

    fb_lm, fb_provider = get_musicgen_lm('small')
    assert diff_models(lm, fb_lm) == []
    assert diff_models(provider, fb_provider) == []


def test_melody_cfg_builds_chroma_conditioner():
    cfg = musicgen_small_cfg()
    cfg['conditioners']['self_wav'] = {
        'model': 'chroma_stem',
        'chroma_stem': {'sample_rate': 32000, 'n_chroma': 12,
                        'radix2_exp': 12, 'argmax': True,
                        'match_len_on_eval': True, 'cache_path': None,
                        'eval_wavs': None, 'n_eval_wavs': 100},
    }
    cfg['fuser']['prepend'] = ['self_wav']
    lm, provider, report = lm_from_cfg(cfg)
    assert report.unknown == {}
    from audiocraft_tpu.cond.chroma_cond import ChromaConditioner
    cond = provider.as_dict['self_wav']
    assert isinstance(cond, ChromaConditioner)
    assert cond.n_chroma == 12 and cond.radix2_exp == 12
    assert cond.duration == 30.0  # from dataset.segment_duration
    assert lm.fuser.fuse_list('prepend') == ('self_wav',)


def test_unknown_keys_reported_and_strict_raises():
    cfg = musicgen_small_cfg()
    cfg['transformer_lm']['mystery_knob'] = 7
    lm, provider, report = lm_from_cfg(cfg)
    assert report.unknown == {'transformer_lm.mystery_knob': 7}
    with pytest.raises(ValueError, match='mystery_knob'):
        lm_from_cfg(cfg, strict=True)


def test_magnet_cfg_plumbing():
    """MAGNeT checkpoints route span_len/segment_duration from the masking
    and dataset subtrees (reference loaders.py:217-240)."""
    from audiocraft_tpu.lm.magnet import MagnetLMModel

    cfg = musicgen_small_cfg()
    cfg['lm_model'] = 'transformer_lm_magnet'
    cfg['transformer_lm'].update(subcodes_context=5, causal=False)
    cfg['codebooks_pattern'] = {'modeling': 'parallel', 'parallel': {}}
    cfg['masking'] = {'span_len': 3}
    cfg['dataset'] = {'segment_duration': 10}
    lm, provider, report = lm_from_cfg(cfg, compression_model_framerate=50)
    assert report.unknown == {}
    assert isinstance(lm, MagnetLMModel)
    assert lm.span_len == 3 and lm.segment_duration == 10
    assert lm.subcodes_context == 5 and not lm.causal


def test_cfg_diff_reports_drift():
    cfg = encodec_32khz_cfg()
    cfg['seanet']['n_filters'] = 32
    cfg['rvq']['bins'] = 1024
    from audiocraft_tpu.builders import get_encodec_32khz
    model, _ = compression_model_from_cfg(cfg, compute_dtype='bfloat16')
    delta = diff_models(model, get_encodec_32khz())
    joined = '\n'.join(delta)
    assert 'n_filters' in joined and 'bins' in joined
    assert len(delta) == 3  # encoder+decoder n_filters, quantizer bins


def test_import_cli_uses_embedded_compression_cfg(tmp_path):
    """End-to-end: a reference export whose xp.cfg describes the debug codec
    is imported WITHOUT --config hints; the model must be built from the
    embedded config and stay token-exact vs the reference."""
    import torch
    from audiocraft_tpu.apps.import_checkpoint import main as import_main
    from audiocraft_tpu.ckpt.io import load_checkpoint

    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(5)
    ref = ref_builders.get_debug_compression_model(sample_rate=32000)
    xp_cfg = {
        'compression_model': 'encodec',
        'encodec': {'autoencoder': 'seanet', 'quantizer': 'rvq',
                    'sample_rate': 32000, 'channels': 1, 'causal': False,
                    'renormalize': False},
        'seanet': {'dimension': 32, 'channels': 1, 'n_filters': 4,
                   'n_residual_layers': 1, 'ratios': [10, 8, 16],
                   'norm': 'none', 'encoder': {}, 'decoder': {}},
        'rvq': {'n_q': 4, 'bins': 400, 'kmeans_init': True},
    }
    ckpt_file = tmp_path / "compression_state_dict.bin"
    torch.save({'best_state': ref.state_dict(), 'xp.cfg': xp_cfg,
                'version': '1.3', 'exported': True}, ckpt_file)

    out_dir = tmp_path / "converted"
    # NOTE: --config left at its default ('32khz'); the embedded cfg must win
    import_main(['compression', str(ckpt_file), '--out', str(out_dir),
                 '--compute-dtype', 'float32'])

    model, params, meta = load_checkpoint(out_dir)
    assert model.encoder.n_filters == 4 and model.quantizer.bins == 400
    assert model.frame_rate == 25  # 32000 // (10*8*16)
    params = jax.tree.map(jnp.asarray, params)
    wav = np.random.RandomState(1).randn(1, 1, 32000).astype(np.float32) * 0.2
    with torch.no_grad():
        codes_ref = to_np(ref.encode(to_torch(wav))[0])
    codes, _ = model.encode(params, jnp.asarray(wav))
    assert (np.asarray(codes) == codes_ref).all()


def test_import_cli_uses_embedded_lm_cfg(tmp_path, capsys):
    """End-to-end LM import driven by the embedded xp.cfg (the debug LM
    architecture expressed in reference config schema): built model matches,
    weights import with zero unmapped keys, greedy generate runs."""
    import torch
    from audiocraft_tpu.apps.import_checkpoint import main as import_main
    from audiocraft_tpu.ckpt.io import load_checkpoint

    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(3)
    ref_lm = ref_builders.get_debug_lm_model()
    xp_cfg = {
        'lm_model': 'transformer_lm',
        'transformer_lm': {
            'dim': 16, 'num_heads': 4, 'num_layers': 2, 'hidden_scale': 4,
            'n_q': 4, 'card': 400, 'causal': True, 'norm_first': False,
            'activation': 'relu', 'cross_attention': True,
            'positional_embedding': 'sin',
        },
        'codebooks_pattern': {'modeling': 'delay',
                              'delay': {'delays': [0, 1, 2, 3]}},
        'conditioners': {
            'description': {'model': 'lut',
                            'lut': {'n_bins': 128, 'dim': 16,
                                    'tokenizer': 'whitespace'}},
        },
        'fuser': {'cross': ['description'], 'prepend': [], 'sum': [],
                  'input_interpolate': []},
        'classifier_free_guidance': {'training_dropout': 0.1,
                                     'inference_coef': 3.0},
        'dataset': {'segment_duration': 30},
    }
    ckpt_file = tmp_path / "state_dict.bin"
    torch.save({'best_state': ref_lm.state_dict(), 'xp.cfg': xp_cfg},
               ckpt_file)

    out_dir = tmp_path / "converted_lm"
    import_main(['lm', str(ckpt_file), '--out', str(out_dir)])

    bundle, params, meta = load_checkpoint(out_dir)
    lm, provider = bundle['lm'], bundle['condition_provider']
    assert meta['extra']['unmapped_keys'] == []
    assert lm.dim == 16 and lm.card == 400 and lm.num_layers == 2
    assert not lm.norm_first and lm.activation == 'relu'
    from audiocraft_tpu.cond.conditioners import LUTConditioner
    assert isinstance(provider.as_dict['description'], LUTConditioner)

    # conditioner weights travelled through the cfg-built provider
    ref_cond = ref_lm.condition_provider.conditioners['description']
    cond_params = params['condition_provider']['description']
    assert np.allclose(cond_params['output_proj']['weight'],
                       to_np(ref_cond.output_proj.weight))

    # greedy generate through the cfg-built model (CFG batch-doubling)
    cond = provider.as_dict['description']
    tok = cond.tokenize(["a calm piano piece"])
    cond_out, cond_mask = cond(jax.tree.map(
        jnp.asarray, params['condition_provider'])['description'], tok)
    cond_tensors = {'description': (
        jnp.concatenate([cond_out, jnp.zeros_like(cond_out)]),
        jnp.concatenate([cond_mask, jnp.zeros_like(cond_mask)]))}
    lm_params = jax.tree.map(jnp.asarray, params['lm'])
    tokens = lm.generate(lm_params, jax.random.PRNGKey(0),
                         condition_tensors=cond_tensors, num_samples=1,
                         max_gen_len=6, use_sampling=False)
    assert np.asarray(tokens).shape == (1, 4, 6)
