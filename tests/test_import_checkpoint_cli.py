"""Import-checkpoint CLI: torch export layout -> our checkpoint directory."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oracle import ref_module, to_np, to_torch


def test_import_compression_checkpoint_cli(tmp_path):
    """Round-trip a torch-exported debug codec through the CLI and verify
    token parity of the loaded checkpoint."""
    import torch
    from audiocraft_tpu.apps.import_checkpoint import main as import_main
    from audiocraft_tpu.ckpt.io import load_checkpoint

    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(23)
    ref = ref_builders.get_debug_compression_model(sample_rate=32000)
    # the reference export convention (utils/export.py:20-79)
    ckpt_file = tmp_path / "compression_state_dict.bin"
    torch.save({'best_state': ref.state_dict(), 'xp.cfg': {},
                'version': '1.3', 'exported': True}, ckpt_file)

    out_dir = tmp_path / "converted"
    import_main(['compression', str(ckpt_file), '--out', str(out_dir),
                 '--config', 'debug'])

    model, params, meta = load_checkpoint(out_dir)
    params = jax.tree.map(jnp.asarray, params)
    wav = np.random.RandomState(0).randn(1, 1, 32000).astype(np.float32) * 0.2
    with torch.no_grad():
        codes_ref = to_np(ref.encode(to_torch(wav))[0])
    codes, _ = model.encode(params, jnp.asarray(wav))
    assert (np.asarray(codes) == codes_ref).all()


def test_import_lm_checkpoint_carries_conditioner_weights(tmp_path, capsys):
    """Published LM state dicts include the trained conditioner parameters
    (condition_provider.conditioners.<name>.{embed,output_proj}); the import
    CLI must carry them into the checkpoint (advisor round-1 high finding)
    and the loaded model's conditioner forward must match the reference."""
    import torch
    from audiocraft_tpu.apps.import_checkpoint import main as import_main
    from audiocraft_tpu.ckpt.io import load_checkpoint

    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(11)
    ref_lm = ref_builders.get_debug_lm_model()
    ckpt_file = tmp_path / "state_dict.bin"
    torch.save({'best_state': ref_lm.state_dict()}, ckpt_file)

    out_dir = tmp_path / "converted_lm"
    import_main(['lm', str(ckpt_file), '--out', str(out_dir),
                 '--size', 'debug'])

    bundle, params, meta = load_checkpoint(out_dir)
    lm, provider = bundle['lm'], bundle['condition_provider']
    assert meta['extra']['unmapped_keys'] == []

    ref_cond = ref_lm.condition_provider.conditioners['description']
    cond_params = params['condition_provider']['description']
    assert np.allclose(cond_params['embed'],
                       to_np(ref_cond.embed.weight))
    assert np.allclose(cond_params['output_proj']['weight'],
                       to_np(ref_cond.output_proj.weight))
    assert np.allclose(cond_params['output_proj']['bias'],
                       to_np(ref_cond.output_proj.bias))

    # embed parity on identical token ids (the reference tokenizer needs
    # spacy, absent here; token-level parity is covered by cond tests)
    texts = ["whistling with wind blowing", "drum and bass beat with strings"]
    cond = provider.as_dict['description']
    tokens, mask = cond.tokenize(texts)
    ours, our_mask = cond(jax.tree.map(
        jnp.asarray, params['condition_provider'])['description'],
        (tokens, mask))
    with torch.no_grad():
        theirs, their_mask = ref_cond((to_torch(np.asarray(tokens)),
                                       to_torch(np.asarray(mask))))
    assert np.allclose(np.asarray(ours), to_np(theirs), atol=1e-5)
    assert (np.asarray(our_mask) == to_np(their_mask)).all()

    # greedy generate through the imported checkpoint (CFG batch-doubling:
    # conditioned rows then nullified rows)
    lm_params = jax.tree.map(jnp.asarray, params['lm'])
    cond_b = jnp.concatenate([jnp.asarray(ours),
                              jnp.zeros_like(jnp.asarray(ours))])
    mask_b = jnp.concatenate([jnp.asarray(our_mask),
                              jnp.zeros_like(jnp.asarray(our_mask))])
    cond_tensors = {'description': (cond_b, mask_b)}
    tokens = lm.generate(lm_params, jax.random.PRNGKey(0),
                         condition_tensors=cond_tensors, num_samples=2,
                         max_gen_len=8, use_sampling=False, cfg_coef=3.0)
    assert np.asarray(tokens).shape == (2, 4, 8)


def test_get_pretrained_dispatch(tmp_path):
    """ckpt.loaders.get_pretrained resolves names to imported checkpoint
    dirs (reference loaders.py:40-90 + musicgen.py:100-143)."""
    import torch
    from audiocraft_tpu.apps.import_checkpoint import main as import_main
    from audiocraft_tpu.ckpt import loaders

    ref_builders = ref_module("audiocraft.models.builders")
    torch.manual_seed(7)
    ref_codec = ref_builders.get_debug_compression_model(sample_rate=32000)
    ref_lm = ref_builders.get_debug_lm_model()
    codec_file = tmp_path / "compression_state_dict.bin"
    lm_file = tmp_path / "state_dict.bin"
    torch.save({'best_state': ref_codec.state_dict()}, codec_file)
    torch.save({'best_state': ref_lm.state_dict()}, lm_file)

    model_dir = tmp_path / "cache" / "facebook--musicgen-small"
    import_main(['compression', str(codec_file), '--config', 'debug',
                 '--out', str(model_dir / 'compression')])
    import_main(['lm', str(lm_file), '--size', 'debug',
                 '--out', str(model_dir / 'lm')])

    cache = str(tmp_path / "cache")
    assert loaders.resolve_checkpoint_dir('small', cache) == model_dir
    assert loaders.resolve_checkpoint_dir('facebook/musicgen-small',
                                          cache) == model_dir
    assert loaders.resolve_checkpoint_dir('large', cache) is None
    assert loaders.list_local_models(cache) == ['debug',
                                                'facebook--musicgen-small']

    model = loaders.get_pretrained('small', cache)
    assert model.lm.card == 400
    assert model.compression_model.sample_rate == 32000
    # cached switching: same object back, debug model buildable
    loaders.clear_model_cache()
    m1 = loaders.load_model('small', cache)
    assert loaders.load_model('small', cache) is m1
    assert loaders.load_model('debug', cache) is not m1
    loaders.clear_model_cache()

    with pytest.raises(FileNotFoundError):
        loaders.get_pretrained('melody', cache)


def test_style_conditioner_import_roundtrip(tmp_path):
    """Style-model conditioner internals (embedding list, transformer, RVQ
    bottleneck, batch-norm stats — reference conditioners.py:762-1003) import
    bit-exact from the torch naming, via the CLI-equivalent path."""
    from audiocraft_tpu.builders import get_debug_compression_model
    from audiocraft_tpu.ckpt.torch_import import (KeyTracker,
                                                  import_conditioners,
                                                  merge_params)
    from audiocraft_tpu.cond.conditioners import ConditioningProvider
    from audiocraft_tpu.cond.style_cond import StyleConditioner

    codec = get_debug_compression_model(32000)
    cond = StyleConditioner(feat_extractor=codec, output_dim=32,
                            transformer_scale='default')
    provider = ConditioningProvider.from_dict({'self_wav': cond})
    params = provider.init(jax.random.PRNGKey(2))
    sp = params['self_wav']

    # synthesize the reference torch naming from our param tree
    sd = {}
    base = 'condition_provider.conditioners.self_wav'
    for k in range(sp['embed'].shape[0]):
        sd[f'{base}.embed.{k}.weight'] = np.asarray(sp['embed'][k])
    sd[f'{base}.output_proj.weight'] = np.asarray(sp['output_proj']['weight'])
    sd[f'{base}.output_proj.bias'] = np.asarray(sp['output_proj']['bias'])
    for i, (lname, lp) in enumerate(sorted(sp['transformer'].items())):
        tb = f'{base}.transformer.layers.{i}'
        sd[f'{tb}.self_attn.in_proj_weight'] = np.asarray(
            lp['self_attn']['in_proj_weight'])
        sd[f'{tb}.self_attn.out_proj.weight'] = np.asarray(
            lp['self_attn']['out_proj']['weight'])
        for part in ('norm1', 'norm2', 'linear1', 'linear2'):
            for wb in lp[part]:
                sd[f'{tb}.{part}.{wb}'] = np.asarray(lp[part][wb])
    rvq = sp['rvq']
    rvq = rvq if isinstance(rvq, dict) else rvq.__dict__
    for q in range(np.asarray(rvq['embed']).shape[0]):
        qb = f'{base}.rvq.vq.layers.{q}._codebook'
        sd[f'{qb}.embed'] = np.asarray(rvq['embed'][q])
        sd[f'{qb}.cluster_size'] = np.asarray(rvq['cluster_size'][q])
        sd[f'{qb}.embed_avg'] = np.asarray(rvq['embed_avg'][q])
        sd[f'{qb}.inited'] = np.asarray(rvq['inited'][q])
    sd[f'{base}.batch_norm.running_mean'] = np.asarray(sp['bn']['mean'])
    sd[f'{base}.batch_norm.running_var'] = np.asarray(sp['bn']['var'])

    tracker = KeyTracker(sd)
    imported = import_conditioners(provider, tracker)
    assert tracker.unused() == []
    merged = merge_params(jax.tree.map(np.asarray, params),
                          imported)['self_wav']
    for key in ('embed', 'output_proj', 'bn'):
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(merged[key])[0]),
            np.asarray(jax.tree.leaves(jax.tree.map(np.asarray,
                                                    sp[key]))[0]))
    got = merged['transformer']['layer0']['self_attn']['in_proj_weight']
    np.testing.assert_array_equal(
        got, np.asarray(sp['transformer']['layer0']['self_attn']
                        ['in_proj_weight']))


def test_facade_set_style_conditioner_params():
    from audiocraft_tpu.builders import (get_debug_compression_model,
                                         get_debug_musicgen_lm)
    from audiocraft_tpu.cond.conditioners import ConditioningProvider
    from audiocraft_tpu.cond.style_cond import StyleConditioner
    from audiocraft_tpu.gen.musicgen import MusicGen

    codec = get_debug_compression_model(32000)
    lm, _ = get_debug_musicgen_lm()
    style = StyleConditioner(feat_extractor=codec, output_dim=16,
                             transformer_scale='none')
    provider = ConditioningProvider.from_dict({'self_wav': style})
    mg = MusicGen(name='style-test', compression_model=codec,
                  codec_params={}, lm=lm, lm_params={},
                  condition_provider=provider, cond_params={})
    mg.set_style_conditioner_params(eval_q=5, excerpt_length=2.0)
    updated = mg.condition_provider.as_dict['self_wav']
    assert updated.eval_q == 5 and updated.length == 2.0

    mg2 = MusicGen(name='plain', compression_model=codec, codec_params={},
                   lm=lm, lm_params={},
                   condition_provider=ConditioningProvider.from_dict({}),
                   cond_params={})
    with pytest.raises(RuntimeError):
        mg2.set_style_conditioner_params()
