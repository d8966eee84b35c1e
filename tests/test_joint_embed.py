"""Joint-embedding (CLAP-machinery) conditioner tests with a fake embed fn."""

import numpy as np
import jax

from audiocraft_tpu.cond.attributes import JointEmbedCondition
from audiocraft_tpu.cond.joint_embed import (JointEmbeddingConditioner,
                                             windowed_average_embedding)


def _fake_embed(x: JointEmbedCondition):
    B = x.wav.shape[0]
    embeds = np.stack([np.full(16, float(x.wav[i].mean()) + i)
                       for i in range(B)])
    empty_idx = [i for i in range(B) if x.wav.shape[-1] <= 1]
    return embeds.astype(np.float32), empty_idx


def _cond(B=2, T=1000):
    return JointEmbedCondition(
        wav=np.random.RandomState(0).randn(B, 1, T).astype(np.float32),
        text=["a"] * B, length=np.full(B, T), sample_rate=[48000] * B,
        path=[None] * B, seek_time=[None] * B)


def test_joint_embed_quantized():
    cond = JointEmbeddingConditioner(dim=16, output_dim=24, quantize=True,
                                     n_q=4, bins=32, embed_fn=_fake_embed)
    params = cond.init(jax.random.PRNGKey(0))
    tokenized = cond.tokenize(_cond())
    out, mask = cond(params, tokenized)
    assert out.shape == (2, 1, 24)
    assert np.asarray(mask).shape == (2, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_joint_embed_empty_inputs_masked():
    cond = JointEmbeddingConditioner(dim=16, output_dim=8, quantize=False,
                                     embed_fn=_fake_embed)
    params = cond.init(jax.random.PRNGKey(1))
    x = _cond(B=2, T=1)  # nullified wavs -> empty
    out, mask = cond(params, cond.tokenize(x))
    assert (np.asarray(mask) == 0).all()
    assert (np.asarray(out) == 0).all()


def test_text_p_swaps_embedding():
    def text_embed(x):
        return np.full((x.wav.shape[0], 16), 99.0, np.float32), []

    cond = JointEmbeddingConditioner(dim=16, output_dim=8, quantize=False,
                                     text_p=1.0, embed_fn=_fake_embed,
                                     text_embed_fn=text_embed)
    embeds, _ = cond.tokenize(_cond(), key=jax.random.PRNGKey(0),
                              training=True)
    assert (embeds == 99.0).all()
    embeds_eval, _ = cond.tokenize(_cond(), training=False)
    assert not (embeds_eval == 99.0).all()


def test_windowed_average_embedding():
    calls = []

    def clip_embed(w):
        calls.append(w.shape[-1])
        return np.full(4, w.mean(), np.float32)

    wav = np.concatenate([np.zeros(100), np.ones(100)]).astype(np.float32)
    out = windowed_average_embedding(clip_embed, wav, max_frames=100, stride=50)
    assert len(calls) >= 2
    assert out.shape == (4,)
    # averaging across windows spans both halves
    assert 0.0 < out[0] < 1.0


def test_clap_backend_end_to_end():
    """The CLAP seam filled with a live transformers ClapModel (random
    weights): embed_fn drives the JointEmbeddingConditioner end to end."""
    import numpy as np
    import torch
    from transformers import ClapConfig, ClapModel

    from audiocraft_tpu.cond.attributes import JointEmbedCondition
    from audiocraft_tpu.cond.clap import make_clap_embed_fns
    from audiocraft_tpu.cond.joint_embed import JointEmbeddingConditioner

    torch.manual_seed(0)
    cfg = ClapConfig()
    cfg.text_config.num_hidden_layers = 1
    clap = ClapModel(cfg).eval()
    embed_fn, _ = make_clap_embed_fns(clap)

    dim = clap.config.projection_dim
    cond = JointEmbeddingConditioner(dim=dim, output_dim=16, embed_fn=embed_fn)
    params = cond.init(jax.random.PRNGKey(0))

    wav = np.random.RandomState(0).randn(2, 1, 32000).astype(np.float32) * 0.1
    x = JointEmbedCondition(wav, [None, None], np.array([32000, 1]),
                            sample_rate=[32000, 32000], path=[None, None],
                            seek_time=[0.0, 0.0])
    tokenized = cond.tokenize(x)
    embeds, mask = cond(params, tokenized)
    assert embeds.shape[0] == 2
    assert np.isfinite(np.asarray(embeds)).all()
    # entry 1 had length<=1 (nullified) -> masked out
    assert np.asarray(mask)[1].sum() == 0
