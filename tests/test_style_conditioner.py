"""StyleConditioner: excerpt -> codec tokens -> transformer -> RVQ bottleneck."""

import numpy as np
import jax

from audiocraft_tpu.builders import get_debug_compression_model
from audiocraft_tpu.cond.attributes import WavCondition, nullify_wav
from audiocraft_tpu.cond.style_cond import StyleConditioner


def _make():
    codec = get_debug_compression_model(32000)
    codec_params = codec.init(jax.random.PRNGKey(0))
    cond = StyleConditioner(
        feat_extractor=codec, output_dim=24, sample_rate=32000,
        encodec_n_q=2, length=0.5, transformer_scale='xsmall',
        ds_factor=2, n_q_out=4, eval_q=2, bins=64,
        use_middle_of_segment=True, ds_rate_compression=codec.encoder.hop_length,
        num_codebooks_lm=4)
    params = cond.init(jax.random.PRNGKey(1), codec_params)
    return cond, params


def test_style_conditioner_shapes():
    cond, params = _make()
    B, T = 2, 32000
    x = WavCondition(
        wav=np.random.RandomState(0).randn(B, 1, T).astype(np.float32) * 0.1,
        length=np.asarray([T, T]), sample_rate=[32000, 32000],
        path=[None, None], seek_time=[None, None])
    embeds, mask = cond(params, x, key=jax.random.PRNGKey(2))
    assert embeds.shape[0] == B and embeds.shape[-1] == 24
    assert mask.shape == embeds.shape[:2]
    assert np.isfinite(np.asarray(embeds)).all()


def test_style_conditioner_nullified():
    cond, params = _make()
    x = WavCondition(wav=np.zeros((2, 1, 100), np.float32),
                     length=np.asarray([100, 100]),
                     sample_rate=[32000, 32000], path=[None, None],
                     seek_time=[None, None])
    null = nullify_wav(x)
    embeds, mask = cond(params, null)
    assert embeds.shape[:2] == (2, 1)
    assert (np.asarray(mask) == 0).all()
    assert (np.asarray(embeds) == 0).all()


def test_style_conditioner_eval_q_changes_bottleneck():
    cond, params = _make()
    x = WavCondition(
        wav=np.random.RandomState(3).randn(1, 1, 32000).astype(np.float32) * 0.1,
        length=np.asarray([32000]), sample_rate=[32000], path=[None],
        seek_time=[None])
    e2, _ = cond(params, x)
    e1, _ = cond.with_params(eval_q=1)(params, x)
    assert not np.allclose(np.asarray(e1), np.asarray(e2)), \
        "different numbers of active RVQ streams must change the conditioning"


def test_excerpt_mask():
    cond, params = _make()
    T = 32000
    x = WavCondition(wav=np.zeros((1, 1, T), np.float32),
                     length=np.asarray([T]), sample_rate=[32000],
                     path=[None], seek_time=[None])
    mask = cond.excerpt_mask(x, start=0)
    hop = cond.ds_rate_compression
    assert mask.shape == (1, 4, T // hop)
    assert (~mask[:, :, :int(0.5 * 32000) // hop]).all()
