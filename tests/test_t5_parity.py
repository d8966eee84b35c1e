"""JAX T5 encoder parity vs a randomly-initialized torch T5EncoderModel
(transformers is installed; no pretrained weights in this environment, so the
oracle is a random-config torch model with imported weights)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.nn.t5 import T5Encoder, T5EncoderConfig
from audiocraft_tpu.ckpt.torch_import import import_t5


def _torch_t5(gated: bool):
    import torch
    from transformers import T5Config, T5EncoderModel
    torch.manual_seed(0)
    cfg = T5Config(
        vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=3,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj='gated-gelu' if gated else 'relu',
        dropout_rate=0.0)
    model = T5EncoderModel(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_parity(gated):
    import torch
    ref = _torch_t5(gated)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = T5EncoderConfig(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                          num_layers=3, num_heads=4, gated_act=gated)
    ours = T5Encoder(cfg)
    params = jax.tree.map(jnp.asarray, import_t5(sd, cfg.num_layers, gated))

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 512, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        out_ref = ref(input_ids=torch.from_numpy(ids),
                      attention_mask=torch.from_numpy(mask)
                      ).last_hidden_state.numpy()

    out = np.asarray(ours(params, jnp.asarray(ids), jnp.asarray(mask)))
    # masked positions may differ (torch T5 computes them too); compare valid
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], out_ref[valid], atol=2e-4, rtol=1e-3)


def test_t5_conditioner_embeds():
    from audiocraft_tpu.cond.conditioners import T5Conditioner
    import torch
    ref = _torch_t5(False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # tiny custom config conditioner: build params manually
    cond = T5Conditioner(name='t5-small', output_dim=32)
    cfg = T5EncoderConfig(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                          num_layers=3, num_heads=4)
    t5_params = jax.tree.map(jnp.asarray, import_t5(sd, 3, False))
    params = {'t5': t5_params,
              'output_proj': {'weight': jnp.zeros((32, 64)).at[:, 0].set(1.0),
                              'bias': jnp.zeros((32,))}}
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 512, (2, 5)))
    mask = jnp.ones((2, 5), jnp.int32)
    # monkeypatch config resolution to the tiny config
    object.__setattr__(cond, '_test_cfg', cfg)
    embeds = cfg.model()(params['t5'], ids, mask)
    proj = embeds @ params['output_proj']['weight'].T
    assert proj.shape == (2, 5, 32)
    assert np.isfinite(np.asarray(proj)).all()
