"""Distributed correctness on the virtual 8-device CPU mesh.

The north-star property (SURVEY §2.7): with the batch sharded over the
('data',) mesh and codebooks replicated, the RVQ EMA statistics reduce over
the data axis — sharded training must produce EXACTLY the same quantizer
state as the same global batch on one device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audiocraft_tpu.builders import get_debug_compression_model
from audiocraft_tpu.dist.mesh import make_mesh, lm_param_sharding, apply_sharding


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_sharded_ema_matches_single_device(eight_devices):
    model = get_debug_compression_model(32000)
    params = model.init(jax.random.PRNGKey(0))
    B = 8
    x = jnp.asarray(np.random.RandomState(0).randn(B, 1, 2560)
                    .astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(1)

    def train_forward(params, x):
        q_res, new_params = model.forward(params, x, key=key, training=True)
        return new_params['quantizer'], q_res.codes

    # single-device result (global batch)
    state1, codes1 = jax.jit(train_forward)(params, x)

    # 8-way data-parallel: identical jitted program, batch sharded
    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    x_s = jax.device_put(x, NamedSharding(mesh, P('data')))
    state8, codes8 = jax.jit(train_forward)(params_r, x_s)

    np.testing.assert_array_equal(np.asarray(codes1), np.asarray(codes8))
    np.testing.assert_allclose(np.asarray(state1.cluster_size),
                               np.asarray(state8.cluster_size),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state1.embed_avg),
                               np.asarray(state8.embed_avg),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state1.embed),
                               np.asarray(state8.embed),
                               atol=1e-5, rtol=1e-5)


def test_sharded_encode_matches_single_device(eight_devices):
    model = get_debug_compression_model(32000)
    params = model.init(jax.random.PRNGKey(0))
    B = 8
    x = jnp.asarray(np.random.RandomState(1).randn(B, 1, 3200)
                    .astype(np.float32) * 0.1)
    codes1, _ = jax.jit(lambda p, x: model.encode(p, x))(params, x)

    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    x_s = jax.device_put(x, NamedSharding(mesh, P('data')))
    codes8, _ = jax.jit(lambda p, x: model.encode(p, x))(params_r, x_s)
    np.testing.assert_array_equal(np.asarray(codes1), np.asarray(codes8))


def test_tensor_parallel_lm_forward_matches(eight_devices):
    """dp x tp sharded LM forward == replicated forward."""
    from audiocraft_tpu.cond.fuser import ConditionFuser
    from audiocraft_tpu.lm.model import LMModel
    from audiocraft_tpu.patterns import DelayedPatternProvider

    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    lm = LMModel(pattern_provider=DelayedPatternProvider(4), fuser=fuser,
                 n_q=4, card=64, dim=32, num_heads=4, num_layers=2,
                 cross_attention=True, causal=True, norm_first=True)
    params = lm.init(jax.random.PRNGKey(0))
    B, S, Tc = 4, 6, 3
    seq = jnp.asarray(np.random.RandomState(2).randint(0, 64, (B, 4, S)))
    cond = (jnp.asarray(np.random.RandomState(3).randn(B, Tc, 32)
                        .astype(np.float32)), jnp.ones((B, Tc), jnp.int32))

    logits1, _ = jax.jit(lambda p, s, c: lm.forward(p, s, {'description': c})
                         )(params, seq, cond)

    mesh = make_mesh(n_data=4, n_model=2, devices=eight_devices)
    shardings = lm_param_sharding(mesh, params)
    params_s = apply_sharding(params, shardings)
    seq_s = jax.device_put(seq, NamedSharding(mesh, P('data')))
    cond_s = (jax.device_put(cond[0], NamedSharding(mesh, P('data'))),
              jax.device_put(cond[1], NamedSharding(mesh, P('data'))))
    logits2, _ = jax.jit(lambda p, s, c: lm.forward(p, s, {'description': c})
                         )(params_s, seq_s, cond_s)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               atol=2e-5, rtol=1e-4)


def _tiny_lm(attn_kernel=False):
    from audiocraft_tpu.cond.fuser import ConditionFuser
    from audiocraft_tpu.lm.model import LMModel
    from audiocraft_tpu.patterns import DelayedPatternProvider

    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    return LMModel(pattern_provider=DelayedPatternProvider(4), fuser=fuser,
                   n_q=4, card=64, dim=32, num_heads=4, num_layers=2,
                   cross_attention=True, causal=True, norm_first=True,
                   attn_kernel=attn_kernel)


def _lm_batch(lm, B=8, S=6, Tc=3):
    codes = jnp.asarray(np.random.RandomState(4)
                        .randint(0, lm.card, (B, lm.n_q, S)))
    cond = jnp.asarray(np.random.RandomState(5).randn(B, Tc, lm.dim)
                       .astype(np.float32))
    return codes, {'description': (cond, jnp.ones((B, Tc), jnp.int32))}


@pytest.mark.parametrize('grad_accum', [1, 2])
def test_lm_dp_shardmap_matches_global_step(eight_devices, grad_accum):
    """The explicit shard_map dp step == the global-view GSPMD step (pmean'd
    grads vs GSPMD all-reduce; SGD so param agreement bounds grad error)."""
    import optax
    from audiocraft_tpu.dist.train import (make_lm_train_step,
                                           make_lm_train_step_dp)

    lm = _tiny_lm()
    params = lm.init(jax.random.PRNGKey(0))
    codes, ct = _lm_batch(lm, B=16)   # 2 rows/shard -> accum=2 microbatches
    opt = optax.sgd(1e-2)

    p1, s1, m1 = jax.jit(make_lm_train_step(lm, opt))(
        params, opt.init(params), codes, ct)

    mesh = make_mesh(n_data=8, n_model=1, devices=eight_devices)
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P('data'))
    params_r = jax.device_put(params, repl)
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, dsh), t)
    step_dp = jax.jit(make_lm_train_step_dp(lm, opt, mesh,
                                            grad_accum=grad_accum))
    p2, s2, m2 = step_dp(jax.device_put(params, repl),
                         jax.device_put(opt.init(params), repl),
                         put(codes), put(ct))
    np.testing.assert_allclose(float(m2['loss']), float(m1['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_lm_dp_shardmap_runs_flash_kernel(eight_devices, monkeypatch):
    """attn_kernel=True under the shard_map dp step: the Pallas flash kernel
    (TPU interpreter on CPU) runs per-shard and matches the einsum path —
    the multi-chip route for 30 s-segment training.  2-device mesh: the
    interpreter's backward emulation deadlocks across 8 virtual CPU devices
    (host-callback contention), and 2 already exercises kernel-under-
    shard_map + the grad pmean."""
    import optax
    from audiocraft_tpu.ops import attention_pallas
    from audiocraft_tpu.dist.train import make_lm_train_step_dp

    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(attention_pallas, 'INTERPRET', True)
    opt = optax.sgd(1e-2)
    codes, ct = _lm_batch(_tiny_lm())
    mesh = make_mesh(n_data=2, n_model=1, devices=eight_devices[:2])
    repl, dsh = NamedSharding(mesh, P()), NamedSharding(mesh, P('data'))
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, dsh), t)

    out = {}
    for kernel in (False, True):
        lm = _tiny_lm(attn_kernel=kernel)
        params = jax.device_put(lm.init(jax.random.PRNGKey(0)), repl)
        step = jax.jit(make_lm_train_step_dp(lm, opt, mesh))
        # the ctx must cover tracing: the flash VJP's backward kernel is
        # traced during grad transposition, outside fused_attention's body
        with pltpu.force_tpu_interpret_mode():
            p, s, m = step(params, jax.device_put(opt.init(params), repl),
                           put(codes), put(ct))
        out[kernel] = (p, float(m['loss']))
    np.testing.assert_allclose(out[True][1], out[False][1], rtol=1e-4)
    for a, b in zip(jax.tree.leaves(out[True][0]),
                    jax.tree.leaves(out[False][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)
