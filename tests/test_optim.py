"""LR schedules, weight EMA, and full training-state save/resume (the role
of the upstream optim/ package + solver checkpoint.th the fork stripped)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from audiocraft_tpu.optim import (cosine_schedule, ema_update,
                                  get_lr_schedule, inverse_sqrt_schedule,
                                  linear_warmup, make_optimizer,
                                  polynomial_decay_schedule)
from audiocraft_tpu.ckpt.train_state import (has_train_state,
                                             load_train_state,
                                             save_train_state)


def test_cosine_schedule_shape():
    fn = cosine_schedule(1.0, warmup_steps=10, total_steps=110,
                         lr_min_ratio=0.1)
    # warmup ramp
    assert float(fn(0)) == pytest.approx(0.1)
    assert float(fn(4)) == pytest.approx(0.5)
    # peak right after warmup
    assert float(fn(10)) == pytest.approx(1.0, abs=1e-3)
    # cosine midpoint and floor
    assert float(fn(60)) == pytest.approx(0.55, abs=1e-2)
    assert float(fn(110)) == pytest.approx(0.1, abs=1e-3)
    assert float(fn(1000)) == pytest.approx(0.1, abs=1e-3)  # clamped


def test_inverse_sqrt_schedule():
    fn = inverse_sqrt_schedule(2.0, warmup_steps=100)
    assert float(fn(49)) == pytest.approx(1.0)
    assert float(fn(399)) == pytest.approx(2.0 * np.sqrt(100 / 400))


def test_polynomial_and_linear_warmup():
    fn = polynomial_decay_schedule(1.0, warmup_steps=0, total_steps=100,
                                   end_lr=0.0, power=1.0)
    assert float(fn(50)) == pytest.approx(0.5)
    lw = linear_warmup(1.0, warmup_steps=4)
    assert float(lw(1)) == pytest.approx(0.5)
    assert float(lw(100)) == pytest.approx(1.0)


def test_get_lr_schedule_dispatch_and_optimizer():
    assert get_lr_schedule(None, 3e-4) == 3e-4
    fn = get_lr_schedule('cosine', 1e-3, warmup_steps=5, total_steps=50)
    assert callable(fn)
    with pytest.raises(ValueError):
        get_lr_schedule('nope', 1.0)
    # a scheduled adamw actually steps
    opt = make_optimizer('adamw', fn, weight_decay=0.01, max_grad_norm=1.0)
    params = {'w': jnp.ones((3,))}
    state = opt.init(params)
    updates, state = opt.update({'w': jnp.full((3,), 2.0)}, state, params)
    assert np.isfinite(np.asarray(updates['w'])).all()
    with pytest.raises(ValueError):
        make_optimizer('sgd9', 1.0)


def test_ema_update_math():
    ema = {'a': jnp.zeros((4,)), 'n': jnp.zeros((2,))}
    p = {'a': jnp.ones((4,)), 'n': jnp.full((2,), 3.0)}
    out = ema_update(ema, p, 0.9)
    np.testing.assert_allclose(np.asarray(out['a']), 0.1, rtol=1e-6)
    out2 = ema_update(out, p, 0.9)
    np.testing.assert_allclose(np.asarray(out2['a']), 0.19, rtol=1e-6)


def test_train_state_roundtrip(tmp_path):
    """optax state (nested namedtuples) survives save -> load-into-template;
    structure drift fails loudly."""
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    params = {'lin': {'w': jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                      'b': jnp.zeros((3,))}}
    state = opt.init(params)
    # take one real step so moments are nonzero
    grads = jax.tree.map(jnp.ones_like, params)
    _, state = opt.update(grads, state, params)
    tree = {'params': params, 'opt': state, 'key': jax.random.PRNGKey(7)}

    assert not has_train_state(tmp_path)
    save_train_state(tmp_path, tree, step=13, extra={'note': 'x'})
    assert has_train_state(tmp_path)

    template = {'params': jax.tree.map(jnp.zeros_like, params),
                'opt': opt.init(params), 'key': jax.random.PRNGKey(0)}
    loaded, step, extra = load_train_state(tmp_path, template)
    assert step == 13 and extra == {'note': 'x'}
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong structure: different leaf count
    with pytest.raises(ValueError, match='leaves'):
        load_train_state(tmp_path, {'params': params})
    # wrong shapes
    bad = {'params': {'lin': {'w': jnp.zeros((4, 3)), 'b': jnp.zeros((3,))}},
           'opt': opt.init(params), 'key': jax.random.PRNGKey(0)}
    with pytest.raises(ValueError, match='shape'):
        load_train_state(tmp_path, bad)


def test_train_encodec_resume_cli(tmp_path, capsys):
    """Interrupt-and-resume through the real CLI: 2 steps + save, then resume
    to 4; the resumed run continues from the saved optimizer/params."""
    from audiocraft_tpu.apps.train_encodec import main
    ckpt = str(tmp_path / 'run')
    main(['--synthetic', '--debug', '--steps', '2', '--batch', '8',
          '--segment', '0.25', '--ckpt', ckpt, '--save-every', '1',
          '--lr-schedule', 'cosine', '--warmup', '1',
          '--ema-decay', '0.5'])
    assert has_train_state(ckpt)
    main(['--synthetic', '--debug', '--steps', '4', '--batch', '8',
          '--segment', '0.25', '--ckpt', ckpt, '--save-every', '1',
          '--lr-schedule', 'cosine', '--warmup', '1',
          '--ema-decay', '0.5', '--resume'])
    out = capsys.readouterr().out
    assert 'resumed at step 2' in out
    from audiocraft_tpu.ckpt.io import load_checkpoint
    _, _, meta = load_checkpoint(ckpt)
    assert meta['extra']['weights'] == 'ema'
