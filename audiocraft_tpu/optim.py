"""Optimizers, LR schedules, and parameter EMA for the training loops.

The reference fork stripped the upstream training stack (SURVEY.md ground
facts: ``audiocraft/optim/`` — cosine/inverse-sqrt/polynomial LR schedulers,
the ``ModuleDictEMA`` weight averager the exporter reads — is absent from the
tree).  This module rebuilds that role TPU-first on optax:

* schedules are pure ``step -> lr`` functions usable directly as optax
  learning rates (one jitted program regardless of step — no host-side LR
  mutation, unlike the torch ``LRScheduler.step()`` protocol);
* the weight EMA is a pytree map (``jax.tree.map`` lerp) that runs as one
  fused jitted op per update, replacing the module-dict walk.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import optax

__all__ = ['cosine_schedule', 'inverse_sqrt_schedule', 'linear_warmup',
           'polynomial_decay_schedule', 'get_lr_schedule', 'make_optimizer',
           'ema_update']

Schedule = tp.Callable[[jnp.ndarray], jnp.ndarray]


def linear_warmup(base_lr: float, warmup_steps: int) -> Schedule:
    """lr ramps 0 -> base_lr over ``warmup_steps`` then holds."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps <= 0:
            return jnp.full_like(step, base_lr)
        return base_lr * jnp.minimum(1.0, (step + 1) / warmup_steps)
    return fn


def cosine_schedule(base_lr: float, warmup_steps: int, total_steps: int,
                    lr_min_ratio: float = 0.0,
                    cycle_length: float = 1.0) -> Schedule:
    """Linear warmup then cosine decay to ``lr_min_ratio * base_lr`` at
    ``total_steps`` (half a cosine cycle scaled by ``cycle_length``)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step + 1) / max(warmup_steps, 1)
        progress = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = lr_min_ratio + (1 - lr_min_ratio) * 0.5 * (
            1 + jnp.cos(math.pi * progress / cycle_length))
        return base_lr * jnp.where(step < warmup_steps,
                                   jnp.minimum(warm, 1.0), cos)
    return fn


def inverse_sqrt_schedule(base_lr: float, warmup_steps: int) -> Schedule:
    """Linear warmup then ``base_lr * sqrt(warmup / step)`` decay (the
    transformer-paper schedule)."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        decay = base_lr * jnp.sqrt(max(warmup_steps, 1)
                                   / jnp.maximum(step + 1, 1.0))
        return jnp.where(step < warmup_steps, warm, decay)
    return fn


def polynomial_decay_schedule(base_lr: float, warmup_steps: int,
                              total_steps: int, end_lr: float = 0.0,
                              power: float = 1.0) -> Schedule:
    """Linear warmup then polynomial decay to ``end_lr`` at ``total_steps``."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        progress = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        progress = jnp.clip(progress, 0.0, 1.0)
        decay = (base_lr - end_lr) * (1 - progress) ** power + end_lr
        return jnp.where(step < warmup_steps, warm, decay)
    return fn


def get_lr_schedule(name: tp.Optional[str], base_lr: float,
                    warmup_steps: int = 0, total_steps: int = 1,
                    **kw) -> tp.Union[float, Schedule]:
    """Name -> schedule dispatch ('cosine', 'inverse_sqrt', 'polynomial',
    'linear_warmup', None/'constant' -> plain float)."""
    if name is None or name == 'constant':
        return base_lr
    if name == 'cosine':
        return cosine_schedule(base_lr, warmup_steps, total_steps, **kw)
    if name == 'inverse_sqrt':
        return inverse_sqrt_schedule(base_lr, warmup_steps)
    if name == 'polynomial':
        return polynomial_decay_schedule(base_lr, warmup_steps, total_steps,
                                         **kw)
    if name == 'linear_warmup':
        return linear_warmup(base_lr, warmup_steps)
    raise ValueError(f"unknown lr schedule {name!r}")


def make_optimizer(name: str = 'adamw',
                   lr: tp.Union[float, Schedule] = 3e-4,
                   betas: tp.Tuple[float, float] = (0.9, 0.95),
                   eps: float = 1e-8, weight_decay: float = 0.0,
                   max_grad_norm: tp.Optional[float] = None
                   ) -> optax.GradientTransformation:
    """adam/adamw with optional gradient clipping, accepting a constant or
    scheduled learning rate."""
    if name == 'adam':
        opt = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif name == 'adamw':
        opt = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if max_grad_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
    return opt


def ema_update(ema_params, params, decay: float):
    """One EMA step over a whole param pytree: ema = decay*ema + (1-d)*p.

    The role of the stripped ``ModuleDictEMA`` (whose state the reference
    exporter reads as ``best_state``): keep an averaged copy of the
    generator weights for export/eval while raw weights keep training.
    Integer/bool leaves (none in practice) pass through untouched.
    """
    def lerp(e, p):
        if not jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating):
            return p
        return e * decay + p.astype(jnp.asarray(e).dtype) * (1.0 - decay)
    return jax.tree.map(lerp, ema_params, params)
