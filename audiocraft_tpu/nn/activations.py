"""Activation functions and gated linear units.

Reference surface: ``/root/reference/audiocraft/modules/activations.py``
(CustomGLU / SwiGLU / GeGLU / ReGLU and ``get_activation_fn``).  Here these are
plain jittable functions; GLU splits happen on the last axis.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp


def elu(x: jax.Array, alpha: float = 1.0) -> jax.Array:
    return jax.nn.elu(x, alpha)


def glu_split(x: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
    assert x.shape[-1] % 2 == 0, "GLU input must have an even last dimension"
    return jnp.split(x, 2, axis=-1)


def glu(x: jax.Array) -> jax.Array:
    a, b = glu_split(x)
    return a * jax.nn.sigmoid(b)


def swiglu(x: jax.Array) -> jax.Array:
    a, b = glu_split(x)
    return a * jax.nn.silu(b)


def geglu(x: jax.Array) -> jax.Array:
    a, b = glu_split(x)
    return a * jax.nn.gelu(b, approximate=False)


def reglu(x: jax.Array) -> jax.Array:
    a, b = glu_split(x)
    return a * jax.nn.relu(b)


_ACTIVATIONS: tp.Dict[str, tp.Callable[[jax.Array], jax.Array]] = {
    'relu': jax.nn.relu,
    'gelu': lambda x: jax.nn.gelu(x, approximate=False),
    'elu': elu,
    'silu': jax.nn.silu,
    'glu': glu,
    'swiglu': swiglu,
    'geglu': geglu,
    'reglu': reglu,
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
}


def get_activation_fn(name: str) -> tp.Callable[[jax.Array], jax.Array]:
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise RuntimeError(f"activation should be one of {sorted(_ACTIVATIONS)}, not {name}")


def is_gated(name: str) -> bool:
    return name in ('glu', 'swiglu', 'geglu', 'reglu')
