"""Quantizer base contract + DummyQuantizer (reference quantization/base.py).

``QuantizedResult`` lives in quant/vq.py as a flax pytree; this module adds the
abstract contract and the pass-through DummyQuantizer used by codec shape
tests (reference base.py:68-107, exercised by tests/models/test_encodec_model.py:32).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from .vq import QuantizedResult


class BaseQuantizer:
    """Abstract quantizer contract: forward -> QuantizedResult{x, codes,
    bandwidth, penalty, metrics}; encode/decode; codebook accounting."""

    def forward(self, state, x: jax.Array, frame_rate: float, **kwargs
                ) -> tp.Tuple[QuantizedResult, tp.Any]:
        raise NotImplementedError()

    def encode(self, state, x: jax.Array) -> jax.Array:
        raise NotImplementedError()

    def decode(self, state, codes: jax.Array) -> jax.Array:
        raise NotImplementedError()

    @property
    def total_codebooks(self) -> int:
        raise NotImplementedError()

    @property
    def num_codebooks(self) -> int:
        raise NotImplementedError()

    def set_num_codebooks(self, n: int):
        raise NotImplementedError()


@dataclasses.dataclass(frozen=True)
class DummyQuantizer(BaseQuantizer):
    """No-op quantizer: codes are the continuous latent itself."""

    n_q: int = 1
    bins: int = 1  # unused; keeps EncodecModel.cardinality meaningful
    dimension: int = 0

    def init(self, key: jax.Array) -> dict:
        return {}

    def forward(self, state, x: jax.Array, frame_rate: float, **kwargs
                ) -> tp.Tuple[QuantizedResult, tp.Any]:
        q = x[:, None]
        bw = jnp.asarray(q.size * 32 * frame_rate / 1000 / x.shape[0],
                         jnp.float32)
        return QuantizedResult(x=x, codes=q, bandwidth=bw,
                               penalty=jnp.zeros(())), state

    def encode(self, state, x: jax.Array) -> jax.Array:
        return x[:, None]

    def decode(self, state, codes: jax.Array) -> jax.Array:
        return codes[:, 0]

    @property
    def total_codebooks(self) -> int:
        return 1

    @property
    def num_codebooks(self) -> int:
        return 1

    @property
    def max_n_q(self) -> int:
        return 1

    def set_num_codebooks(self, n: int):
        raise AttributeError(
            "Cannot override the number of codebooks for the dummy quantizer")
