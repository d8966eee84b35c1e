"""Stereo support by per-channel encoding + codebook/timestep interleaving.

Counterpart of InterleaveStereoCompressionModel
(/root/reference/audiocraft/models/encodec.py:397-506).  The two channels run
through the mono codec as one doubled batch (a vmap-style layout XLA
parallelizes trivially) and codes interleave either on the codebook axis
``[B, 2K, T]`` or the timestep axis ``[B, K, 2T]``.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from .encodec import EncodecModel


@dataclasses.dataclass(frozen=True)
class InterleaveStereoCompressionModel:
    model: EncodecModel
    per_timestep: bool = False

    def __post_init__(self):
        assert self.model.channels == 1, \
            "Wrapped model is expected to be for monophonic audio"

    @property
    def total_codebooks(self) -> int:
        return self.model.total_codebooks

    @property
    def num_codebooks(self) -> int:
        """Number of codebooks *after* interleaving."""
        return (self.model.num_codebooks if self.per_timestep
                else self.model.num_codebooks * 2)

    def set_num_codebooks(self, n: int) -> "InterleaveStereoCompressionModel":
        return dataclasses.replace(self, model=self.model.set_num_codebooks(n))

    @property
    def num_virtual_steps(self) -> int:
        return 2 if self.per_timestep else 1

    @property
    def frame_rate(self) -> float:
        return self.model.frame_rate * self.num_virtual_steps

    @property
    def sample_rate(self) -> int:
        return self.model.sample_rate

    @property
    def channels(self) -> int:
        return 2

    @property
    def cardinality(self) -> int:
        return self.model.cardinality

    def init(self, key: jax.Array) -> dict:
        return self.model.init(key)

    def encode(self, params: dict, x: jax.Array
               ) -> tp.Tuple[jax.Array, tp.Optional[jax.Array]]:
        B, C, T = x.shape
        assert C == 2, f"Expecting stereo audio but audio num channels is {C}"
        # both channels as one batch of mono clips: [2B, 1, T]
        mono = jnp.concatenate([x[:, 0:1], x[:, 1:2]], axis=0)
        indices, scales = self.model.encode(params, mono)
        c0, c1 = indices[:B], indices[B:]
        stacked = jnp.stack([c0, c1], axis=0)  # [2, B, K, T]
        scale = None
        if scales is not None:
            scale = jnp.stack([scales[:B], scales[B:]], axis=1)
        if self.per_timestep:
            # 'c b k t -> b k (t c)'
            out = jnp.transpose(stacked, (1, 2, 3, 0)).reshape(
                B, stacked.shape[2], -1)
        else:
            # 'c b k t -> b (k c) t'
            out = jnp.transpose(stacked, (1, 2, 0, 3)).reshape(
                B, -1, stacked.shape[3])
        return out, scale

    def get_left_right_codes(self, codes: jax.Array
                             ) -> tp.Tuple[jax.Array, jax.Array]:
        B, K, T = codes.shape
        if self.per_timestep:
            # 'b k (t c) -> c b k t'
            stacked = jnp.transpose(codes.reshape(B, K, T // 2, 2), (3, 0, 1, 2))
        else:
            # 'b (k c) t -> c b k t'
            stacked = jnp.transpose(codes.reshape(B, K // 2, 2, T), (2, 0, 1, 3))
        return stacked[0], stacked[1]

    def decode(self, params: dict, codes: jax.Array,
               scale: tp.Optional[jax.Array] = None) -> jax.Array:
        B, K, T = codes.shape
        assert T % self.num_virtual_steps == 0
        assert K == self.num_codebooks
        codes_c0, codes_c1 = self.get_left_right_codes(codes)
        both = jnp.concatenate([codes_c0, codes_c1], axis=0)
        scales = None
        if scale is not None:
            assert scale.shape[0] == B and scale.shape[1] == 2
            scales = jnp.concatenate([scale[:, 0], scale[:, 1]], axis=0)
        audio = self.model.decode(params, both, scales)
        return jnp.concatenate([audio[:B], audio[B:]], axis=1)
