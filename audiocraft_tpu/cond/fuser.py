"""Condition fuser: combine condition tensors into the LM input.

Functional re-design of ``/root/reference/audiocraft/modules/conditioners.py:1672-1763``.
Conditions arrive as ``{name: (tensor [B, T, C], mask [B, T])}``; the fuser
sums / prepends / routes to cross-attention per its static config.  The
streaming "prepend only on the first step" behavior (conditioners.py:1739-1741)
is an explicit ``first_step`` argument here.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from ..nn.transformer import create_sin_embedding

ConditionType = tp.Tuple[jax.Array, jax.Array]  # (tensor [B,T,C], mask [B,T])

FUSING_METHODS = ("sum", "prepend", "cross", "ignore", "input_interpolate")


@dataclasses.dataclass(frozen=True)
class ConditionFuser:
    fuse2cond: tp.Tuple[tp.Tuple[str, tp.Tuple[str, ...]], ...]
    cross_attention_pos_emb: bool = False
    cross_attention_pos_emb_scale: float = 1.0

    @classmethod
    def from_dict(cls, fuse2cond: tp.Dict[str, tp.List[str]], **kw) -> "ConditionFuser":
        assert all(k in FUSING_METHODS for k in fuse2cond)
        return cls(tuple((k, tuple(v)) for k, v in fuse2cond.items()), **kw)

    @property
    def cond2fuse(self) -> tp.Dict[str, str]:
        out = {}
        for method, conds in self.fuse2cond:
            for c in conds:
                out[c] = method
        return out

    def fuse_list(self, method: str) -> tp.Tuple[str, ...]:
        for m, conds in self.fuse2cond:
            if m == method:
                return conds
        return ()

    @property
    def has_prepend(self) -> bool:
        return len(self.fuse_list('prepend')) > 0

    def __call__(self, input: jax.Array,
                 conditions: tp.Dict[str, ConditionType],
                 first_step: bool = True
                 ) -> tp.Tuple[jax.Array, tp.Optional[jax.Array]]:
        cond2fuse = self.cond2fuse
        assert set(conditions.keys()).issubset(cond2fuse.keys()), \
            f"unknown conditions for fuser: {set(conditions) - set(cond2fuse)}"
        cross = None
        for name, (cond, _mask) in conditions.items():
            op = cond2fuse[name]
            if op == 'sum':
                input = input + cond
            elif op == 'input_interpolate':
                # linear resample of the condition over the input length
                # (reference uses F.interpolate(mode='nearest') default)
                T = input.shape[1]
                src_t = cond.shape[1]
                idx = (jnp.arange(T) * src_t) // T
                input = input + jnp.take(cond, idx, axis=1)
            elif op == 'prepend':
                if first_step:
                    input = jnp.concatenate([cond.astype(input.dtype), input], axis=1)
            elif op == 'cross':
                cross = cond if cross is None else jnp.concatenate([cross, cond], axis=1)
            elif op == 'ignore':
                continue
        if self.cross_attention_pos_emb and cross is not None:
            positions = jnp.arange(cross.shape[1]).reshape(1, -1, 1)
            pos_emb = create_sin_embedding(positions, cross.shape[-1])
            cross = cross + self.cross_attention_pos_emb_scale * pos_emb.astype(cross.dtype)
        return input, cross
