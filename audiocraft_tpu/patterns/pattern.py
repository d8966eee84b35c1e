"""Codebook interleaving patterns (delay / parallel / unrolled / coarse-first /
MusicLM) as static host-side metadata plus jittable gather ops.

Semantics match ``/root/reference/audiocraft/modules/codebooks_patterns.py``:
a pattern is, per sequence step, the list of (timestep, codebook) coordinates
emitted at that step; step 0 is empty so generation can start from a special
token.  ``build_pattern_sequence`` maps codes ``[B, K, T] -> [B, K, S]`` and
``revert_pattern_sequence`` inverts it; both are precomputed numpy index/mask
arrays applied with one ``take`` — the pattern itself never exists on device.

TPU notes: index arrays are pure static metadata per (T, n_q), LRU-cached on
host (reference: lru_cache at codebooks_patterns.py:53-54,293).  The gathers
compile to single XLA ops; S = T + max_delay + 1 is static so the LM decode
loop has a fixed trip count.
"""

from __future__ import annotations

import dataclasses
import typing as tp
from abc import ABC, abstractmethod
from collections import namedtuple
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

LayoutCoord = namedtuple("LayoutCoord", ["t", "q"])
PatternLayout = tp.List[tp.List[LayoutCoord]]


@dataclasses.dataclass
class Pattern:
    layout: PatternLayout
    timesteps: int
    n_q: int

    def __post_init__(self):
        assert len(self.layout) > 0
        self._validate_layout()
        self._sequence_indexes = lru_cache(100)(self._sequence_indexes_impl)
        self._revert_indexes = lru_cache(100)(self._revert_indexes_impl)

    def _validate_layout(self):
        """No multiple coords per codebook per step; per-codebook timesteps
        non-decreasing along the sequence (codebooks_patterns.py:57-76)."""
        q_timesteps = {q: 0 for q in range(self.n_q)}
        for s, seq_coords in enumerate(self.layout):
            if len(seq_coords) > 0:
                qs = set()
                for coord in seq_coords:
                    qs.add(coord.q)
                    last = q_timesteps[coord.q]
                    assert coord.t >= last, \
                        f"Past timesteps found for codebook {coord.q} at step {s}"
                    q_timesteps[coord.q] = coord.t
                assert len(qs) == len(seq_coords), \
                    f"Multiple entries for a same codebook at step {s}"

    # ---------------------------------------------------------------- props
    @property
    def num_sequence_steps(self) -> int:
        return len(self.layout) - 1

    @property
    def max_delay(self) -> int:
        max_t = 0
        for seq_coords in self.layout[1:]:
            for coord in seq_coords:
                max_t = max(max_t, coord.t + 1)
        return max_t - self.timesteps

    @property
    def valid_layout(self) -> PatternLayout:
        valid_step = len(self.layout) - self.max_delay
        return self.layout[:valid_step]

    def starts_with_special_token(self) -> bool:
        return self.layout[0] == []

    def get_sequence_coords_with_timestep(self, t: int, q: tp.Optional[int] = None):
        assert t <= self.timesteps
        coords = []
        for s, seq_codes in enumerate(self.layout):
            for code in seq_codes:
                if code.t == t and (q is None or code.q == q):
                    coords.append((s, code))
        return coords

    def get_steps_with_timestep(self, t: int, q: tp.Optional[int] = None) -> tp.List[int]:
        return [step for step, _ in self.get_sequence_coords_with_timestep(t, q)]

    def get_first_step_with_timesteps(self, t: int, q: tp.Optional[int] = None
                                      ) -> tp.Optional[int]:
        steps = self.get_steps_with_timestep(t, q)
        return steps[0] if steps else None

    # ------------------------------------------------------------- indexes
    def _sequence_indexes_impl(self, timesteps: int, keep_only_valid_steps: bool
                               ) -> tp.Tuple[np.ndarray, np.ndarray]:
        """[K, S] gather indexes into flattened-[K*T + 1] codes; last slot is
        the special token (codebooks_patterns.py:120-153)."""
        n_q = self.n_q
        assert timesteps <= self.timesteps
        ref_layout = self.valid_layout if keep_only_valid_steps else self.layout
        S = len(ref_layout)
        indexes = np.full((n_q, S), n_q * timesteps, dtype=np.int64)
        mask = np.zeros((n_q, S), dtype=bool)
        for s, seq_coords in enumerate(ref_layout):
            for coord in seq_coords:
                if coord.t < timesteps:
                    indexes[coord.q, s] = coord.t + coord.q * timesteps
                    mask[coord.q, s] = True
        return indexes, mask

    def _revert_indexes_impl(self, sequence_steps: int, keep_only_valid_steps: bool,
                             is_model_output: bool
                             ) -> tp.Tuple[np.ndarray, np.ndarray]:
        """[K, T] gather indexes into flattened-[K*S + 1] sequence
        (codebooks_patterns.py:181-223)."""
        n_q = self.n_q
        timesteps = self.timesteps
        ref_layout = self.valid_layout if keep_only_valid_steps else self.layout
        assert sequence_steps <= len(ref_layout), \
            f"sequence to revert is longer than the defined pattern: " \
            f"{sequence_steps} > {len(ref_layout)}"
        if is_model_output and self.starts_with_special_token():
            ref_layout = ref_layout[1:]
        indexes = np.full((n_q, timesteps), n_q * sequence_steps, dtype=np.int64)
        mask = np.zeros((n_q, timesteps), dtype=bool)
        for s, seq_codes in enumerate(ref_layout):
            if s < sequence_steps:
                for code in seq_codes:
                    if code.t < timesteps:
                        indexes[code.q, code.t] = s + code.q * sequence_steps
                        mask[code.q, code.t] = True
        return indexes, mask

    # ------------------------------------------------------------ build/revert
    def build_pattern_sequence(self, z: jax.Array, special_token: int,
                               keep_only_valid_steps: bool = False):
        """z: [B, K, T] -> (values [B, K, S], indexes [K, S], mask [K, S])."""
        B, K, T = z.shape
        assert K == self.n_q
        indexes, mask = self._sequence_indexes(T, keep_only_valid_steps)
        flat = jnp.concatenate(
            [z.reshape(B, K * T),
             jnp.full((B, 1), special_token, z.dtype)], axis=1)
        values = jnp.take(flat, jnp.asarray(indexes).reshape(-1), axis=1)
        values = values.reshape(B, K, indexes.shape[-1])
        return values, indexes, mask

    def revert_pattern_sequence(self, s: jax.Array, special_token: int,
                                keep_only_valid_steps: bool = False):
        """s: [B, K, S] -> (values [B, K, T], indexes [K, T], mask [K, T])."""
        B, K, S = s.shape
        assert K == self.n_q
        indexes, mask = self._revert_indexes(S, keep_only_valid_steps, False)
        flat = jnp.concatenate(
            [s.reshape(B, K * S),
             jnp.full((B, 1), special_token, s.dtype)], axis=1)
        values = jnp.take(flat, jnp.asarray(indexes).reshape(-1), axis=1)
        values = values.reshape(B, K, indexes.shape[-1])
        return values, indexes, mask

    def revert_pattern_logits(self, logits: jax.Array, special_token: float,
                              keep_only_valid_steps: bool = False):
        """logits: [B, card, K, S] -> [B, card, K, T], keeping the first-step
        logits (model output shifted by the initial special token;
        codebooks_patterns.py:250-269)."""
        B, card, K, S = logits.shape
        assert K == self.n_q
        indexes, mask = self._revert_indexes(S, keep_only_valid_steps, True)
        flat = jnp.concatenate(
            [logits.reshape(B, card, K * S),
             jnp.full((B, card, 1), special_token, logits.dtype)], axis=2)
        values = jnp.take(flat, jnp.asarray(indexes).reshape(-1), axis=2)
        values = values.reshape(B, card, K, indexes.shape[-1])
        return values, indexes, mask


class CodebooksPatternProvider(ABC):
    def __init__(self, n_q: int):
        assert n_q > 0
        self.n_q = n_q
        self.get_pattern = lru_cache(100)(self.get_pattern)  # type: ignore

    @abstractmethod
    def get_pattern(self, timesteps: int) -> Pattern:
        ...


class DelayedPatternProvider(CodebooksPatternProvider):
    """The MusicGen default: codebook q delayed by ``delays[q]`` steps
    (codebooks_patterns.py:305-356)."""

    def __init__(self, n_q: int, delays: tp.Optional[tp.List[int]] = None,
                 flatten_first: int = 0, empty_initial: int = 0):
        super().__init__(n_q)
        if delays is None:
            delays = list(range(n_q))
        self.delays = delays
        self.flatten_first = flatten_first
        self.empty_initial = empty_initial
        assert len(self.delays) == self.n_q
        assert sorted(self.delays) == self.delays

    def get_pattern(self, timesteps: int) -> Pattern:
        """Sequence step s carries, for every codebook q, the frame
        ``s - delays[q]`` once that frame exists — i.e. each codebook's row
        is shifted right by its delay.  Layout is bit-identical to the
        reference's (codebooks_patterns.py:305-356, pinned by the parity
        tests); the construction below is our own.
        """
        first = self.flatten_first
        steps: PatternLayout = []
        if self.empty_initial >= 0:
            # special-token slot, plus any requested leading empty steps
            steps.extend([] for _ in range(1 + self.empty_initial))
        # optional fully-flattened warmup: one codebook per sequence step
        steps.extend([LayoutCoord(t, q)]
                     for t in range(min(timesteps, first))
                     for q in range(self.n_q))
        steps.extend(
            [LayoutCoord(t - d, q) for q, d in enumerate(self.delays)
             if t - d >= first]
            for t in range(first, timesteps + max(self.delays)))
        return Pattern(steps, n_q=self.n_q, timesteps=timesteps)


class ParallelPatternProvider(DelayedPatternProvider):
    def __init__(self, n_q: int, empty_initial: int = 0):
        super().__init__(n_q, [0] * n_q, empty_initial=empty_initial)


class UnrolledPatternProvider(CodebooksPatternProvider):
    """Flatten codebooks into inner steps with optional per-codebook delays
    (codebooks_patterns.py:372-490)."""

    FlattenedCodebook = namedtuple("FlattenedCodebook", ["codebooks", "delay"])

    def __init__(self, n_q: int, flattening: tp.Optional[tp.List[int]] = None,
                 delays: tp.Optional[tp.List[int]] = None):
        super().__init__(n_q)
        if flattening is None:
            flattening = list(range(n_q))
        if delays is None:
            delays = [0] * n_q
        assert len(flattening) == n_q
        assert len(delays) == n_q
        assert sorted(flattening) == flattening
        assert sorted(delays) == delays
        self._flattened_codebooks = self._build_flattened_codebooks(delays, flattening)
        self.max_delay = max(delays)

    def _build_flattened_codebooks(self, delays, flattening):
        flattened: dict = {}
        for q, (inner_step, delay) in enumerate(zip(flattening, delays)):
            if inner_step not in flattened:
                flattened[inner_step] = self.FlattenedCodebook(codebooks=[q],
                                                               delay=delay)
            else:
                fc = flattened[inner_step]
                assert fc.delay == delay, (
                    "Codebooks flattened to the same position must share a delay")
                fc.codebooks.append(q)
        return flattened

    @property
    def _num_inner_steps(self) -> int:
        return max(self._flattened_codebooks.keys()) + 1

    def num_virtual_steps(self, timesteps: int) -> int:
        return timesteps * self._num_inner_steps + 1

    def get_pattern(self, timesteps: int) -> Pattern:
        """Every frame t expands into ``_num_inner_steps`` sequence slots;
        inner slot k carries its codebook group at frame t but is *emitted*
        ``delay`` frames later.  Ordering all slots by (emission time,
        contents) interleaves the groups exactly like the reference
        (codebooks_patterns.py:372-490, pinned by the parity tests).
        """
        horizon = timesteps + self.max_delay
        slots: tp.List[tp.Tuple[int, list]] = [(-1, [])]  # special-token slot
        for t in range(horizon):
            for k in range(self._num_inner_steps):
                group = self._flattened_codebooks.get(k)
                if group is None:
                    slots.append((t, []))
                elif t + group.delay < horizon:
                    slots.append((t + group.delay,
                                  [LayoutCoord(t, q)
                                   for q in group.codebooks]))
        return Pattern([coords for _, coords in sorted(slots)],
                       n_q=self.n_q, timesteps=timesteps)


class CoarseFirstPattern(CodebooksPatternProvider):
    """All of codebook 0 first, then the rest with optional delays
    (codebooks_patterns.py:493-527)."""

    def __init__(self, n_q: int, delays: tp.Optional[tp.List[int]] = None):
        super().__init__(n_q)
        if delays is None:
            delays = [0] * (n_q - 1)
        self.delays = delays
        assert len(self.delays) == self.n_q - 1
        assert sorted(self.delays) == self.delays

    def get_pattern(self, timesteps: int) -> Pattern:
        """Codebook 0 is laid out in full before the delayed remainder
        (codebooks_patterns.py:493-527, pinned by the parity tests)."""
        steps: PatternLayout = [[]]
        steps.extend([LayoutCoord(t, 0)] for t in range(timesteps))
        steps.extend(
            [LayoutCoord(t - d, q + 1) for q, d in enumerate(self.delays)
             if t - d >= 0]
            for t in range(timesteps + max(self.delays)))
        return Pattern(steps, n_q=self.n_q, timesteps=timesteps)


class MusicLMPattern(CodebooksPatternProvider):
    """Group-wise full flattening (codebooks_patterns.py:530-548)."""

    def __init__(self, n_q: int, group_by: int = 2):
        super().__init__(n_q)
        self.group_by = group_by

    def get_pattern(self, timesteps: int) -> Pattern:
        """Codebook groups of ``group_by`` are each fully flattened in turn
        (codebooks_patterns.py:530-548, pinned by the parity tests)."""
        steps: PatternLayout = [[]]
        steps.extend(
            [LayoutCoord(t, q)]
            for g0 in range(0, self.n_q, self.group_by)
            for t in range(timesteps)
            for q in range(g0, g0 + self.group_by))
        return Pattern(steps, n_q=self.n_q, timesteps=timesteps)


_PROVIDERS = {
    'parallel': ParallelPatternProvider,
    'delay': DelayedPatternProvider,
    'unroll': UnrolledPatternProvider,
    'coarse_first': CoarseFirstPattern,
    'musiclm': MusicLMPattern,
}


def get_pattern_provider(name: str, n_q: int, **kwargs) -> CodebooksPatternProvider:
    return _PROVIDERS[name](n_q, **kwargs)
