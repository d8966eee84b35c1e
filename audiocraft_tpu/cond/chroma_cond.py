"""Melody conditioning via chroma features.

Counterpart of ChromaStemConditioner
(``/root/reference/audiocraft/modules/conditioners.py:571-759``).  The
reference first runs Demucs to keep only vocal/other stems before chroma
extraction; Demucs is an external pretrained model (not in this environment),
so stem filtering is an optional pluggable pre-processing hook
(``stem_fn``) — as the survey notes, stems shape conditioning *quality*, not
token parity.  Everything else matches: chroma extraction, nullified-cond
handling, ``match_len_on_eval`` truncate/tile to the training-duration chroma
length (conditioners.py:739-748), hop-size downsampling factor for masks.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.chroma import ChromaExtractor
from .attributes import WavCondition
from .tokenizers import length_to_mask

ConditionType = tp.Tuple[jax.Array, jax.Array]


@dataclasses.dataclass(frozen=True)
class ChromaConditioner:
    output_dim: int
    sample_rate: int
    n_chroma: int = 12
    radix2_exp: int = 12
    duration: float = 30.0
    match_len_on_eval: bool = True
    argmax: bool = True

    @property
    def dim(self) -> int:
        return self.n_chroma

    @property
    def chroma(self) -> ChromaExtractor:
        return ChromaExtractor(sample_rate=self.sample_rate,
                               n_chroma=self.n_chroma,
                               radix2_exp=self.radix2_exp, argmax=self.argmax)

    @property
    def downsampling_factor(self) -> int:
        return self.chroma._winhop

    @property
    def chroma_len(self) -> int:
        """Chroma frames for the training duration (conditioners.py:658-662)."""
        n = int(self.sample_rate * self.duration)
        nfft, hop = self.chroma._nfft, self.chroma._winhop
        n = max(n, nfft)
        return 1 + (n + 2 * (nfft // 2) - nfft) // hop

    def init(self, key: jax.Array) -> dict:
        bound = 1.0 / math.sqrt(self.n_chroma)
        k1, k2 = jax.random.split(key)
        return {'output_proj': {
            'weight': jax.random.uniform(k1, (self.output_dim, self.n_chroma),
                                         minval=-bound, maxval=bound),
            'bias': jax.random.uniform(k2, (self.output_dim,),
                                       minval=-bound, maxval=bound),
        }}

    def tokenize(self, x: WavCondition,
                 stem_fn: tp.Optional[tp.Callable] = None) -> WavCondition:
        """Host-phase work; optional stem separation hook runs here."""
        if stem_fn is not None and x.wav.shape[-1] > 1:
            x = x._replace(wav=stem_fn(x.wav))
        return x

    def __call__(self, params: dict, x: WavCondition) -> ConditionType:
        wav = jnp.asarray(x.wav)
        chroma = self.chroma(wav)
        if self.match_len_on_eval:
            B, T, C = chroma.shape
            if T > self.chroma_len:
                chroma = chroma[:, :self.chroma_len]
            elif T < self.chroma_len:
                n_repeat = int(math.ceil(self.chroma_len / T))
                chroma = jnp.tile(chroma, (1, n_repeat, 1))[:, :self.chroma_len]
        embeds = chroma @ params['output_proj']['weight'].T \
            + params['output_proj']['bias']
        if self.match_len_on_eval:
            # _use_masking=False in this mode (conditioners.py:601-603)
            mask = jnp.ones(embeds.shape[:2], jnp.int32)
        else:
            lengths = np.asarray(x.length) / self.downsampling_factor
            mask = jnp.asarray(length_to_mask(
                lengths.astype(np.int64), max_len=embeds.shape[1]).astype(np.int32))
        embeds = embeds * mask[..., None]
        return embeds, mask
