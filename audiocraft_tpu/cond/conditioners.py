"""Conditioners: embed conditioning attributes into (tensor, mask) pairs.

Functional counterparts of
``/root/reference/audiocraft/modules/conditioners.py:345-515``.  Each
conditioner keeps the reference's deliberate two-phase split:
``tokenize()`` does host-side, synchronization-point work (string processing,
tokenizer calls); ``__call__(params, tokenized)`` is the jittable device embed.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .tokenizers import NoopTokenizer, WhiteSpaceTokenizer

ConditionType = tp.Tuple[jax.Array, jax.Array]


@dataclasses.dataclass(frozen=True)
class LUTConditioner:
    """Lookup-table text conditioner (reference conditioners.py:387-419)."""
    n_bins: int
    dim: int
    output_dim: int
    tokenizer: str = 'whitespace'
    pad_idx: int = 0

    def _tokenizer(self):
        if self.tokenizer == 'whitespace':
            return WhiteSpaceTokenizer(self.n_bins, pad_idx=self.pad_idx)
        if self.tokenizer == 'noop':
            return NoopTokenizer(self.n_bins, pad_idx=self.pad_idx)
        raise ValueError(f"unrecognized tokenizer `{self.tokenizer}`")

    def init(self, key: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(self.dim)
        return {
            'embed': jax.random.normal(k1, (self.n_bins, self.dim)),
            'output_proj': {
                'weight': jax.random.uniform(k2, (self.output_dim, self.dim),
                                             minval=-bound, maxval=bound),
                'bias': jax.random.uniform(k3, (self.output_dim,),
                                           minval=-bound, maxval=bound),
            },
        }

    def tokenize(self, x: tp.List[tp.Optional[str]]):
        tokens, mask = self._tokenizer()(x)
        return jnp.asarray(tokens), jnp.asarray(mask)

    def __call__(self, params: dict, inputs) -> ConditionType:
        tokens, mask = inputs
        embeds = jnp.take(params['embed'], tokens, axis=0)
        embeds = embeds @ params['output_proj']['weight'].T \
            + params['output_proj']['bias']
        embeds = embeds * mask[..., None]
        return embeds, mask


@dataclasses.dataclass(frozen=True)
class T5Conditioner:
    """T5-encoder text conditioner (reference conditioners.py:422-515).

    The encoder itself is our JAX T5 implementation (nn/t5.py) with weights
    imported from a torch T5 checkpoint; tokenization uses the HF tokenizer
    (host-side, matching the reference split).
    """
    name: str = 't5-base'
    output_dim: int = 512
    finetune: bool = False
    word_dropout: float = 0.0
    #: explicit encoder architecture (nn.t5.T5EncoderConfig); None resolves
    #: the architecture from ``name``.  Checkpoint importers set this from
    #: the snapshot's own text_encoder config so the tower always matches
    #: the weights (HF snapshots can carry non-standard T5 shapes).
    config: tp.Optional[tp.Any] = None

    MODELS_DIMS = {
        "t5-small": 512, "t5-base": 768, "t5-large": 1024,
        "t5-3b": 1024, "t5-11b": 1024,
        "google/flan-t5-small": 512, "google/flan-t5-base": 768,
        "google/flan-t5-large": 1024,
    }

    @property
    def dim(self) -> int:
        if self.config is not None:
            return self.config.d_model
        return self.MODELS_DIMS[self.name]

    @property
    def t5_config(self):
        from ..nn.t5 import T5EncoderConfig
        return self.config or T5EncoderConfig.for_name(self.name)

    def load_tokenizer(self):
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(self.name)

    def init(self, key: jax.Array) -> dict:
        """Random-init projection; T5 weights arrive via ckpt import."""
        k1, k2 = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.dim)
        cfg = self.t5_config
        return {
            't5': cfg.model().init(k1),
            'output_proj': {
                'weight': jax.random.uniform(k2, (self.output_dim, self.dim),
                                             minval=-bound, maxval=bound),
                'bias': jnp.zeros((self.output_dim,)),
            },
        }

    def tokenize(self, x: tp.List[tp.Optional[str]], tokenizer=None):
        entries = [xi if xi is not None else "" for xi in x]
        tokenizer = tokenizer or self.load_tokenizer()
        empty_idx = [i for i, xi in enumerate(entries) if xi == ""]
        enc = tokenizer(entries, return_tensors='np', padding=True)
        ids = np.asarray(enc['input_ids'])
        mask = np.asarray(enc['attention_mask'])
        mask[empty_idx, :] = 0
        return jnp.asarray(ids), jnp.asarray(mask)

    def __call__(self, params: dict, inputs) -> ConditionType:
        ids, mask = inputs
        embeds = self.t5_config.model()(params['t5'], ids, mask)
        embeds = embeds @ params['output_proj']['weight'].T \
            + params['output_proj']['bias']
        embeds = embeds * mask[..., None]
        return embeds, mask


def collate_wav_conditions(conds: tp.List) -> "object":
    """Batch a list of per-sample WavConditions (pad wavs to max length),
    mirroring ConditioningProvider._collate_wavs (conditioners.py:1547-1600)."""
    from .attributes import WavCondition
    wavs = [np.asarray(c.wav) for c in conds]
    max_t = max(w.shape[-1] for w in wavs)
    padded = np.concatenate(
        [np.pad(w, ((0, 0),) * (w.ndim - 1) + ((0, max_t - w.shape[-1]),))
         for w in wavs], axis=0)
    lengths = np.concatenate([np.asarray(c.length).reshape(-1) for c in conds])
    sample_rates = sum((list(c.sample_rate) for c in conds), [])
    paths = sum((list(c.path) for c in conds), [])
    seek_times = sum((list(c.seek_time) for c in conds), [])
    return WavCondition(padded, lengths, sample_rates, paths, seek_times)


Conditioner = tp.Any  # LUTConditioner | T5Conditioner | ChromaConditioner | ...


@dataclasses.dataclass(frozen=True)
class ConditioningProvider:
    """Registry of conditioners with collated tokenize/forward phases
    (reference conditioners.py:1469-1669)."""
    conditioners: tp.Tuple[tp.Tuple[str, Conditioner], ...]

    @classmethod
    def from_dict(cls, conditioners: tp.Dict[str, Conditioner]) -> "ConditioningProvider":
        return cls(tuple(conditioners.items()))

    @property
    def as_dict(self) -> tp.Dict[str, Conditioner]:
        return dict(self.conditioners)

    @property
    def text_conditions(self) -> tp.List[str]:
        return [k for k, v in self.conditioners
                if isinstance(v, (LUTConditioner, T5Conditioner))]

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, max(len(self.conditioners), 1))
        return {name: cond.init(k)
                for (name, cond), k in zip(self.conditioners, keys)}

    def tokenize(self, inputs: tp.List) -> tp.Dict[str, tp.Any]:
        """inputs: list of ConditioningAttributes -> {name: tokenized}."""
        output = {}
        conds = self.as_dict
        # collate text and wav attributes across the batch
        text: tp.Dict[str, tp.List[tp.Optional[str]]] = {}
        wavs: tp.Dict[str, tp.List] = {}
        for sample in inputs:
            for name in conds:
                if name in sample.text:
                    text.setdefault(name, []).append(sample.text[name])
                if name in sample.wav:
                    wavs.setdefault(name, []).append(sample.wav[name])
        for name, batch in text.items():
            output[name] = conds[name].tokenize(batch)
        for name, batch in wavs.items():
            output[name] = conds[name].tokenize(collate_wav_conditions(batch))
        return output

    def __call__(self, params: dict, tokenized: tp.Dict[str, tp.Any]
                 ) -> tp.Dict[str, ConditionType]:
        conds = self.as_dict
        return {name: conds[name](params[name], inputs)
                for name, inputs in tokenized.items()}
