"""JASCO symbolic and drum conditioners + provider.

Counterpart of ``/root/reference/audiocraft/modules/jasco_conditioners.py``:
* ``MelodyConditioner`` (:15-33): pre-computed salience matrix -> projection.
* ``ChordsEmbConditioner`` (:36-57): chord-symbol LUT (card+1 with the null
  chord used by dropout).
* ``DrumsConditioner`` (:60-214): drums stem (Demucs — pluggable hook here,
  like the chroma conditioner) -> EnCodec *latent* codes quantized to the
  coarse stream -> temporal blur -> projection.
* ``JascoConditioningProvider`` (:216-300): collates symbolic conditions to
  fixed sequence lengths.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.encodec import EncodecModel
from .attributes import SymbolicCondition, WavCondition

ConditionType = tp.Tuple[jax.Array, jax.Array]


def _linear_init(key, out_d, in_d):
    bound = 1.0 / math.sqrt(in_d)
    k1, k2 = jax.random.split(key)
    return {'weight': jax.random.uniform(k1, (out_d, in_d), minval=-bound,
                                         maxval=bound),
            'bias': jax.random.uniform(k2, (out_d,), minval=-bound,
                                       maxval=bound)}


@dataclasses.dataclass(frozen=True)
class MelodyConditioner:
    card: int
    out_dim: int

    def init(self, key: jax.Array) -> dict:
        return {'output_proj': _linear_init(key, self.out_dim, self.card)}

    def tokenize(self, x: SymbolicCondition) -> SymbolicCondition:
        return x

    def __call__(self, params: dict, x: SymbolicCondition) -> ConditionType:
        melody = jnp.asarray(x.melody)  # [B, card, T]
        embeds = jnp.swapaxes(melody, 1, 2) @ params['output_proj']['weight'].T \
            + params['output_proj']['bias']
        mask = jnp.ones(embeds.shape[:2], jnp.int32)
        return embeds, mask


@dataclasses.dataclass(frozen=True)
class ChordsEmbConditioner:
    card: int
    out_dim: int

    @property
    def vocab_size(self) -> int:
        return self.card + 1  # + null chord for dropout

    def init(self, key: jax.Array) -> dict:
        return {'emb': 0.02 * jax.random.normal(
            key, (self.vocab_size, self.out_dim))}

    def tokenize(self, x: SymbolicCondition) -> SymbolicCondition:
        return x

    def __call__(self, params: dict, x: SymbolicCondition) -> ConditionType:
        chords = jnp.asarray(x.frame_chords)
        embeds = jnp.take(params['emb'], chords, axis=0)
        mask = jnp.ones(embeds.shape[:2], jnp.int32)
        return embeds, mask


@dataclasses.dataclass(frozen=True, eq=False)
class DrumsConditioner:
    feat_extractor: EncodecModel
    out_dim: int
    sample_rate: int = 32000
    blurring_factor: int = 3
    compression_model_latent_dim: int = 128
    compression_model_framerate: float = 50.0
    segment_duration: float = 10.0

    @property
    def seq_len(self) -> int:
        return int(self.segment_duration * self.compression_model_framerate)

    def init(self, key: jax.Array, codec_params: dict) -> dict:
        return {'codec': codec_params,
                'output_proj': _linear_init(
                    key, self.out_dim, self.compression_model_latent_dim)}

    def tokenize(self, x: WavCondition,
                 stem_fn: tp.Optional[tp.Callable] = None) -> WavCondition:
        """Optional drums-stem separation hook (Demucs in the reference)."""
        if stem_fn is not None and x.wav.shape[-1] > 1:
            x = x._replace(wav=stem_fn(x.wav))
        return x

    def _temporal_blur(self, z: jax.Array) -> jax.Array:
        """Average over non-overlapping spans then repeat (jasco:113-124)."""
        B, T, C = z.shape
        bf = self.blurring_factor
        pad = (bf - T % bf) % bf
        if pad:
            z = jnp.concatenate([z, z[:, T - pad:][:, ::-1]], axis=1)
        blurred = jnp.mean(z.reshape(B, -1, bf, C), axis=2)
        z = jnp.repeat(blurred[:, :, None], bf, axis=2).reshape(B, -1, C)
        return z[:, :T]

    def __call__(self, params: dict, x: WavCondition) -> ConditionType:
        wav = jnp.asarray(x.wav)
        B = wav.shape[0]
        if wav.shape[-1] == 1:  # nullified
            latents = jnp.zeros((B, 1, self.compression_model_latent_dim))
        else:
            # coarse quantized latent: encode to codes, decode only stream 0
            codes, _ = self.feat_extractor.encode(params['codec'], wav)
            coarse = codes[:, :1]
            latents = jnp.swapaxes(
                self.feat_extractor.decode_latent(params['codec'], coarse), 1, 2)
            latents = self._temporal_blur(latents)
        embeds = latents @ params['output_proj']['weight'].T \
            + params['output_proj']['bias']
        mask = jnp.ones(embeds.shape[:2], jnp.int32)
        return embeds, mask


@dataclasses.dataclass(frozen=True)
class JascoConditioningProvider:
    """Collates text + symbolic + drum conditions, padding symbolic streams to
    fixed sequence lengths (reference jasco_conditioners.py:216-300)."""
    conditioners: tp.Tuple[tp.Tuple[str, tp.Any], ...]
    chords_card: int = 194
    sequence_length: int = 500
    melody_dim: int = 53

    @classmethod
    def from_dict(cls, conditioners: tp.Dict[str, tp.Any], **kw):
        return cls(tuple(conditioners.items()), **kw)

    @property
    def as_dict(self) -> dict:
        return dict(self.conditioners)

    def init(self, key: jax.Array, codec_params: tp.Optional[dict] = None) -> dict:
        keys = jax.random.split(key, max(len(self.conditioners), 1))
        out = {}
        for (name, cond), k in zip(self.conditioners, keys):
            if isinstance(cond, DrumsConditioner):
                assert codec_params is not None
                out[name] = cond.init(k, codec_params)
            else:
                out[name] = cond.init(k)
        return out

    def _pad_chords(self, chords: np.ndarray) -> np.ndarray:
        out = np.full((chords.shape[0], self.sequence_length), self.chords_card,
                      np.int32)
        T = min(chords.shape[-1], self.sequence_length)
        out[:, :T] = chords[:, :T]
        return out

    def _pad_melody(self, melody: np.ndarray) -> np.ndarray:
        out = np.zeros((melody.shape[0], self.melody_dim, self.sequence_length),
                       np.float32)
        T = min(melody.shape[-1], self.sequence_length)
        out[:, :, :T] = melody[:, :, :T]
        return out

    def tokenize(self, inputs: tp.List) -> tp.Dict[str, tp.Any]:
        conds = self.as_dict
        output: tp.Dict[str, tp.Any] = {}
        text: tp.Dict[str, list] = {}
        chords, melodies, wavs = [], [], {}
        for sample in inputs:
            for name in conds:
                if name in sample.text:
                    text.setdefault(name, []).append(sample.text[name])
                if name in sample.wav:
                    wavs.setdefault(name, []).append(sample.wav[name])
            for name, sym in sample.symbolic.items():
                if sym.frame_chords is not None:
                    chords.append(np.asarray(sym.frame_chords).reshape(1, -1))
                if sym.melody is not None:
                    melodies.append(np.asarray(sym.melody)[None])
        for name, batch in text.items():
            output[name] = conds[name].tokenize(batch)
        if chords and 'chords' in conds:
            output['chords'] = SymbolicCondition(
                frame_chords=self._pad_chords(np.concatenate(chords)))
        if melodies and 'melody' in conds:
            output['melody'] = SymbolicCondition(
                melody=self._pad_melody(np.concatenate(melodies)))
        from .conditioners import collate_wav_conditions
        for name, batch in wavs.items():
            output[name] = conds[name].tokenize(collate_wav_conditions(batch))
        return output

    def __call__(self, params: dict, tokenized: tp.Dict[str, tp.Any]
                 ) -> tp.Dict[str, ConditionType]:
        conds = self.as_dict
        return {name: conds[name](params[name], inputs)
                for name, inputs in tokenized.items()}
