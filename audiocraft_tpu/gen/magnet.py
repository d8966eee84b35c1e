"""MAGNeT generation facade (reference /root/reference/audiocraft/models/magnet.py).

Operates over a fixed sequence length (the LM's training segment duration);
no stride extension.  Wraps codec + MagnetLMModel + conditioning.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import numpy as np

from ..codec.encodec import EncodecModel
from ..cond.attributes import (ClassifierFreeGuidanceDropout,
                               ConditioningAttributes)
from ..cond.conditioners import ConditioningProvider
from ..lm.magnet import MagnetLMModel


@dataclasses.dataclass
class MAGNeT:
    name: str
    compression_model: EncodecModel
    codec_params: dict
    lm: MagnetLMModel
    lm_params: dict
    condition_provider: ConditioningProvider
    cond_params: dict

    # generation params (reference magnet.py:60-88)
    use_sampling: bool = True
    top_k: int = 0
    top_p: float = 0.9
    temperature: float = 3.0
    max_cfg_coef: float = 10.0
    min_cfg_coef: float = 1.0
    decoding_steps: tp.Tuple[int, ...] = (20, 10, 10, 10)
    span_arrangement: str = 'nonoverlap'

    @property
    def duration(self) -> float:
        return self.lm.segment_duration

    @property
    def frame_rate(self) -> float:
        return self.compression_model.frame_rate

    @property
    def sample_rate(self) -> int:
        return self.compression_model.sample_rate

    def set_generation_params(self, use_sampling: bool = True, top_k: int = 0,
                              top_p: float = 0.9, temperature: float = 3.0,
                              max_cfg_coef: float = 10.0,
                              min_cfg_coef: float = 1.0,
                              decoding_steps: tp.Sequence[int] = (20, 10, 10, 10),
                              span_arrangement: str = 'nonoverlap'):
        self.use_sampling = use_sampling
        self.top_k = top_k
        self.top_p = top_p
        self.temperature = temperature
        self.max_cfg_coef = max_cfg_coef
        self.min_cfg_coef = min_cfg_coef
        self.decoding_steps = tuple(int(s) for s in decoding_steps)
        self.span_arrangement = span_arrangement

    def generate(self, descriptions: tp.List[str],
                 key: tp.Optional[jax.Array] = None,
                 return_tokens: bool = False):
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        attributes = [ConditioningAttributes(text={'description': d})
                      for d in descriptions]
        null_conditions = ClassifierFreeGuidanceDropout(p=1.0)(attributes)
        tokenized = self.condition_provider.tokenize(
            list(attributes) + null_conditions)
        condition_tensors = self.condition_provider(self.cond_params, tokenized)

        max_gen_len = int(self.duration * self.frame_rate)
        tokens = self.lm.generate_magnet(
            self.lm_params, key, condition_tensors=condition_tensors,
            num_samples=len(descriptions), max_gen_len=max_gen_len,
            use_sampling=self.use_sampling, temp=self.temperature,
            top_k=self.top_k, top_p=self.top_p,
            max_cfg_coef=self.max_cfg_coef, min_cfg_coef=self.min_cfg_coef,
            decoding_steps=self.decoding_steps,
            span_arrangement=self.span_arrangement)
        audio = self.compression_model.decode(self.codec_params, tokens)
        return (audio, tokens) if return_tokens else audio


def get_debug_magnet(key: tp.Optional[jax.Array] = None) -> MAGNeT:
    """Tiny MAGNeT for tests: non-causal LM with restricted subcode context."""
    from ..builders import get_debug_compression_model
    from ..cond.conditioners import ConditioningProvider, LUTConditioner
    from ..cond.fuser import ConditionFuser
    from ..patterns import ParallelPatternProvider

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    codec = get_debug_compression_model(32000)
    dim = 16
    provider = ConditioningProvider.from_dict({
        'description': LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer='whitespace')})
    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    lm = MagnetLMModel(
        pattern_provider=ParallelPatternProvider(4), fuser=fuser,
        n_q=4, card=400, dim=dim, num_heads=4, num_layers=2,
        cross_attention=True, causal=False, norm_first=True,
        subcodes_context=5, compression_model_framerate=int(codec.frame_rate),
        segment_duration=2, span_len=3)
    return MAGNeT(name='debug-magnet', compression_model=codec,
                  codec_params=codec.init(k1), lm=lm, lm_params=lm.init(k2),
                  condition_provider=provider, cond_params=provider.init(k3),
                  decoding_steps=(4, 2, 2, 2))
