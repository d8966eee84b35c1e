"""Style conditioning (MusicGen-Style): audio excerpt -> EnCodec tokens ->
transformer -> RVQ information bottleneck -> downsampled prefix.

Re-design of FeatureExtractor/StyleConditioner
(``/root/reference/audiocraft/modules/conditioners.py:762-1003``).  The
reference's 'encodec' feature extractor imports the stripped
``solvers.compression`` (broken in the fork, conditioners.py:800); here the
extractor is simply our own EnCodec codec — no import problem, same tokens.

Components mirrored:
* random / middle excerpt of ``length`` seconds (:835-841); eval uses middle
  for determinism under jit (random excerpts take an explicit PRNG key).
* per-stream embeddings of the EnCodec tokens, summed (:846-850).
* non-causal pre-norm transformer (:930-934), batch-norm (eval-mode running
  stats are folded to an affine transform), RVQ with ``eval_q`` active streams
  at eval (:949-964), fixed ``ds_factor`` downsample (:966).
* cross-entropy mask of the excerpt region for training (:860-869).
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.encodec import EncodecModel
from ..nn.transformer import StreamingTransformer
from ..quant.vq import RVQState, ResidualVectorQuantizer
from .attributes import WavCondition
from .tokenizers import length_to_mask

ConditionType = tp.Tuple[jax.Array, jax.Array]

_TRANSFORMER_SCALES = {
    'xsmall': dict(d_model=256, num_heads=8, num_layers=4),
    'default': dict(d_model=512, num_heads=8, num_layers=8),
    'large': dict(d_model=1024, num_heads=16, num_layers=24),
}


@dataclasses.dataclass(frozen=True, eq=False)
class StyleConditioner:
    feat_extractor: EncodecModel      # our codec as the feature extractor
    output_dim: int = 512
    sample_rate: int = 32000
    encodec_n_q: int = 4
    length: float = 3.0               # excerpt seconds
    transformer_scale: str = 'default'
    ds_factor: int = 15
    n_q_out: int = 6
    eval_q: int = 3
    q_dropout: bool = True
    bins: int = 1024
    varying_lengths: tp.Tuple[float, float] = (1.5, 4.5)
    batch_norm: bool = True
    rvq_threshold_ema_dead_code: float = 0.1
    use_middle_of_segment: bool = False
    compute_mask: bool = True
    ds_rate_compression: int = 640
    num_codebooks_lm: int = 4

    @property
    def dim(self) -> int:
        return _TRANSFORMER_SCALES[self.transformer_scale]['d_model'] \
            if self.transformer_scale != 'none' else 512

    @property
    def transformer(self) -> tp.Optional[StreamingTransformer]:
        if self.transformer_scale == 'none':
            return None
        args = _TRANSFORMER_SCALES[self.transformer_scale]
        return StreamingTransformer(
            dim_feedforward=int(4 * args['d_model']), causal=False,
            norm_first=True, bias_ff=False, bias_attn=False,
            activation='gelu', **args)

    @property
    def rvq(self) -> tp.Optional[ResidualVectorQuantizer]:
        if self.n_q_out <= 0:
            return None
        # kmeans_init=False: fresh inits get usable (uniform) codebooks; the
        # trained checkpoints overwrite them either way.
        return ResidualVectorQuantizer(
            dimension=self.dim, n_q=self.n_q_out, q_dropout=self.q_dropout,
            bins=self.bins, kmeans_init=False,
            threshold_ema_dead_code=self.rvq_threshold_ema_dead_code)

    @property
    def downsampling_factor(self) -> float:
        return (self.sample_rate / self.feat_extractor.frame_rate) * self.ds_factor

    def with_params(self, eval_q: tp.Optional[int] = None,
                    excerpt_length: tp.Optional[float] = None,
                    ds_factor: tp.Optional[int] = None,
                    encodec_n_q: tp.Optional[int] = None) -> "StyleConditioner":
        """set_params equivalent (reference :970-985) — returns a new config."""
        changes = {}
        if eval_q is not None:
            changes['eval_q'] = eval_q
        if excerpt_length is not None:
            changes['length'] = excerpt_length
        if ds_factor is not None:
            changes['ds_factor'] = ds_factor
        if encodec_n_q is not None:
            changes['encodec_n_q'] = encodec_n_q
        return dataclasses.replace(self, **changes)

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array, codec_params: tp.Optional[dict] = None) -> dict:
        if codec_params is None:
            # standalone init (e.g. through ConditioningProvider.init); the
            # real extractor weights arrive via the compression checkpoint
            key, ck = jax.random.split(key)
            codec_params = self.feat_extractor.init(ck)
        keys = jax.random.split(key, 5)
        dim = self.dim
        params: dict = {
            'codec': codec_params,
            'embed': 0.02 * jax.random.normal(
                keys[0], (self.encodec_n_q, self.feat_extractor.cardinality, dim)),
            'output_proj': {
                'weight': jax.random.uniform(
                    keys[1], (self.output_dim, dim),
                    minval=-1 / math.sqrt(dim), maxval=1 / math.sqrt(dim)),
                'bias': jnp.zeros((self.output_dim,)),
            },
        }
        if self.transformer is not None:
            params['transformer'] = self.transformer.init(keys[2])
        if self.batch_norm:
            params['bn'] = {'mean': jnp.zeros((dim,)), 'var': jnp.ones((dim,))}
        if self.rvq is not None:
            params['rvq'] = self.rvq.init(keys[3])
        return params

    # -------------------------------------------------------------- tokenize
    def tokenize(self, x: WavCondition) -> WavCondition:
        return x

    # --------------------------------------------------------------- forward
    def excerpt(self, wav: jax.Array, key: tp.Optional[jax.Array] = None,
                training: bool = False) -> tp.Tuple[jax.Array, int]:
        length_subwav = int(self.length * self.sample_rate)
        T = wav.shape[-1]
        length_subwav = min(length_subwav, T)
        if self.use_middle_of_segment or key is None:
            start = int((T - length_subwav) / 2)
        else:
            start = int(jax.random.randint(key, (), 0, T - length_subwav + 1))
        return jax.lax.dynamic_slice_in_dim(wav, start, length_subwav, axis=-1), start

    def excerpt_mask(self, x: WavCondition, start: int) -> tp.Optional[np.ndarray]:
        """CE mask over the excerpt's LM-token span (reference :860-869)."""
        if x.wav.shape[-1] == 1:
            return None
        total_length = int(x.wav.shape[-1] / self.ds_rate_compression)
        mask_length = int(int(self.length * self.sample_rate)
                          / self.ds_rate_compression)
        start_tok = int(start / self.ds_rate_compression)
        mask = np.ones((x.wav.shape[0], self.num_codebooks_lm, total_length),
                       bool)
        mask[:, :, start_tok:start_tok + mask_length] = False
        return mask

    def __call__(self, params: dict, x: WavCondition,
                 key: tp.Optional[jax.Array] = None,
                 training: bool = False) -> ConditionType:
        wav = jnp.asarray(x.wav)
        B = wav.shape[0]
        dim = self.dim

        if wav.shape[-1] == 1:  # nullified condition
            embeds = jnp.zeros((B, 1, dim))
        else:
            excerpt, _start = self.excerpt(wav, key, training)
            tokens, _ = self.feat_extractor.encode(params['codec'], excerpt)
            tokens = tokens[:, :self.encodec_n_q]
            gathered = jax.vmap(lambda table, ids: jnp.take(table, ids, axis=0),
                                in_axes=(0, 1), out_axes=1)(params['embed'],
                                                            tokens)
            z = jnp.sum(gathered, axis=1)  # [B, T', dim]
            if self.transformer is not None:
                z, _ = self.transformer(params['transformer'], z)
            if self.batch_norm:
                bn = params['bn']
                z = (z - bn['mean']) * jax.lax.rsqrt(bn['var'] + 1e-5)
            if self.rvq is not None:
                state = params['rvq'] if not isinstance(params['rvq'], dict) \
                    else RVQState(**params['rvq'])
                n_q = self.n_q_out if training else self.eval_q
                rvq = dataclasses.replace(self.rvq, n_q=self.rvq.n_q)
                res, _ = rvq.forward(state, jnp.swapaxes(z, 1, 2),
                                     frame_rate=1.0,
                                     n_q_active=jnp.asarray(n_q), key=key,
                                     training=False)
                z = jnp.swapaxes(res.x, 1, 2)
            embeds = z[:, ::self.ds_factor]

        embeds = embeds @ params['output_proj']['weight'].T \
            + params['output_proj']['bias']
        lengths = np.asarray(x.length) / self.downsampling_factor
        mask = jnp.asarray(length_to_mask(
            np.maximum(lengths.astype(np.int64), 0), max_len=embeds.shape[1]
        ).astype(np.int32))
        embeds = embeds * mask[..., None]
        return embeds, mask
