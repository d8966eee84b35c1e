"""CLAP embedding backends for the joint-embedding conditioner.

The reference CLAPEmbeddingConditioner wraps `laion_clap`
(/root/reference/audiocraft/modules/conditioners.py:1006-1301) as an external
frozen torch model.  `laion_clap` is absent here, but HuggingFace
`transformers` ships the same CLAP architecture (`ClapModel`), so this module
provides working ``embed_fn`` / ``text_embed_fn`` hooks for
:class:`~..cond.joint_embed.JointEmbeddingConditioner` backed by a host-side
CLAP — matching the reference's design, where CLAP also runs as an external
frozen network outside the generation graph (host/tokenize phase, never
inside a jitted program).

Pass an already-built ``ClapModel`` (e.g. loaded from a local checkpoint
directory — no hub egress here) plus optionally a tokenizer for the text
tower.
"""

from __future__ import annotations

import typing as tp

import numpy as np

from .attributes import JointEmbedCondition
from .joint_embed import windowed_average_embedding

CLAP_SAMPLE_RATE = 48000


def make_clap_embed_fns(model: tp.Any,
                        tokenizer: tp.Any = None,
                        feature_extractor: tp.Any = None,
                        max_seconds: float = 10.0,
                        stride_seconds: float = 5.0):
    """Build (embed_fn, text_embed_fn) over a transformers ClapModel.

    Audio embeddings follow the reference's windowed-average scheme for long
    clips (conditioners.py:1179-1212); text embeddings use the CLAP text
    tower (the reference's training-time ``text_p`` swap path).  Both return
    L2-normalized embeddings in the shared space plus the indices of empty
    entries (nullified conditions), matching the EmbedFn contract.
    """
    import torch
    from transformers import ClapFeatureExtractor

    model.eval()
    fe = feature_extractor or ClapFeatureExtractor()
    fusion = bool(getattr(model.config.audio_config, 'enable_fusion', False))
    max_frames = int(max_seconds * CLAP_SAMPLE_RATE)
    stride = int(stride_seconds * CLAP_SAMPLE_RATE)

    def clip_embed(w: np.ndarray) -> np.ndarray:
        """[B, T] mono 48 kHz -> CLAP audio-space embeddings [B, dim]."""
        feats = fe(list(w), sampling_rate=CLAP_SAMPLE_RATE,
                   return_tensors='pt',
                   truncation='fusion' if fusion else 'rand_trunc')
        with torch.no_grad():
            emb = model.get_audio_features(
                input_features=feats['input_features'],
                is_longer=feats.get('is_longer'))
        return emb.numpy()

    def _normalize(out: np.ndarray) -> np.ndarray:
        return (out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True),
                                 1e-8)).astype(np.float32)

    def embed_fn(x: JointEmbedCondition
                 ) -> tp.Tuple[np.ndarray, tp.Sequence[int]]:
        from ..io.audio_utils import convert_audio
        wav = np.asarray(x.wav, np.float32)
        if wav.ndim == 3:  # [B, C, T] -> mono
            wav = wav.mean(axis=1)
        empty_idx = [i for i in range(wav.shape[0]) if x.length[i] <= 1]
        embeds = []
        for i in range(wav.shape[0]):
            w = np.asarray(convert_audio(wav[i:i + 1][:, None],
                                         x.sample_rate[i],
                                         CLAP_SAMPLE_RATE, 1))[:, 0]
            embeds.append(windowed_average_embedding(
                clip_embed, w, max_frames, stride)[0])
        return _normalize(np.stack(embeds)), empty_idx

    def text_embed_fn(x: JointEmbedCondition
                      ) -> tp.Tuple[np.ndarray, tp.Sequence[int]]:
        assert tokenizer is not None, \
            "text_embed_fn needs a tokenizer for the CLAP text tower"
        texts = [t if t else "" for t in x.text]
        empty_idx = [i for i, t in enumerate(texts) if not t]
        tok = tokenizer(texts, return_tensors='pt', padding=True)
        with torch.no_grad():
            emb = model.get_text_features(**tok)
        return _normalize(emb.numpy()), empty_idx

    return embed_fn, text_embed_fn
