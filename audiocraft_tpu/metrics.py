"""Generation-quality metrics: FAD, KLD, CLAP score, chroma cosine.

The reference's MODEL_CARD reports FAD (VGGish), KL (PaSST), and CLAP score
(``/root/reference/MODEL_CARD.md:31-37``), but the implementations lived in
the stripped ``audiocraft/metrics/`` package.  This module rebuilds that
role with the classifier/embedder as a *pluggable host-side function* — the
distance/score math is self-contained and unit-testable, and any embedding
network (VGGish, PaSST, CLAP, or our own codec features) drops in:

* :func:`frechet_distance` / :class:`FrechetAudioDistance` — the FAD math
  (Gaussian Frechet distance between embedding-set statistics).
* :func:`kl_divergence_metric` — the reference KLD protocol: per-sample KL
  between a classifier's label distributions on reference vs generated
  audio, averaged (both directions reported).
* :func:`clap_score` — cosine between CLAP text and audio embeddings
  (pass the embed fns from ``cond.clap.make_clap_embed_fns``).
* :func:`chroma_cosine` — frame-averaged cosine similarity between chroma
  of two waveforms (melody-adherence measure for melody-conditioned
  generation, using ``nn.chroma.ChromaExtractor``).
"""

from __future__ import annotations

import typing as tp

import numpy as np

__all__ = ['frechet_distance', 'FrechetAudioDistance',
           'kl_divergence_metric', 'clap_score', 'chroma_cosine',
           'make_codec_embed_fn', 'make_codec_prob_fn']


def make_codec_embed_fn(model, params, window_seconds: float = 1.0,
                        ) -> tp.Callable[[np.ndarray, int], np.ndarray]:
    """Default FAD embedding network: EnCodec encoder latents.

    The reference protocol embeds with VGGish (MODEL_CARD.md:31-37), whose
    weights need network access; the codec's own encoder is a trained audio
    feature extractor that ships with every checkpoint, so it is the
    self-contained default ("codec-FAD").  Per non-overlapping window of
    ``window_seconds``, the continuous latent frames are mean+std pooled:
    ``embed_fn(wav [B, C, T], sr) -> [B * n_windows, 2 * latent_dim]``.
    FAD values are comparable only within one embedder — true of any FAD
    variant (VGGish-FAD vs PaSST-FAD differ too).
    """
    import jax
    import jax.numpy as jnp

    from .io.audio_utils import convert_audio

    latent = jax.jit(lambda p, x: model.encode_to_latent(p, x))

    def embed_fn(wav: np.ndarray, sample_rate: int) -> np.ndarray:
        x = jnp.asarray(np.asarray(wav, np.float32))
        assert x.ndim == 3, "expected [B, C, T]"
        x = convert_audio(x, sample_rate, model.sample_rate, 1)
        emb = np.asarray(latent(params, x))          # [B, D, Tf]
        w = max(int(round(window_seconds * model.frame_rate)), 2)
        n = emb.shape[-1] // w
        assert n >= 1, (
            f"clip too short for a {window_seconds}s embedding window")
        emb = emb[..., :n * w].reshape(emb.shape[0], emb.shape[1], n, w)
        mean = emb.mean(axis=-1)                     # [B, D, n]
        std = emb.std(axis=-1)
        out = np.concatenate([mean, std], axis=1)    # [B, 2D, n]
        return out.transpose(0, 2, 1).reshape(-1, out.shape[1])

    return embed_fn


def make_codec_prob_fn(model, params,
                       ) -> tp.Callable[[np.ndarray, int], np.ndarray]:
    """Default KLD "classifier": per-clip first-codebook token histogram.

    The reference KLD protocol runs PaSST label distributions over
    reference vs generated audio (MODEL_CARD.md:31-37); offline, the
    codec's codebook-0 usage histogram is a distributional signature over
    ``cardinality`` pseudo-classes.  ``prob_fn(wav [B, C, T], sr) ->
    [B, cardinality]`` rows summing to 1; feed paired rows to
    :func:`kl_divergence_metric`.
    """
    import jax
    import jax.numpy as jnp

    from .io.audio_utils import convert_audio

    enc = jax.jit(lambda p, x: model.encode(p, x)[0])

    def prob_fn(wav: np.ndarray, sample_rate: int) -> np.ndarray:
        x = jnp.asarray(np.asarray(wav, np.float32))
        assert x.ndim == 3
        x = convert_audio(x, sample_rate, model.sample_rate, 1)
        codes = np.asarray(enc(params, x))           # [B, K, Tf]
        card = model.cardinality
        return np.stack([np.bincount(c, minlength=card) / max(c.size, 1)
                         for c in codes[:, 0]]).astype(np.float64)

    return prob_fn


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians:
    ``|mu1-mu2|^2 + tr(S1 + S2 - 2 sqrt(S1 S2))``."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = np.asarray(linalg.sqrtm(sigma1 @ sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = np.asarray(linalg.sqrtm((sigma1 + offset)
                                          @ (sigma2 + offset)))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


class FrechetAudioDistance:
    """FAD over a pluggable embedding function.

    ``embed_fn(wav [B, C, T], sample_rate) -> [N, D]`` embeddings (VGGish in
    the paper protocol; any fixed audio embedder defines a valid FAD
    variant).  Accumulate reference and generated sets, then ``compute()``.
    """

    def __init__(self, embed_fn: tp.Callable[[np.ndarray, int], np.ndarray],
                 sample_rate: int):
        self.embed_fn = embed_fn
        self.sample_rate = sample_rate
        self._ref: tp.List[np.ndarray] = []
        self._gen: tp.List[np.ndarray] = []

    def add(self, reference: tp.Optional[np.ndarray] = None,
            generated: tp.Optional[np.ndarray] = None) -> None:
        if reference is not None:
            self._ref.append(np.asarray(
                self.embed_fn(np.asarray(reference), self.sample_rate)))
        if generated is not None:
            self._gen.append(np.asarray(
                self.embed_fn(np.asarray(generated), self.sample_rate)))

    @staticmethod
    def _stats(chunks: tp.List[np.ndarray]) -> tp.Tuple[np.ndarray,
                                                        np.ndarray]:
        e = np.concatenate(chunks, axis=0).astype(np.float64)
        assert e.ndim == 2 and e.shape[0] >= 2, e.shape
        return e.mean(axis=0), np.cov(e, rowvar=False)

    def compute(self) -> float:
        mu_r, s_r = self._stats(self._ref)
        mu_g, s_g = self._stats(self._gen)
        return frechet_distance(mu_r, s_r, mu_g, s_g)


def kl_divergence_metric(ref_probs: np.ndarray, gen_probs: np.ndarray,
                         eps: float = 1e-6) -> tp.Dict[str, float]:
    """Per-sample label-distribution KL, averaged (the reference KLD
    protocol: a pretrained classifier's probabilities over reference vs
    generated audio; `kld` = KL(ref || gen), plus the symmetric view).

    ``*_probs``: [N, n_classes] rows summing to ~1 (same N, paired rows).
    """
    p = np.asarray(ref_probs, np.float64) + eps
    q = np.asarray(gen_probs, np.float64) + eps
    p = p / p.sum(axis=-1, keepdims=True)
    q = q / q.sum(axis=-1, keepdims=True)
    kl_pq = float(np.mean(np.sum(p * np.log(p / q), axis=-1)))
    kl_qp = float(np.mean(np.sum(q * np.log(q / p), axis=-1)))
    return {'kld': kl_pq, 'kld_inverse': kl_qp,
            'kld_symmetric': 0.5 * (kl_pq + kl_qp)}


def clap_score(text_embeds: np.ndarray, audio_embeds: np.ndarray) -> float:
    """Mean pairwise cosine similarity between matched text/audio CLAP
    embeddings ([N, D] each; produce them with
    ``cond.clap.make_clap_embed_fns``)."""
    t = np.asarray(text_embeds, np.float64)
    a = np.asarray(audio_embeds, np.float64)
    assert t.shape == a.shape and t.ndim == 2
    t = t / (np.linalg.norm(t, axis=-1, keepdims=True) + 1e-12)
    a = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
    return float(np.mean(np.sum(t * a, axis=-1)))


def chroma_cosine(wav_a: np.ndarray, wav_b: np.ndarray, sample_rate: int,
                  n_chroma: int = 12, radix2_exp: int = 12) -> float:
    """Frame-averaged cosine similarity between the chroma of two waveforms
    — how closely generated audio follows a melody reference."""
    import jax.numpy as jnp

    from .nn.chroma import ChromaExtractor

    ext = ChromaExtractor(sample_rate=sample_rate, n_chroma=n_chroma,
                          radix2_exp=radix2_exp)
    ca = np.asarray(ext(jnp.asarray(np.asarray(wav_a, np.float32))))
    cb = np.asarray(ext(jnp.asarray(np.asarray(wav_b, np.float32))))
    n = min(ca.shape[-2], cb.shape[-2])
    ca, cb = ca[..., :n, :], cb[..., :n, :]
    num = np.sum(ca * cb, axis=-1)
    den = (np.linalg.norm(ca, axis=-1) * np.linalg.norm(cb, axis=-1) + 1e-12)
    return float(np.mean(num / den))
