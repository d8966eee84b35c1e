"""Training losses for codec (EnCodec-style) training: spectral losses,
SI-SNR, and the gradient balancer.

The reference fork stripped the upstream training stack (SURVEY.md ground
facts: ``audiocraft/losses/`` is absent from the tree; only the quantizer's
EMA path remains).  Production codec training needs the full EnCodec recipe
— time-domain L1/L2 + multi-scale mel loss + adversarial terms, combined by
a *gradient balancer* — so this module rebuilds that role TPU-first:

* STFT/mel as pure jnp (precomputed numpy mel filterbank, HTK scale — the
  torchaudio default the upstream wrapper relies on).
* The balancer is *functional*: instead of N backward passes through the
  generator (the torch design), each loss is differentiated only w.r.t. the
  reconstruction (cheap — no generator backward), the per-loss cotangents
  are renormalized to the requested effort shares, and ONE vjp pulls the
  combined cotangent back through the generator.  Mathematically the same
  update, one backward instead of N.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['stft', 'mel_filterbank', 'mel_spectrogram',
           'MultiScaleMelSpectrogramLoss', 'sisnr', 'Balancer',
           'balanced_cotangent']


# ------------------------------------------------------------------- spectra

def _frame_indices(length: int, n_fft: int, hop: int) -> np.ndarray:
    n_frames = 1 + (length - n_fft) // hop
    return (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])


def stft(x: jax.Array, n_fft: int, hop_length: int,
         win_length: tp.Optional[int] = None, center: bool = True,
         normalized: bool = True) -> jax.Array:
    """[..., T] -> complex [..., F, T'] with a Hann window (torch.stft
    semantics: reflect center padding, window zero-padded to n_fft)."""
    win_length = win_length or n_fft
    window = jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        x = jnp.concatenate([x[..., 1:pad + 1][..., ::-1], x,
                             x[..., -pad - 1:-1][..., ::-1]], axis=-1)
    idx = _frame_indices(x.shape[-1], n_fft, hop_length)
    frames = x[..., idx] * window          # [..., T', n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)   # [..., T', F]
    if normalized:
        spec = spec / math.sqrt(n_fft)     # torch.stft normalized=True
    return jnp.swapaxes(spec, -1, -2)      # [..., F, T']


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)   # HTK


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0,
                   fmax: tp.Optional[float] = None) -> np.ndarray:
    """Triangular HTK-scale mel filterbank [n_mels, n_fft//2+1]
    (torchaudio ``melscale_fbanks(mel_scale='htk', norm=None)`` math)."""
    fmax = fmax or sample_rate / 2
    freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(np.asarray(fmin)),
                                     _hz_to_mel(np.asarray(fmax)),
                                     n_mels + 2))
    fb = np.zeros((n_mels, len(freqs)), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[m] = np.maximum(0.0, np.minimum(up, down))
    return fb


def mel_spectrogram(x: jax.Array, sample_rate: int, n_fft: int,
                    hop_length: int, n_mels: int,
                    log: bool = False, floor_level: float = 1e-5
                    ) -> jax.Array:
    """[B, C, T] -> [B, C, n_mels, T'] power-mel (optionally log)."""
    spec = stft(x, n_fft, hop_length, normalized=True)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    mel = jnp.einsum('mf,...ft->...mt', fb, power)
    if log:
        mel = jnp.log10(floor_level + mel)
    return mel


@dataclasses.dataclass(frozen=True)
class MultiScaleMelSpectrogramLoss:
    """EnCodec's multi-scale mel reconstruction loss: over STFT scales
    2^5..2^11, L1 on the linear mel plus alpha-weighted L2 on the log mel
    (alpha_i = sqrt(2^i / 2 - 1), the EnCodec paper weighting)."""
    sample_rate: int
    range_start: int = 6
    range_end: int = 11
    n_mels: int = 64
    floor_level: float = 1e-5

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        total = jnp.zeros((), jnp.float32)
        n = 0
        for i in range(self.range_start, self.range_end + 1):
            n_fft, hop = 2 ** i, 2 ** i // 4
            alpha = math.sqrt(2 ** i / 2 - 1)
            mx = mel_spectrogram(x, self.sample_rate, n_fft, hop, self.n_mels,
                                 floor_level=self.floor_level)
            my = mel_spectrogram(y, self.sample_rate, n_fft, hop, self.n_mels,
                                 floor_level=self.floor_level)
            lx = jnp.log10(self.floor_level + mx)
            ly = jnp.log10(self.floor_level + my)
            total = total + jnp.mean(jnp.abs(mx - my)) \
                + alpha * jnp.sqrt(jnp.mean((lx - ly) ** 2) + 1e-12)
            n += 1
        return total / n


def sisnr(estimate: jax.Array, reference: jax.Array,
          eps: float = 1e-8) -> jax.Array:
    """Negative scale-invariant SNR (a loss; lower is better)."""
    ref = reference - jnp.mean(reference, axis=-1, keepdims=True)
    est = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    dot = jnp.sum(ref * est, axis=-1, keepdims=True)
    proj = dot * ref / (jnp.sum(ref ** 2, axis=-1, keepdims=True) + eps)
    noise = est - proj
    ratio = (jnp.sum(proj ** 2, axis=-1)
             / (jnp.sum(noise ** 2, axis=-1) + eps))
    return -jnp.mean(10.0 * jnp.log10(ratio + eps))


# ------------------------------------------------------------------ balancer

class Balancer(tp.NamedTuple):
    """Gradient-balancer config: ``weights[name]`` is the share of the total
    gradient norm loss ``name`` may contribute at the model output.  EMA
    state smooths the per-loss norms across steps."""
    weights: tp.Dict[str, float]
    rescale_total: float = 1.0   # total grad norm budget at the output
    ema_decay: float = 0.999
    epsilon: float = 1e-12

    def init_state(self) -> dict:
        return {name: jnp.zeros(()) for name in self.weights} | {
            '_count': jnp.zeros(())}


def balanced_cotangent(balancer: Balancer, recon: jax.Array,
                       loss_fns: tp.Dict[str, tp.Callable[[jax.Array],
                                                          jax.Array]],
                       state: dict,
                       grouped_fns: tp.Sequence[
                           tp.Callable[[jax.Array],
                                       tp.Dict[str, jax.Array]]] = ()
                       ) -> tp.Tuple[jax.Array, dict, dict]:
    """Compute the balanced cotangent w.r.t. ``recon``.

    Each ``loss_fns[name]`` maps the reconstruction to a scalar.  Gradients
    are taken w.r.t. the *reconstruction only* (no generator backward), the
    EMA-smoothed norms renormalize each contribution to its requested share,
    and the summed cotangent is pulled back through the generator by the
    caller with ONE vjp.  Returns ``(cotangent, new_state, metrics)``.

    ``grouped_fns`` are callables each returning a *dict* of named scalar
    losses that share a forward pass (e.g. adversarial + feature-matching
    both read the same discriminator activations): the group is linearized
    with one ``jax.vjp`` so the shared forward runs once, then each loss
    gets its own pullback (its gradient norm is needed individually).  The
    math is identical to listing the losses in ``loss_fns``.
    """
    total_w = sum(balancer.weights.values())
    count = state['_count'] + 1
    decay = balancer.ema_decay
    cot = jnp.zeros_like(recon)
    new_state = {'_count': count}
    metrics: tp.Dict[str, jax.Array] = {}

    def accumulate(name: str, loss: jax.Array, g: jax.Array):
        nonlocal cot
        norm = jnp.linalg.norm(g.ravel())
        ema = state[name] * decay + norm * (1 - decay)
        new_state[name] = ema
        ema_hat = ema / (1 - decay ** count)  # bias-corrected
        share = balancer.weights[name] / total_w * balancer.rescale_total
        cot = cot + g * (share / (ema_hat + balancer.epsilon))
        metrics[name] = loss
        metrics[f'{name}_norm'] = norm

    for name, fn in loss_fns.items():
        loss, g = jax.value_and_grad(fn)(recon)
        accumulate(name, loss, g)
    for group in grouped_fns:
        losses, pull = jax.vjp(group, recon)
        for name in losses:
            onehot = {n: jnp.asarray(1.0 if n == name else 0.0,
                                     losses[n].dtype) for n in losses}
            accumulate(name, losses[name], pull(onehot)[0])
    return cot, new_state, metrics
