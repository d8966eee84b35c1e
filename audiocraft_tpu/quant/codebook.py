"""Euclidean codebook with EMA training — pure-functional JAX.

Re-designs ``/root/reference/audiocraft/quantization/core_vq.py:87-219``
(EuclideanCodebook) the TPU way:

* The codebook is **state**, not a module: a ``CodebookState`` pytree
  (embed / cluster_size / embed_avg / inited) threaded through pure functions.
* Nearest-neighbor search is a single ``[N, D] x [D, K]`` matmul + row argmax —
  MXU-shaped, fp32 accumulation (required for token parity; see
  ``quantize``).  A fused Pallas kernel (ops/rvq_pallas.py) covers the hot path;
  this module is the XLA reference implementation and the autodiff path.
* EMA statistics under data parallelism: one-hot counts and embed-sums are
  ``psum``'d over the data axis when ``axis_name`` is given, so every chip
  applies identical updates to its replicated codebook — no broadcast step
  needed (the reference instead updates locally and syncs buffers at
  init/expiry via flashy.distrib.broadcast_tensors, core_vq.py:140,158).
* k-means init and dead-code expiry use explicit PRNG keys; under multi-host DP
  all hosts derive the same key, so decisions agree everywhere by construction.

Parity notes: the distance expression replicates the reference ordering
``-(sum(x^2) - 2 x E + sum(E^2))`` with first-index tie-breaking (torch
``max().indices`` and ``jnp.argmax`` both return the first maximum).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
from jax import lax

from flax import struct


@struct.dataclass
class CodebookState:
    embed: jax.Array         # [K, D] codebook vectors
    cluster_size: jax.Array  # [K] EMA usage counts
    embed_avg: jax.Array     # [K, D] EMA sums
    inited: jax.Array        # [] bool/float — k-means ran


def uniform_init(key: jax.Array, codebook_size: int, dim: int) -> jax.Array:
    # kaiming_uniform on a [K, D] table (reference core_vq.py:35-38):
    # bound = sqrt(6 / fan_in) with fan_in = D (a = sqrt(5) default is NOT used
    # by nn.init.kaiming_uniform_'s default gain... reference calls with
    # default a=0 => gain = sqrt(2), bound = gain * sqrt(3 / fan_in).
    bound = jnp.sqrt(2.0) * jnp.sqrt(3.0 / dim)
    return jax.random.uniform(key, (codebook_size, dim), minval=-bound, maxval=bound)


def init_state(key: jax.Array, codebook_size: int, dim: int,
               kmeans_init: bool = True) -> CodebookState:
    if kmeans_init:
        embed = jnp.zeros((codebook_size, dim), jnp.float32)
        inited = jnp.zeros((), jnp.float32)
    else:
        embed = uniform_init(key, codebook_size, dim)
        inited = jnp.ones((), jnp.float32)
    return CodebookState(
        embed=embed,
        cluster_size=jnp.zeros((codebook_size,), jnp.float32),
        embed_avg=embed,
        inited=inited,
    )


def compute_distances(x: jax.Array, embed: jax.Array) -> jax.Array:
    """Negative squared euclidean distances, reference expression order.

    x: [N, D]; embed: [K, D] -> [N, K], fp32.
    """
    x = x.astype(jnp.float32)
    embed_t = embed.astype(jnp.float32).T
    return -(
        jnp.sum(jnp.square(x), axis=1, keepdims=True)
        - 2 * jnp.dot(x, embed_t, preferred_element_type=jnp.float32)
        + jnp.sum(jnp.square(embed_t), axis=0, keepdims=True)
    )


def quantize(x: jax.Array, embed: jax.Array) -> jax.Array:
    """Nearest codebook index per row. x: [..., D] -> [...] int32."""
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    dist = compute_distances(flat, embed)
    idx = jnp.argmax(dist, axis=-1).astype(jnp.int32)
    return idx.reshape(shape[:-1])


def dequantize(idx: jax.Array, embed: jax.Array) -> jax.Array:
    return jnp.take(embed, idx, axis=0)


def sample_vectors(key: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """Pick `num` vectors from samples: without replacement when possible
    (reference core_vq.py:41-49). Static-shape friendly: N is static."""
    n = samples.shape[0]
    if n >= num:
        perm = jax.random.permutation(key, n)[:num]
        return samples[perm]
    idx = jax.random.randint(key, (num,), 0, n)
    return samples[idx]


def kmeans(key: jax.Array, samples: jax.Array, num_clusters: int,
           num_iters: int = 10) -> tp.Tuple[jax.Array, jax.Array]:
    """k-means on [N, D] samples; returns (means [K, D], bins [K]).

    Jitted ``fori_loop`` over iterations; each iteration is one distance matmul
    + segment-sum, all static shapes (reference core_vq.py:52-75).
    """
    dim = samples.shape[-1]
    means0 = sample_vectors(key, samples, num_clusters)

    def body(_, means):
        dists = compute_distances(samples, means)  # [N, K]
        buckets = jnp.argmax(dists, axis=-1)
        one_hot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)  # [N, K]
        bins = jnp.sum(one_hot, axis=0)
        bins_clamped = jnp.where(bins == 0, 1.0, bins)
        new_means = jnp.dot(one_hot.T, samples,
                            preferred_element_type=jnp.float32) / bins_clamped[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = lax.fori_loop(0, num_iters, body, means0)
    # final assignment counts
    buckets = jnp.argmax(compute_distances(samples, means), axis=-1)
    bins = jnp.sum(jax.nn.one_hot(buckets, num_clusters, dtype=jnp.float32), axis=0)
    return means, bins


@dataclasses.dataclass(frozen=True)
class EuclideanCodebook:
    """Static configuration for one codebook."""
    dim: int
    codebook_size: int
    kmeans_init: bool = False
    kmeans_iters: int = 10
    decay: float = 0.8
    epsilon: float = 1e-5
    threshold_ema_dead_code: float = 2.0

    def init(self, key: jax.Array) -> CodebookState:
        return init_state(key, self.codebook_size, self.dim, self.kmeans_init)

    def encode(self, state: CodebookState, x: jax.Array) -> jax.Array:
        return quantize(x, state.embed)

    def decode(self, state: CodebookState, idx: jax.Array) -> jax.Array:
        return dequantize(idx, state.embed)

    def maybe_kmeans_init(self, state: CodebookState, x: jax.Array,
                          key: jax.Array) -> CodebookState:
        """Run k-means on the first training batch if not yet initialized.

        Under jit this evaluates both branches' cost once at trace time but the
        k-means loop is cheap relative to training; use `lax.cond` to skip at
        runtime.
        """
        flat = x.reshape(-1, x.shape[-1])

        def do_init(_):
            embed, cluster_size = kmeans(key, flat, self.codebook_size,
                                         self.kmeans_iters)
            return CodebookState(embed=embed, cluster_size=cluster_size,
                                 embed_avg=embed,
                                 inited=jnp.ones((), jnp.float32))

        def no_init(_):
            return state

        return lax.cond(state.inited > 0, no_init, do_init, operand=None)

    def ema_update(self, state: CodebookState, x: jax.Array,
                   embed_ind: jax.Array, key: jax.Array,
                   axis_name: tp.Optional[str] = None,
                   expiry: str = 'reference') -> CodebookState:
        """One EMA training step (reference core_vq.py:195-217) + dead-code expiry.

        With ``axis_name``, one-hot counts and embed sums are all-reduced over
        the named data axis before the EMA is applied, so replicated codebooks
        stay identical on every device.

        ``expiry`` semantics:
        * ``'reference'`` — faithful to core_vq.py: ``expire_codes_`` runs
          *before* the EMA update and only replaces ``embed`` rows, which the
          final ``embed_normalized`` copy then overwrites — so within one step
          the expiry has no lasting effect on state (a quirk of the reference
          we preserve for parity).
        * ``'effective'`` — expired rows are replaced *after* normalization
          (and their EMA stats reset to the replacement), so dead codes really
          are resurrected.  Recommended for from-scratch training.
        * ``'none'`` — no expiry.
        """
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        idx = embed_ind.reshape(-1)
        one_hot = jax.nn.one_hot(idx, self.codebook_size, dtype=jnp.float32)
        counts = jnp.sum(one_hot, axis=0)                     # [K]
        embed_sum = jnp.dot(one_hot.T, flat,
                            preferred_element_type=jnp.float32)  # [K, D]
        if axis_name is not None:
            counts = lax.psum(counts, axis_name)
            embed_sum = lax.psum(embed_sum, axis_name)

        decay = self.decay
        cluster_size = state.cluster_size * decay + counts * (1 - decay)
        embed_avg = state.embed_avg * decay + embed_sum * (1 - decay)
        n = jnp.sum(cluster_size)
        smoothed = ((cluster_size + self.epsilon)
                    / (n + self.codebook_size * self.epsilon) * n)
        embed_normalized = embed_avg / smoothed[:, None]
        new_state = CodebookState(embed=embed_normalized,
                                  cluster_size=cluster_size,
                                  embed_avg=embed_avg, inited=state.inited)
        if expiry == 'effective' and self.threshold_ema_dead_code > 0:
            expired = state.cluster_size < self.threshold_ema_dead_code
            replacements = sample_vectors(key, flat, self.codebook_size)
            mask = expired[:, None]
            new_state = CodebookState(
                embed=jnp.where(mask, replacements, new_state.embed),
                cluster_size=jnp.where(expired, self.threshold_ema_dead_code,
                                       new_state.cluster_size),
                embed_avg=jnp.where(
                    mask, replacements * self.threshold_ema_dead_code,
                    new_state.embed_avg),
                inited=new_state.inited)
        return new_state

    def expire_codes(self, state: CodebookState, batch_samples: jax.Array,
                     key: jax.Array) -> CodebookState:
        """Replace codes whose EMA usage dropped below threshold with random
        batch vectors (reference core_vq.py:148-158).  All hosts must pass the
        same `key` (and psum'd stats) so the decision is identical everywhere.
        """
        expired = state.cluster_size < self.threshold_ema_dead_code  # [K]
        replacements = sample_vectors(key, batch_samples.astype(jnp.float32),
                                      self.codebook_size)
        embed = jnp.where(expired[:, None], replacements, state.embed)
        # Reference resets nothing else on expiry; EMA stats keep running.
        return state.replace(embed=embed)
