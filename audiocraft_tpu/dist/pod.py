"""Time-parallel (pod) EnCodec tokenization: shard ONE long waveform over
the device mesh and encode it N× faster, token-exact.

The reference cannot do this at all — its EnCodec encode is a single-GPU
``forward`` (reference encodec.py:144-163); long audio is only ever chunked
sequentially on the host.  On TPU the natural design is SPMD over ICI:

* the conv front-end (everything before the LSTM — ~88 % of encode FLOPs,
  PERF.md) is *time-local* with a small receptive field, so each chip runs
  it on its own time chunk inside ``shard_map``, exchanging
  receptive-field-sized halos with its neighbors over ICI via ``ppermute``;
* the sequence-global tail (LSTM -> final conv -> RVQ, ~12 %) is replicated:
  the frame-level features are ``all_gather``-ed (tiny — 2 kB/frame bf16)
  and every chip runs the same tail, which costs the same wall-clock as a
  perfectly pipelined wavefront would (the redundant copies run in
  parallel) with none of the masking machinery;
* chunk-edge frames are corrupted by each conv layer's local padding for
  exactly ``SEANetEncoder.front_corruption_radius()`` frames — the halo
  covers interior edges, and the two *global* edges are fixed by a uniform
  edge-correction pass: every chip re-runs the front on a few-frame segment
  of its own chunk with true edge padding, and the first/last chips select
  the corrected frames (``jnp.where`` on ``axis_index`` keeps the program
  SPMD-uniform).

Exactness contract: ``pod_encode(model, params, x, mesh)`` equals
``model.encode(params, pad_to_multiple(x, hop * n_shards))`` bit-for-bit —
the signal is zero-padded so every chunk is a whole number of frames at
every layer (all layer lengths stay stride-multiples, so the streamable
convs' extra-padding terms vanish identically on both paths).  Callers
wanting exact parity with the unpadded whole-signal encode should pass
lengths that are already multiples of ``hop * n_shards``.

Speedup model on N chips: t ≈ front/N + tail + gather, i.e. ~4.3× at N=8
for the 32 kHz stack's 88/12 split.  Verified token-exact on the 8-device
CPU mesh (tests/test_pod_encode.py); the multi-chip dryrun compiles it
under GSPMD every round.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _assert_pod_compatible(model) -> None:
    assert not model.renormalize, \
        "pod_encode supports renormalize=False models (32 kHz family)"
    enc = model.encoder
    for i, (kind, mod) in enumerate(enc._layers()):
        if i >= enc.split_index:
            break
        mods = [mod] if kind == 'conv' else (
            mod._convs() if kind == 'res' else [])
        for conv in mods:
            assert conv.norm != 'time_group_norm', \
                "time_group_norm has sequence-global statistics; " \
                "the conv front cannot be time-sharded exactly"


def pod_encode(model, params: dict, x: jax.Array, mesh: Mesh,
               axis: str = 'data',
               compute_dtype: tp.Optional[tp.Any] = None
               ) -> jax.Array:
    """Encode ``x [B, C, T]`` with time sharded over ``mesh[axis]``.

    Returns codes ``[B, K, T'/hop]`` (replicated), where ``T'`` is ``T``
    zero-padded up to a multiple of ``hop * n_shards``.  Bit-identical to
    ``model.encode(params, x_padded)``.
    """
    _assert_pod_compatible(model)
    enc = model.encoder
    S = mesh.shape[axis]
    hop = enc.hop_length
    split = enc.split_index
    c_l, c_r = enc.front_corruption_radius()
    halo_f = max(c_l, c_r) + 1        # +1 frame of margin
    seg_f = c_l + c_r + 2             # edge-correction segment length

    B, C, T = x.shape
    T_pad = -(-T // (hop * S)) * (hop * S)
    if T_pad != T:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, T_pad - T)))
    F = T_pad // (hop * S)            # frames per shard
    assert F >= max(halo_f, seg_f), (
        f"pod_encode needs >= {max(halo_f, seg_f)} frames/shard, got {F}; "
        f"use fewer shards or longer audio")

    if compute_dtype is None and model.compute_dtype is not None:
        compute_dtype = jnp.dtype(model.compute_dtype)
    enc_params = params['encoder']
    if compute_dtype is not None:
        enc_params = jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, enc_params)
        x = x.astype(compute_dtype)

    halo_s = halo_f * hop
    seg_s = seg_f * hop
    right_perm = [(i, (i + 1) % S) for i in range(S)]
    left_perm = [(i, (i - 1) % S) for i in range(S)]

    def front_shard(p, x_l):
        # x_l: this shard's chunk [B, C, F*hop]
        from_left = jax.lax.ppermute(x_l[:, :, -halo_s:], axis, right_perm)
        from_right = jax.lax.ppermute(x_l[:, :, :halo_s], axis, left_perm)
        ext = jnp.concatenate([from_left, x_l, from_right], axis=-1)
        y = enc(p, ext, stop_layer=split)          # [B, C', F + 2*halo_f]
        y = y[:, :, halo_f:halo_f + F]
        # uniform edge-correction: every shard computes both, the first /
        # last shards select theirs (wraparound halos made their edge
        # frames garbage; the segments re-run with true edge padding)
        idx = jax.lax.axis_index(axis)
        if c_l > 0:
            corr_l = enc(p, x_l[:, :, :seg_s], stop_layer=split)[:, :, :c_l]
            y = y.at[:, :, :c_l].set(
                jnp.where(idx == 0, corr_l, y[:, :, :c_l]))
        if c_r > 0:
            corr_r = enc(p, x_l[:, :, -seg_s:], stop_layer=split)[:, :, -c_r:]
            y = y.at[:, :, -c_r:].set(
                jnp.where(idx == S - 1, corr_r, y[:, :, -c_r:]))
        return jax.lax.all_gather(y, axis, axis=2, tiled=True)

    feat = shard_map(
        front_shard, mesh=mesh,
        in_specs=(P(), P(None, None, axis)),
        out_specs=P(),
        check_vma=False,
    )(enc_params, x)

    # replicated sequence-global tail: LSTM -> final act/conv -> RVQ
    emb = enc(enc_params, feat, start_layer=split).astype(jnp.float32)
    from ..codec.encodec import _q_state
    codes = model.quantizer.encode(
        _q_state(model.quantizer, params['quantizer']), emb)
    return codes
