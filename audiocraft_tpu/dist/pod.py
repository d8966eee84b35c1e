"""Time-parallel (pod) EnCodec tokenization + synthesis: shard ONE long
waveform (or code sequence) over the device mesh and run it N× faster —
``pod_encode`` token-exact, ``pod_decode`` exact to float rounding.

The reference cannot do this at all — its EnCodec encode/decode is a
single-GPU ``forward`` (reference encodec.py:144-163); long audio is only
ever chunked sequentially on the host.  On TPU the natural design is SPMD
over ICI:

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


def pod_decode(model, params: dict, codes: jax.Array, mesh: Mesh,
               axis: str = 'data',
               compute_dtype: tp.Optional[tp.Any] = None) -> jax.Array:
    """Decode ``codes [B, K, T_f]`` with time sharded over ``mesh[axis]``.

    The decoder inverts the encoder's structure, so the pod split flips:
    the sequence-global head (initial frame-rate conv + LSTM, ~12 % of
    decode) runs replicated on the (tiny) frame-level embedding, and the
    upsampling transposed-conv tail (~88 %) runs time-sharded — each shard
    takes a *window* of the replicated head output: its own frame chunk
    plus a corruption-radius halo of true neighboring frames (no
    collectives at all: transposed convs map length L -> L*stride exactly,
    so only each window's own edge pads corrupt, by
    ``SEANetDecoder.tail_corruption_radius()`` output samples).  The two
    global edge windows simply slide inward (still true signal, same
    length), so every shard runs the identical program on the identical
    shape — the per-shard output slice offset absorbs the shift.

    Returns the waveform ``[B, C, T_f' * hop]`` time-sharded over ``axis``
    (``T_f'`` = frames zero-code-padded to a multiple of the shard count).
    Equals ``model.decode(params, codes_padded)`` up to float rounding:
    every output sample reads exactly the reference's inputs, but XLA's
    transposed-conv reduction blocking varies with spatial length, so
    chunked runs can differ by ~1 ulp (<1e-7 fp32; far below the codec's
    own reconstruction error, and the production decode dtype is bf16).
    """
    assert not model.renormalize, "pod_decode supports renormalize=False"
    dec = model.decoder
    S = mesh.shape[axis]
    hop = dec.hop_length
    split = dec.split_index
    c_l, c_r = dec.tail_corruption_radius()   # output samples
    halo_f = -(-max(c_l, c_r, 1) // hop) + 1  # frames (+1 margin)

    B, K, T_f = codes.shape
    Tf_pad = -(-T_f // S) * S
    if Tf_pad != T_f:
        codes = jnp.pad(codes, ((0, 0), (0, 0), (0, Tf_pad - T_f)))
    F = Tf_pad // S
    # F >= 2*halo keeps the inward slide confined to the two edge windows
    # (any interior window keeps its full halo margin) and fits the window
    # inside the signal for any S >= 2.
    assert S == 1 or F >= 2 * halo_f, (
        f"pod_decode needs >= {2 * halo_f} frames/shard, got {F}; "
        f"use fewer shards or more frames")

    emb = model.decode_latent(params, codes)
    if compute_dtype is None and model.compute_dtype is not None:
        compute_dtype = jnp.dtype(model.compute_dtype)
    dec_params = params['decoder']
    if compute_dtype is not None:
        dec_params = jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, dec_params)
        emb = emb.astype(compute_dtype)

    h = dec(dec_params, emb, stop_layer=split)      # replicated [B, C, Tf']
    C = h.shape[1]
    W = min(F + 2 * halo_f, Tf_pad)                 # window frames
    # shard i's window: frames [i*F - halo, i*F + F + halo), slid inward at
    # the global edges so every window is true signal of identical length
    starts = [min(max(i * F - halo_f, 0), Tf_pad - W) for i in range(S)]
    chunks = jnp.stack([h[:, :, st:st + W] for st in starts])  # [S, B, C, W]
    chunks = jax.lax.with_sharding_constraint(
        chunks, jax.sharding.NamedSharding(mesh, P(axis)))
    y = dec(dec_params, chunks.reshape(S * B, C, W), start_layer=split)
    y = y.reshape(S, B, model.channels, W * hop)
    # shard i's F*hop output samples start at (i*F - starts[i]) * hop; the
    # offset is >= c_l from any padded window edge (and 0 at a true edge)
    y = jnp.stack([y[i, :, :, (i * F - starts[i]) * hop:]
                   [:, :, :F * hop] for i in range(S)])
    wav = jnp.moveaxis(y, 0, 2).reshape(B, model.channels, Tf_pad * hop)
    wav = jax.lax.with_sharding_constraint(
        wav, jax.sharding.NamedSharding(mesh, P(None, None, axis)))
    return model.postprocess(wav.astype(jnp.float32), None)
