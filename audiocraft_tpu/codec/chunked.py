"""Single-chip chunked EnCodec encode/decode for long audio.

Long-form generation (the fork's 720 s per-request cap, reference
app.py:318-319) decodes ~36k frames -> 23M samples; one monolithic XLA
decode program peaks at ~33 GB of HBM activations (measured round-2f) on a
15.75 GB chip.  These helpers reuse ``dist/pod.py``'s window math but run
the windows *sequentially* on one device: peak memory stays ~one-window
flat while every kept output sample still reads exactly the whole-signal
inputs (each window carries a corruption-radius halo of TRUE neighboring
data — no collectives needed, it is all local).

Window layout (identical for both directions, units = frames):

* static window length ``W``; each window emits ``F_out = W - 2*halo``
  aligned output frames, window ``i`` at global output offset
  ``g_i = i * F_out`` (the last window snaps to ``g = T - F_out`` so its
  right edge is the TRUE global edge);
* window start ``s_i = clamp(g_i - halo, 0, T - W)`` — clamping slides
  edge windows inward, so a window clamped at 0 / ``T - W`` has the true
  global boundary (its layer-local pads ARE the whole-signal pads), and
  any clamped-away margin only ever *grows* past ``halo``;
* ONE jitted program serves every window: the window start and output
  offset are traced scalars (``lax.dynamic_slice``) — per-window static
  slices would each bake a distinct XLA program and hammer the remote
  compiler.

Exactness:
* ``chunked_decode`` equals ``model.decode`` up to float rounding (~1 ulp
  fp32 — XLA's transposed-conv reduction blocking varies with spatial
  length, same caveat as ``dist/pod.pod_decode``; production decode is
  bf16 where this vanishes below the codec's own error);
* ``chunked_encode`` is token-exact with ``model.encode`` whenever the
  input length is a multiple of ``hop_length`` (otherwise it pads to one
  and is exact vs the padded encode — same contract as ``pod_encode``:
  frame-aligned windows keep every layer length a stride multiple, so the
  streamable convs' extra-padding terms vanish on both paths).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from .encodec import _q_state

# jitted helper cache keyed by id(model): model configs are frozen
# dataclasses that live for the process, and closing over the config is
# fine — only PARAMS must stay jit arguments (CLAUDE.md: closure params
# become jaxpr constants and wreck compile times).
_FNS: tp.Dict[tp.Tuple[int, str], tp.Any] = {}


def _window_plan(T: int, W: int, halo: int) -> tp.Tuple[list, list, int]:
    """Starts ``s_i`` and output offsets ``g_i`` covering ``[0, T)`` output
    frames with ``F_out = W - 2*halo`` frames per window."""
    F_out = W - 2 * halo
    assert F_out > 0, f"window {W} too small for halo {halo}"
    n = -(-T // F_out)
    gs, ss = [], []
    for i in range(n):
        g = min(i * F_out, T - F_out)
        gs.append(g)
        ss.append(min(max(g - halo, 0), T - W))
    return ss, gs, F_out


def _cast_tree(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)


def chunked_decode(model, params: dict, codes: jax.Array,
                   scale: tp.Optional[jax.Array] = None,
                   chunk_frames: int = 1500,
                   compute_dtype: tp.Optional[tp.Any] = None) -> jax.Array:
    """``model.decode`` for arbitrarily long ``codes [B, K, T_f]`` at
    ~one-window peak memory.  The sequence-global head (frame-rate conv +
    LSTM, ~12 % of decode FLOPs) runs once on the full frame sequence
    (tiny: dim x T_f); the upsampling transposed-conv tail (~88 %, and all
    of the activation memory) runs per window.

    Stereo: an ``InterleaveStereoCompressionModel`` de-interleaves to the
    wrapped mono codec at doubled batch (mirroring its own ``decode``)."""
    from .stereo import InterleaveStereoCompressionModel
    if isinstance(model, InterleaveStereoCompressionModel):
        B = codes.shape[0]
        c0, c1 = model.get_left_right_codes(codes)
        both = jnp.concatenate([c0, c1], axis=0)
        scales = None if scale is None else jnp.concatenate(
            [scale[:, 0], scale[:, 1]], axis=0)
        audio = chunked_decode(model.model, params, both, scales,
                               chunk_frames, compute_dtype)
        return jnp.concatenate([audio[:B], audio[B:]], axis=1)
    dec = model.decoder
    hop = dec.hop_length
    split = dec.split_index
    c_l, c_r = dec.tail_corruption_radius()      # output samples
    halo = -(-max(c_l, c_r, 1) // hop) + 1       # frames, +1 margin
    B, K, T_f = codes.shape
    W = min(chunk_frames, T_f)
    if T_f <= W or W < 4 * halo:
        return model.decode(params, codes, scale, compute_dtype=compute_dtype)

    if compute_dtype is None and model.compute_dtype is not None:
        compute_dtype = jnp.dtype(model.compute_dtype)

    key = (id(model), 'decode')
    if key not in _FNS:
        def head(p, cds, dt):
            emb = model.decode_latent(p, cds)
            dp = _cast_tree(p['decoder'], dt)
            return dec(dp, emb.astype(dt) if dt is not None else emb,
                       stop_layer=split), dp

        def tail(dp, h, start_f, off_samples, w_f, out_samples):
            window = jax.lax.dynamic_slice_in_dim(h, start_f, w_f, axis=2)
            y = dec(dp, window, start_layer=split)
            return jax.lax.dynamic_slice_in_dim(
                y, off_samples, out_samples, axis=2).astype(jnp.float32)

        _FNS[key] = (jax.jit(head, static_argnums=2),
                     jax.jit(tail, static_argnums=(4, 5)))
    head_fn, tail_fn = _FNS[key]

    h, dp = head_fn(params, codes, compute_dtype)
    ss, gs, F_out = _window_plan(T_f, W, halo)
    pieces = [tail_fn(dp, h, jnp.int32(s), jnp.int32((g - s) * hop),
                      W, F_out * hop)
              for s, g in zip(ss, gs)]
    # windows g_i are contiguous except the last (snapped to T_f - F_out):
    # take the first T_f - F_out output frames from the body, then the tail
    body = jnp.concatenate(pieces[:-1], axis=2)[:, :, :(T_f - F_out) * hop]
    wav = jnp.concatenate([body, pieces[-1]], axis=2)
    return model.postprocess(wav, scale)


def chunked_encode(model, params: dict, x: jax.Array,
                   chunk_frames: int = 1500,
                   compute_dtype: tp.Optional[tp.Any] = None
                   ) -> tp.Tuple[jax.Array, tp.Optional[jax.Array]]:
    """``model.encode`` for arbitrarily long ``x [B, C, T]`` at ~one-window
    peak memory.  The time-local conv front (~88 % of encode FLOPs and all
    of the activation memory) runs per window; the sequence-global tail
    (LSTM -> final conv -> RVQ) runs once on the frame-level features."""
    assert not model.renormalize, \
        "chunked_encode supports renormalize=False models (32 kHz family)"
    enc = model.encoder
    hop = enc.hop_length
    split = enc.split_index
    c_l, c_r = enc.front_corruption_radius()     # frames
    halo = max(c_l, c_r) + 1
    B, C, T = x.shape
    T_pad = -(-T // hop) * hop
    T_f = T_pad // hop
    W = min(chunk_frames, T_f)
    if T_f <= W or W < 4 * halo:
        return model.encode(params, x, compute_dtype=compute_dtype)
    if T_pad != T:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, T_pad - T)))

    if compute_dtype is None and model.compute_dtype is not None:
        compute_dtype = jnp.dtype(model.compute_dtype)

    key = (id(model), 'encode')
    if key not in _FNS:
        def front(p_enc, xx, start_s, off_f, w_s, out_f):
            window = jax.lax.dynamic_slice_in_dim(xx, start_s, w_s, axis=2)
            feat = enc(p_enc, window, stop_layer=split)
            return jax.lax.dynamic_slice_in_dim(feat, off_f, out_f, axis=2)

        def back(p, p_enc, feat):
            emb = enc(p_enc, feat, start_layer=split).astype(jnp.float32)
            return model.quantizer.encode(
                _q_state(model.quantizer, p['quantizer']), emb)

        _FNS[key] = (jax.jit(front, static_argnums=(4, 5)), jax.jit(back))
    front_fn, back_fn = _FNS[key]

    enc_params = _cast_tree(params['encoder'], compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    ss, gs, F_out = _window_plan(T_f, W, halo)
    pieces = [front_fn(enc_params, x, jnp.int32(s * hop), jnp.int32(g - s),
                       W * hop, F_out)
              for s, g in zip(ss, gs)]
    body = jnp.concatenate(pieces[:-1], axis=2)[:, :, :T_f - F_out]
    feat = jnp.concatenate([body, pieces[-1]], axis=2)
    codes = back_fn(params, enc_params, feat)
    return codes, None
