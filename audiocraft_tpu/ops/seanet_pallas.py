"""Fused SEANet encoder-stage Pallas kernels.

The EnCodec encoder's early stages are HBM-bandwidth bound: at 32 kHz the
first stage carries ``[B, 320k, 64]`` activations that XLA round-trips to HBM
for every conv / pad / ELU (reference topology:
/root/reference/audiocraft/modules/seanet.py:63-153).  This kernel fuses one
full *stage* —

    resnet block (ELU-conv3-ELU-conv1 + skip)  ->  ELU
    ->  strided downsample conv (kernel = 2*stride)

— keeping the full-rate activations in VMEM, so HBM sees the stage input once
and the s-times-smaller stage output once.  The encoder's k7 input conv runs
in XLA in NWC layout with its output channels zero-padded to the 128-lane
tile (one HBM write, no transposes), feeding stage 1 directly.

Design notes (TPU, learned against the real Mosaic compiler):
* Layout is time-on-sublanes / channels-on-lanes ``[B, T, C]``: conv taps are
  sublane shifts, channel mixing is an MXU matmul with C contraction.
* The stride-s downsample (kernel 2s) merges s consecutive time rows into
  lanes (``[T, C] -> [T/s, s*C]``) and takes 3 matmuls with zero-structured
  tap matrices (left/mid/right groups) — contraction s*C.  Mosaic only
  lowers that merge reshape when the source lane dim is a full 128 tile, so
  channels are padded to 128 with exact zeros.
* DMA slices must be tile-aligned: the scratch base row is s*To*t - 16
  (s*To % 16 == 0 by tile choice), making every DMA offset/size a multiple
  of 16 rows x 128 lanes.
* Reference padding semantics are *exact*: the interior needs no padding at
  all (halo DMA), and the reflect-pad rows at the sequence edges are
  reconstructed in-kernel for the first/last tile.  Anything off-pattern
  falls back to the XLA stage.
* All matmuls accumulate in fp32 (`preferred_element_type`); activations are
  stored bf16 in VMEM.
"""

from __future__ import annotations

import dataclasses
import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports fail on some backends; the XLA fallback never needs them
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """One encoder stage: res(k3,k1) -> ELU -> down(k=2s, stride s)."""
    c_in: int            # stage channel count (res block width)
    c_out: int           # after downsample (2*c_in in SEANet)
    stride: int
    hidden: int = 0      # res bottleneck; default c_in // 2
    input_padded: bool = False  # input arrives lane-padded to c_pad with 0s

    @property
    def res_hidden(self) -> int:
        return self.hidden or self.c_in // 2

    @property
    def right_pad(self) -> int:
        # reference conv.py:196-199: padding_right = total // 2,
        # padding_left = total - padding_right (left gets the larger half)
        return self.stride // 2

    @property
    def left_pad(self) -> int:
        return self.stride - self.right_pad

    @property
    def c_pad(self) -> int:
        """Channel count padded to the 128-lane tile."""
        return max(128, ((self.c_in + 127) // 128) * 128)


def _merge_tap_matrices(wd: jax.Array, spec: StageSpec) -> jax.Array:
    """Build the 3 zero-structured tap matrices [3, s*c_pad, C_out] for the
    merged-row downsample matmul (jit-traceable).

    Window for output u covers input rows [s*u - left, s*u - left + 2s):
    merged group u-1 contributes its last `left` slots (taps 0..left-1),
    group u all s slots, group u+1 its first `right` slots.  Row stride is
    the lane-padded channel count; padded rows stay zero, which both keeps
    the math exact and annihilates any garbage in the padded lanes.
    """
    s, c_in, c_out = spec.stride, spec.c_in, spec.c_out
    cp = spec.c_pad
    left = spec.left_pad
    taps = jnp.zeros((3, s * cp, c_out), wd.dtype)
    for k in range(2 * s):
        if k < left:
            g, slot = 0, s - left + k
        elif k < left + s:
            g, slot = 1, k - left
        else:
            g, slot = 2, k - left - s
        # wd layout: [C_out, C_in, K] (torch conv weight)
        taps = taps.at[g, slot * cp:slot * cp + c_in, :].set(wd[:, :, k].T)
    return taps


def stage_params_from_tree(params: dict, spec: StageSpec,
                           layer_ids: tp.Sequence[int],
                           dtype=jnp.bfloat16) -> dict:
    """Convert SEANetEncoder param subtree (layer{i} entries for [res, down])
    into the kernel's layout (jit-traceable), channel dims zero-padded to
    the lane tile."""
    cp = spec.c_pad
    ids = list(layer_ids)

    def padc(w, axis):
        if w.shape[axis] == cp:
            return w
        pad = [(0, 0)] * w.ndim
        pad[axis] = (0, cp - w.shape[axis])
        return jnp.pad(w, pad)

    out: dict = {}
    pres = params[f'layer{ids.pop(0)}']
    w1 = jnp.asarray(pres['conv0']['weight'])          # [H, C, 3]
    out['w1'] = padc(w1.transpose(2, 1, 0), 1).astype(dtype)  # [3, CP, H]
    out['b1'] = jnp.asarray(pres['conv0']['bias'])[None, :].astype(dtype)
    w2 = jnp.asarray(pres['conv1']['weight'])[:, :, 0]  # [C, H]
    out['w2'] = padc(w2.T, 1).astype(dtype)             # [H, CP]
    out['b2'] = padc(jnp.asarray(pres['conv1']['bias'])[None, :],
                     1).astype(dtype)
    pdown = params[f'layer{ids.pop(0)}']
    taps = _merge_tap_matrices(jnp.asarray(pdown['weight']), spec)
    out['taps'] = taps.astype(dtype)                    # [3, s*CP, C_out]
    out['bd'] = jnp.asarray(pdown['bias'])[None, :].astype(dtype)
    return out


def _choose_tile(n_out: int, stride: int, target: int = 2048
                 ) -> tp.Optional[int]:
    """Largest tile <= target dividing n_out with >= 2 tiles and
    stride*tile % 16 == 0 (every DMA offset/size stays 16-row aligned)."""
    for t in range(min(target, n_out // 2), 15, -1):
        if n_out % t == 0 and (stride * t) % 16 == 0:
            if n_out // t >= 2:
                return t
    return None


def _elu(x: jax.Array) -> jax.Array:
    """ELU(alpha=1) without expm1 (not lowered by Pallas TPU)."""
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _stage_kernel(spec: StageSpec, To: int, L_in: int, n_tiles: int,
                  SR_pad: int, SIZE_A: int, *refs):
    """Kernel body.

    Geometry (all DMAs 16-row aligned): scratch position p of the `a` buffer
    holds global row  s*To*t - 16 + p , so the interior DMA source offset
    s*To*t - 16 and every transfer size are multiples of 16 (s*To % 16 == 0
    by tile choice).  The first/last tile use shifted same-mapping DMAs plus
    zero-fill of the uncovered rows; rows outside the sequence only ever
    feed reflect-overwritten or zero-tap outputs.

    refs: [x_hbm, w1, b1, w2, b2, taps, bd, out_ref, a_scr, r_scr, sem]
    """
    s = spec.stride
    CP = spec.c_pad
    H = spec.res_hidden
    SR = s * (To + 2)            # r rows per tile
    OFF = 16 - s                 # a position of the first skip-add row

    (x_hbm, w1, b1, w2, b2, taps, bd, out_ref, a_scr, r_scr, sem) = refs

    b = pl.program_id(0)
    t = pl.program_id(1)
    # s*To % 16 == 0 by tile choice; tell Mosaic so the dynamic DMA offset
    # provably stays tile-aligned
    base = pl.multiple_of(s * To * t, 16)

    @pl.when(t == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm.at[b, 0:SIZE_A - 16, :],
                                   a_scr.at[16:SIZE_A], sem)
        cp.start()
        cp.wait()
        a_scr[0:16, :] = jnp.zeros((16, CP), a_scr.dtype)

    @pl.when(jnp.logical_and(t > 0, t < n_tiles - 1))
    def _():
        cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(pl.multiple_of(base - 16, 16), SIZE_A), :],
                                   a_scr.at[0:SIZE_A], sem)
        cp.start()
        cp.wait()

    @pl.when(t == n_tiles - 1)
    def _():
        K = s * To + 16
        cp = pltpu.make_async_copy(x_hbm.at[b, L_in - K:L_in, :],
                                   a_scr.at[0:K], sem)
        cp.start()
        cp.wait()
        a_scr[K:SIZE_A, :] = jnp.zeros((SIZE_A - K, CP), a_scr.dtype)

    # ---- reflect fill at global sequence edges (reference pad1d semantics)
    # a row -1 := a[1]  (position 15 := 17); a row L := a[L-2]
    @pl.when(t == 0)
    def _():
        a_scr[15, :] = a_scr[17, :]
    @pl.when(t == n_tiles - 1)
    def _():
        a_scr[s * To + 16, :] = a_scr[s * To + 14, :]

    # ---- resnet block: r = a + conv1x1(ELU(conv3(ELU(a))))
    # r row (local i) reads a positions i + OFF - 1 .. i + OFF + 1
    act_a = _elu(a_scr[...].astype(jnp.float32)).astype(a_scr.dtype)
    z = jnp.zeros((SR, H), jnp.float32)
    for d in range(3):
        z = z + jax.lax.dot(act_a[OFF - 1 + d:OFF - 1 + d + SR, :], w1[d],
                            preferred_element_type=jnp.float32)
    z = _elu(z + b1[...].astype(jnp.float32)).astype(a_scr.dtype)
    r = a_scr[OFF:OFF + SR, :].astype(jnp.float32) + \
        jax.lax.dot(z, w2[...], preferred_element_type=jnp.float32) + \
        b2[...].astype(jnp.float32)

    # ---- ELU + reflect fill for the downsample conv's edge pads
    r_scr[0:SR, :] = _elu(r).astype(r_scr.dtype)
    left, right = spec.left_pad, spec.right_pad
    @pl.when(t == 0)
    def _():
        for i in range(1, left + 1):      # r row -i := r[i]
            r_scr[s - i, :] = r_scr[s + i, :]
    @pl.when(t == n_tiles - 1)
    def _():
        for i in range(right):            # r row L+i := r[L-2-i]
            r_scr[SR - s + i, :] = r_scr[SR - s - 2 - i, :]

    # ---- downsample: merge s rows into lanes, 3 tap matmuls.
    # r_scr is (16*s)-row aligned so the sublane->lane merge reshape stays on
    # full tiles; rows >= SR are never read by the M[0:To+2] slices.
    M = r_scr[...].reshape(SR_pad // s, s * CP)
    out = jax.lax.dot(M[0:To, :], taps[0],
                      preferred_element_type=jnp.float32)
    out = out + jax.lax.dot(M[1:To + 1, :], taps[1],
                            preferred_element_type=jnp.float32)
    out = out + jax.lax.dot(M[2:To + 2, :], taps[2],
                            preferred_element_type=jnp.float32)
    out_ref[0, :, :] = (out + bd[...].astype(jnp.float32)).astype(out_ref.dtype)


def fused_stage(x: jax.Array, kparams: dict, spec: StageSpec,
                tile: int = 2048, interpret: bool = False
                ) -> tp.Optional[jax.Array]:
    """Run one fused encoder stage.

    x: stage input, layout [B, T, c_pad] (bf16) — exactly c_pad lanes; when
    c_in < c_pad the caller guarantees zero padding (spec.input_padded).
    Returns [B, T//s, C_out] or None if the shape is ineligible.
    """
    if not _HAS_PALLAS:
        return None
    s = spec.stride
    B = x.shape[0]
    if spec.c_in != spec.c_pad and not spec.input_padded:
        return None
    if x.shape[2] != spec.c_pad:
        return None
    L_in = x.shape[1]
    if L_in % s or L_in <= 0:
        return None
    U = L_in // s
    To = _choose_tile(U, s, tile)
    if To is None:
        return None
    n_tiles = U // To
    SR = s * (To + 2)
    SIZE_A = s * To + 32          # positions [16-s, s*To+s+17) rounded to 16
    assert SIZE_A >= (16 - s) + SR + 2
    align = 16 * s
    SR_pad = ((SR + align - 1) // align) * align

    kernel = functools.partial(_stage_kernel, spec, To, L_in, n_tiles,
                               SR_pad, SIZE_A)
    weights = [kparams[n] for n in ('w1', 'b1', 'w2', 'b2', 'taps', 'bd')]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + \
        [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    CP = spec.c_pad
    scratch = [pltpu.VMEM((SIZE_A, CP), x.dtype),
               pltpu.VMEM((SR_pad, CP), x.dtype),
               pltpu.SemaphoreType.DMA(())]

    flops_tile = 2 * SR * (3 * CP * spec.res_hidden + spec.res_hidden * CP) \
        + 2 * To * 3 * s * CP * spec.c_out
    bytes_tile = (SIZE_A * CP + To * spec.c_out) * x.dtype.itemsize

    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, To, spec.c_out),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, U, spec.c_out), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * B * n_tiles,
            bytes_accessed=bytes_tile * B * n_tiles,
            transcendentals=2 * SIZE_A * CP * B * n_tiles),
        interpret=interpret,
    )(x, *weights)


# --------------------------------------------------------- encoder plumbing

def nwc_input_conv(x: jax.Array, weight: jax.Array, bias: jax.Array,
                   c_pad: int) -> jax.Array:
    """The encoder's first conv (k7, stride 1, reflect pad) in NWC layout
    with output channels zero-padded to `c_pad`.

    x: [B, T, C_in] -> [B, T, c_pad].  One HBM write at the padded width, no
    transposes; exact reference pad math (k7 s1 => extra_padding 0, 3/3).
    """
    cout, cin, k = weight.shape
    assert k % 2 == 1
    h = (k - 1) // 2
    xp = jnp.concatenate([x[:, 1:h + 1][:, ::-1], x, x[:, -h - 1:-1][:, ::-1]],
                         axis=1)
    w = weight.transpose(2, 1, 0)                      # [K, C_in, C_out]
    if cout < c_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad - cout)))
        bias = jnp.pad(bias, (0, c_pad - cout))
    y = jax.lax.conv_general_dilated(
        xp, w.astype(x.dtype), window_strides=(1,), padding='VALID',
        dimension_numbers=('NWC', 'WIO', 'NWC'),
        preferred_element_type=jnp.float32)
    return (y + bias[None, None, :]).astype(x.dtype)


def encoder_stage_plan(enc) -> tp.List[tp.Tuple[StageSpec, tp.List[int]]]:
    """Leading fusible stages of a SEANetEncoder config.

    Returns [(spec, layer_ids)] covering a prefix of the per-ratio stages
    (layer 0's input conv is handled by `nwc_input_conv`); empty when the
    topology doesn't match the kernel's pattern.
    """
    if (enc.n_residual_layers != 1 or not enc.true_skip or enc.causal
            or enc.activation.lower() != 'elu' or enc.activation_alpha != 1.0
            or enc.pad_mode != 'reflect' or enc.residual_kernel_size != 3
            or enc.compress != 2 or enc.dilation_base < 1
            or enc.norm not in ('none', 'weight_norm')
            or enc.channels != 1 or enc.kernel_size % 2 != 1):
        return []
    plan: tp.List[tp.Tuple[StageSpec, tp.List[int]]] = []
    mult = 1
    for si, ratio in enumerate(enc.enc_ratios):
        c = mult * enc.n_filters
        base = 1 + 3 * si  # layers: [conv0, (res, act, down) * n_ratios, ...]
        spec = StageSpec(c_in=c, c_out=2 * c, stride=ratio,
                         input_padded=(si == 0))
        if spec.c_in != spec.c_pad and not spec.input_padded:
            break
        plan.append((spec, [base, base + 2]))
        mult *= 2
    return plan


def fused_encoder_apply(enc, params: dict, x: jax.Array, n_stages: int,
                        interpret: bool = False
                        ) -> tp.Optional[tp.Tuple[jax.Array, int]]:
    """Run the input conv (NWC, padded) + the first `n_stages` encoder
    stages through the fused kernel.

    x: [B, C, T].  Returns (y [B, C', T'], next_layer_index) or None when no
    stage could be fused (caller falls back to the XLA stack).
    """
    plan = encoder_stage_plan(enc)[:n_stages]
    if not plan:
        return None
    spec0, ids0 = plan[0]
    # stage eligibility must hold before we commit to the padded conv0
    if _choose_tile(x.shape[-1] // spec0.stride, spec0.stride) is None \
            or x.shape[-1] % spec0.stride:
        return None
    p0 = params['layer0']
    xt = nwc_input_conv(jnp.swapaxes(x, 1, 2), jnp.asarray(p0['weight']),
                        jnp.asarray(p0['bias']), spec0.c_pad)
    next_layer = 0
    for spec, ids in plan:
        kp = stage_params_from_tree(params, spec, ids, xt.dtype)
        y = fused_stage(xt, kp, spec, interpret=interpret)
        if y is None:
            break
        xt = y
        next_layer = ids[-1] + 1
    if next_layer == 0:
        return None
    return jnp.swapaxes(xt, 1, 2), next_layer


# ------------------------------------------------ banded mono conv kernel (v2)

def _banded_conv_kernel(R_pad: int, *refs):
    """conv0 as two accumulated MXU matmuls per (batch, channel) grid cell.

    Every output at ``t = 128*r + l`` sees inputs ``t .. t+K-1`` inside the
    256-sample window ``xs[r] ++ xs[r+1]``; the banded weight matrix
    ``bflat[m, c*128+l] = w[c, m-l]`` turns the K-tap conv into a dense
    MXU-shaped contraction, unlike the K-deep one XLA lowers the native conv
    to.  The window concat itself doesn't lower (Mosaic can't concat
    operands with mismatched sublane offsets), so the contraction is split
    into the top/bottom 128 rows of the band: ``cur @ btop + nxt @ bbot``.

    Grid = (B, C_out) with the FULL time range per cell: iterating time
    tiles instead (v2/v3) made every output block a strided 64-chunk DMA
    (one chunk per channel) and pinned the kernel at ~2x the write floor.
    Here each cell's output block [1, 1, R_pad, 128] is one contiguous
    stretch of the NCW-tiled output, and the input rows are DMA'd into
    persistent scratch once per batch element (at c == 0 only).

    The per-channel weight blocks arrive via BlockSpec index maps
    (pipeline-cached); the bias is an SMEM scalar read.

    refs: [x2_hbm, btop, bbot, bias_v, out_ref, xs, sem]
    """
    x2_hbm, btop, bbot, bias_v, out_ref, xs, sem = refs
    bidx = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _load():
        cp = pltpu.make_async_copy(x2_hbm.at[bidx], xs, sem)
        cp.start()
        cp.wait()

    cur = xs[0:R_pad, :]
    nxt = xs[1:R_pad + 1, :]
    acc = jax.lax.dot(cur, btop[...], preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot(nxt, bbot[...],
                            preferred_element_type=jnp.float32)
    out_ref[0, 0, :, :] = (acc + bias_v[c]).astype(out_ref.dtype)


def banded_mono_conv(x: jax.Array, weight: jax.Array, bias: jax.Array,
                     interpret: bool = False) -> tp.Optional[jax.Array]:
    """The encoder's first conv (C_in=1, stride 1) as a banded-matmul Pallas
    kernel.  x: [B, 1, T+K-1] (pre-padded), weight [C_out, 1, K]
    -> [B, C_out, T].  Returns None when ineligible; caller falls back.
    """
    if not _HAS_PALLAS:
        return None
    B, cin, Tp = x.shape
    cout, _, k = weight.shape
    T = Tp - (k - 1)
    # T % 128 == 0 keeps the output exactly [B, C, R, 128] -> a free reshape
    # to [B, C, T]; any padded tail would force XLA to copy 1.3 GB (b32) for
    # the slice, which in-graph costs more than the kernel saves.
    if cin != 1 or k >= 128 or T <= 0 or T % 128:
        return None
    R = T // 128                           # output rows of 128 samples
    R_pad = ((R + 7) // 8) * 8             # scratch rows stay DMA-aligned
    # VMEM budget: input rows + fp32 accumulator + double-buffered out block
    if (R_pad + 8) * 128 * (x.dtype.itemsize + 4 + 2 * x.dtype.itemsize) \
            > 96 * 1024 * 1024:
        return None

    xf = x[:, 0, :]
    tail = (R_pad + 8) * 128 - Tp
    xp = jnp.concatenate([xf, jnp.zeros((B, tail), x.dtype)], axis=1)
    x2 = xp.reshape(B, R_pad + 8, 128)

    # bflat[m, c*128 + l] = w[c, m - l] on the band 0 <= m - l < k
    m_idx = np.arange(256)[:, None]
    l_idx = np.arange(128)[None, :]
    diag = m_idx - l_idx
    band = jnp.asarray((diag >= 0) & (diag < k), x.dtype)
    gather = jnp.asarray(np.clip(diag, 0, k - 1))
    bmat = weight[:, 0, gather].astype(x.dtype) * band[None]   # [C, 256, 128]
    bflat = jnp.transpose(bmat, (1, 0, 2)).reshape(256, cout * 128)
    btop, bbot = bflat[:128], bflat[128:]

    kernel = functools.partial(_banded_conv_kernel, R)
    out4 = pl.pallas_call(
        kernel,
        grid=(B, cout),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((128, 128), lambda bi, c: (0, c),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 128), lambda bi, c: (0, c),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, R, 128),
                               lambda bi, c: (bi, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cout, R, 128), x.dtype),
        scratch_shapes=[pltpu.VMEM((R_pad + 8, 128), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 256 * cout * 128 * R * B,
            bytes_accessed=(T + cout * T) * B * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, btop, bbot, jnp.asarray(bias, jnp.float32))
    return out4.reshape(B, cout, T)


# ----------------------------------------------------- mono input conv kernel

def _mono_conv_kernel(k: int, c_out: int, Rt: int, n_tiles: int, *refs):
    """conv0 kernel body: x2 rows are 128-sample lane chunks; tap shifts are
    lane rotations with a row-carry select; one K-contraction matmul.

    refs: [x2_hbm, w, b, out_ref, xs, sem]
    """
    x2_hbm, w, b, out_ref, xs, sem = refs
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    r0 = pl.multiple_of(t * Rt, 8)
    # transfer sizes must be 8-row aligned; the buffer carries 8 halo rows
    # of which only the first matters
    cp = pltpu.make_async_copy(x2_hbm.at[bidx, pl.ds(r0, Rt + 8), :],
                               xs.at[0:Rt + 8], sem)
    cp.start()
    cp.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (Rt, 128), 1)
    # Mosaic's lane rotate only handles 32-bit data; shift in fp32
    cur = xs[0:Rt, :].astype(jnp.float32)
    nxt = xs[1:Rt + 1, :].astype(jnp.float32)
    planes = []
    for d in range(k):
        if d == 0:
            planes.append(cur)
        else:
            # plane_d[r, l] = flat[128*r + l + d]; pltpu.roll is a circular
            # right-shift, so left-by-d == right-by-(128-d)
            rc = pltpu.roll(cur, 128 - d, 1)
            rn = pltpu.roll(nxt, 128 - d, 1)
            planes.append(jnp.where(lane < 128 - d, rc, rn))
    S = jnp.stack(planes).reshape(k, Rt * 128)
    out = jax.lax.dot(w[...].astype(jnp.float32), S,
                      preferred_element_type=jnp.float32)
    out = out + b[...].astype(jnp.float32)
    out_ref[0, :, :, :] = out.reshape(c_out, Rt, 128).astype(out_ref.dtype)


def mono_input_conv(x: jax.Array, weight: jax.Array, bias: jax.Array,
                    tile_rows: int = 64, interpret: bool = False
                    ) -> tp.Optional[jax.Array]:
    """The encoder's first conv (C_in=1, odd k, stride 1, reflect pad) as a
    Pallas kernel — XLA lowers this conv ~20x off roofline (PERF.md).

    x: [B, 1, T] -> [B, C_out, T].  Returns None when ineligible
    (pallas unavailable or T % 128 != 0); caller falls back to XLA.

    Status: token-exact vs XLA on the real chip; 13.8 ms vs 14.0 ms at
    batch 32 (Rt=64; larger tiles regress — the K=7 matmul + per-tile
    relayouts dominate, not DMA).  Not wired into the default path; kept as
    the starting point for a future conv0 effort (PERF.md).
    """
    if not _HAS_PALLAS:
        return None
    B, cin, T = x.shape
    cout, _, k = weight.shape
    h = (k - 1) // 2
    if cin != 1 or k % 2 == 0 or T % 128 or 2 * h >= 128:
        return None
    R = T // 128
    # DMA row offsets must be 8-aligned, so tiles are multiples of 8 rows and
    # R pads up to the tile grid (the zero tail is sliced off after).
    Rt = max(8, (min(tile_rows, max(R // 2, 8)) // 8) * 8)
    R_pad = ((R + Rt - 1) // Rt) * Rt
    n_tiles = R_pad // Rt
    if n_tiles < 1:
        return None

    xf = x[:, 0, :]
    # x_pad[i] = x[i - h] with reflect edges; zero tail pads to the tile grid
    # plus eight halo rows (DMA sizes must be 8-row aligned)
    tail = (R_pad + 8) * 128 - (T + 2 * h)
    xp = jnp.concatenate(
        [xf[:, 1:h + 1][:, ::-1], xf, xf[:, -h - 1:-1][:, ::-1],
         jnp.zeros((B, tail), x.dtype)], axis=1)
    x2 = xp.reshape(B, R_pad + 8, 128)
    w = weight[:, 0, :].astype(x.dtype)            # [C_out, k]
    b = bias[None, :].astype(x.dtype)              # [1, C_out] -> use [C,1]
    b = jnp.swapaxes(b, 0, 1)                      # [C_out, 1]

    kernel = functools.partial(_mono_conv_kernel, k, cout, Rt, n_tiles)
    out4 = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, cout, Rt, 128),
                               lambda bi, ti: (bi, 0, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cout, R_pad, 128), x.dtype),
        scratch_shapes=[pltpu.VMEM((Rt + 8, 128), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * cout * T * B,
            bytes_accessed=(T + cout * T) * B * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, w, b)
    # the zero-tail slice fuses with the consumer's own pad/copy
    return out4.reshape(B, cout, R_pad * 128)[..., :T]
