"""Pallas TPU kernel for multilevel RoIAlign — window-DMA + MXU sampling.

Behavioral reference: same semantics as ``ops.roi_align`` (which matches
``lib/model/csrc/cuda/ROIAlign_cuda.cu``); A/B parity-tested against it.

Kernel design (one grid step per roi):
  1. Scalar-prefetched per-roi metadata (level id, window origin, roi
     geometry in window coordinates) lets the kernel start its DMA before
     the body runs (PrefetchScalarGridSpec).
  2. A fixed-size feature WINDOW around the roi is DMA'd HBM -> VMEM from
     the roi's pyramid level (per-level window sizes are static: coarse
     levels are small enough to window entirely).
  3. Bilinear sampling is two small MATMULS with linear-interpolation "hat"
     weight matrices built in-kernel from iota — the same gather-free trick
     as ``solve.dense_align`` — so the inner loop runs on the MXU instead
     of issuing thousands of scalar gathers.
  4. Bin-averaging is a reshape + mean on the VPU; one [P, P, C] tile is
     written per roi.

The public wrapper handles FPN level assignment and falls back to the XLA
atlas implementation on non-TPU backends (Pallas interpret mode is used in
tests).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_rcnn_tpu.ops.roi_align import fpn_level_assignment

# Max window (rows, cols) in level cells; clamped per level to the level's
# own extent.  96 cols covers the widest realistic KITTI box at its
# assigned level (see level-assignment bound discussion in ops/roi_align).
_WIN_H, _WIN_W = 48, 96


def _window_shapes(level_shapes):
    return [(min(h, _WIN_H), min(w, _WIN_W)) for h, w in level_shapes]


def _kernel(meta_ref, geom_ref, *refs, num_levels: int, p: int, s: int,
            win_shapes, c: int, out_dtype):
    """One roi per grid step.

    meta_ref (SMEM int32 [N, 4]): level, y0, x0, valid.
    geom_ref (SMEM f32 [N, 4]): y1, x1 (roi origin in window coords),
      bin_h, bin_w (level cells).
    refs: num_levels feature refs (HBM) + out_ref + scratch VMEM windows
      (one per level shape) + one DMA semaphore.
    """
    feat_refs = refs[:num_levels]
    out_ref = refs[num_levels]
    scratch = refs[num_levels + 1:num_levels + 1 + num_levels]
    sem = refs[-1]

    i = pl.program_id(0)
    level = meta_ref[i, 0]
    y0 = meta_ref[i, 1]
    # The wrapper 8-aligns x0 (W is the sublane-tiled axis); the compiler
    # needs the divisibility hint to slice HBM at a dynamic offset.
    x0 = pl.multiple_of(meta_ref[i, 2], 8)
    valid = meta_ref[i, 3]

    ps = p * s

    def sample_from(window, wh, ww):
        """window: [wh, ww, C] VMEM array -> [P, P, C] pooled output."""
        y1 = geom_ref[i, 0]
        x1 = geom_ref[i, 1]
        bin_h = geom_ref[i, 2]
        bin_w = geom_ref[i, 3]
        grid = (jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0)[:, 0]
                .astype(jnp.float32) + 0.5) / s
        ys = y1 + grid * bin_h                       # [PS] window coords
        xs = x1 + grid * bin_w
        ys = jnp.clip(ys, 0.0, wh - 1.0)
        xs = jnp.clip(xs, 0.0, ww - 1.0)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (ps, wh),
                                          1).astype(jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (ps, ww),
                                          1).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(iota_h - ys[:, None]))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_w - xs[:, None]))
        # rows: [PS, wh] @ [wh, ww*C] -> [PS, ww, C]
        tmp = jnp.dot(wy, window.reshape(wh, ww * c),
                      preferred_element_type=jnp.float32).reshape(ps, ww, c)
        # cols: contract ww between [PS, ww] and [PS, ww, C].
        out = jax.lax.dot_general(
            wx, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [PSx, PSy, C]
        out = jnp.swapaxes(out, 0, 1)                # [PSy, PSx, C]
        pooled = out.reshape(p, s, p, s, c).mean(axis=(1, 3))
        return pooled

    for lvl in range(num_levels):
        wh, ww = win_shapes[lvl]

        @pl.when(level == lvl)
        def _():
            dma = pltpu.make_async_copy(
                feat_refs[lvl].at[pl.ds(y0, wh), pl.ds(x0, ww), :],
                scratch[lvl], sem)
            dma.start()
            dma.wait()
            pooled = sample_from(scratch[lvl][:], wh, ww)
            out_ref[0] = (pooled *
                          (valid > 0).astype(jnp.float32)).astype(out_dtype)


def roi_align_pallas_single(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                            strides: Sequence[int], output_size: int,
                            sampling_ratio: int = 2,
                            interpret: bool = False) -> jnp.ndarray:
    """Multilevel RoIAlign for ONE image via the Pallas kernel.

    feats: list of [H_l, W_l, C]; rois: [R, 4] image coords.
    Returns [R, P, P, C] float32.
    """
    r = rois.shape[0]
    c = feats[0].shape[-1]
    p, s = output_size, sampling_ratio
    num_levels = len(feats)
    level_shapes = [(f.shape[0], f.shape[1]) for f in feats]
    win_shapes = _window_shapes(level_shapes)

    levels = fpn_level_assignment(rois, num_levels)          # [R]
    lvl_scale = 1.0 / jnp.asarray(strides, jnp.float32)[levels]
    lvl_h = jnp.asarray([h for h, _ in level_shapes], jnp.float32)[levels]
    lvl_w = jnp.asarray([w for _, w in level_shapes], jnp.float32)[levels]
    win_h = jnp.asarray([h for h, _ in win_shapes], jnp.float32)[levels]
    win_w = jnp.asarray([w for _, w in win_shapes], jnp.float32)[levels]

    scaled = rois * lvl_scale[:, None]
    x1, y1 = scaled[:, 0], scaled[:, 1]
    roi_w = jnp.maximum(scaled[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(scaled[:, 3] - y1, 1.0)

    # Window origin: center the window on the roi, clamped inside the level.
    # The W axis is sublane-tiled (8): its dynamic slice offset must be a
    # multiple of 8, so align x0 down (window widths are all multiples of 8).
    y0 = jnp.clip(jnp.floor(y1 + roi_h / 2 - win_h / 2), 0,
                  jnp.maximum(lvl_h - win_h, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x1 + roi_w / 2 - win_w / 2), 0,
                  jnp.maximum(lvl_w - win_w, 0)).astype(jnp.int32)
    x0 = (x0 // 8) * 8

    valid = (roi_w > 0) & (roi_h > 0)
    meta = jnp.stack([levels, y0, x0, valid.astype(jnp.int32)],
                     axis=-1).astype(jnp.int32)              # [R, 4]
    geom = jnp.stack([y1 - y0.astype(jnp.float32),
                      x1 - x0.astype(jnp.float32),
                      roi_h / p, roi_w / p], axis=-1)        # [R, 4]

    kernel = functools.partial(
        _kernel, num_levels=num_levels, p=p, s=s, win_shapes=win_shapes,
        c=c, out_dtype=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)
                  for _ in range(num_levels)],
        out_specs=pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((wh, ww, c), feats[0].dtype)
                        for wh, ww in win_shapes] +
                       [pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, p, p, c), jnp.float32),
        interpret=interpret,
    )(meta, geom, *feats)
    return out


def multilevel_roi_align_pallas(feats, rois, strides, output_size,
                                sampling_ratio: int = 2,
                                interpret: bool = False):
    """Batched wrapper: feats [B, H, W, C] per level, rois [B, R, 4]."""
    squeeze = rois.ndim == 2
    if squeeze:
        feats = [f[None] for f in feats]
        rois = rois[None]
    fn = functools.partial(roi_align_pallas_single, strides=strides,
                           output_size=output_size,
                           sampling_ratio=sampling_ratio,
                           interpret=interpret)
    out = jax.vmap(lambda fs, r: fn(list(fs), r))(list(feats), rois)
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Fused STEREO RoIAlign: left 7x7 + right 7x7 + left 14x14 in ONE grid pass.
#
# Two observations make this the fast path for the detector (SURVEY.md §3.4
# fact 4: RoIAlign runs on left AND right features, and the keypoint branch
# pools the left roi again at 14x14):
#   * With pooling 7x7/sampling 2 and 14x14/sampling 1 the SAMPLE POSITIONS
#     are identical — one [14, 14, C] sampling pass serves both left
#     outputs (the 7x7 head input is just its 2x2 bin-mean).
#   * Fusing all three aligns turns 3 sequential kernel launches x R grid
#     steps into one, and the left window is DMA'd once instead of twice.
# ---------------------------------------------------------------------------

def _roi_window_meta(level_shapes, win_shapes, rois, strides, ps):
    """meta [R, 4] (level, y0, x0, valid) + geom [R, 4] (y1, x1, bin_h,
    bin_w) for a roi set, window origins 8-aligned on the W axis."""
    levels = fpn_level_assignment(rois, len(level_shapes))
    lvl_scale = 1.0 / jnp.asarray(strides, jnp.float32)[levels]
    lvl_h = jnp.asarray([h for h, _ in level_shapes], jnp.float32)[levels]
    lvl_w = jnp.asarray([w for _, w in level_shapes], jnp.float32)[levels]
    win_h = jnp.asarray([h for h, _ in win_shapes], jnp.float32)[levels]
    win_w = jnp.asarray([w for _, w in win_shapes], jnp.float32)[levels]
    scaled = rois * lvl_scale[:, None]
    x1, y1 = scaled[:, 0], scaled[:, 1]
    roi_w = jnp.maximum(scaled[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(scaled[:, 3] - y1, 1.0)
    y0 = jnp.clip(jnp.floor(y1 + roi_h / 2 - win_h / 2), 0,
                  jnp.maximum(lvl_h - win_h, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(x1 + roi_w / 2 - win_w / 2), 0,
                  jnp.maximum(lvl_w - win_w, 0)).astype(jnp.int32)
    x0 = (x0 // 8) * 8
    # Validity from the RAW rois (pre-clamp): zero-area padded rois must
    # produce zero output (and zero gradient in the backward kernel).
    valid = (rois[:, 2] > rois[:, 0]) & (rois[:, 3] > rois[:, 1])
    meta = jnp.stack([levels, y0, x0, valid.astype(jnp.int32)],
                     -1).astype(jnp.int32)
    geom = jnp.stack([y1 - y0.astype(jnp.float32),
                      x1 - x0.astype(jnp.float32),
                      roi_h / ps, roi_w / ps], axis=-1)
    return meta, geom


def _hi_lo(w):
    """Split an f32 weight matrix into two bf16 parts whose sum carries
    ~2^-17 relative error: hi = bf16(w), lo = bf16(w - f32(hi)).  Two
    bf16 MXU passes reconstruct near-f32 precision at 2x the bf16 cost."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _sample_grid(window, wh, ww, c, ps, y1, x1, bin_h, bin_w,
                 hat_dtype=jnp.float32, avg: int = 1):
    """[ps, ps, C] bilinear samples at ((j+.5)*bin) offsets via hat-matmuls.

    ``hat_dtype`` selects the weight-matrix precision fed to the MXU:
      float32     — exact; two separate y/x hat matmuls
      bfloat16    — same structure, ~2^-9 relative weight error
      'hilo'      — two bf16 passes (see :func:`_hi_lo`), ~2^-17 error
      'kron_bf16' — ONE matmul with the combined kron weight
                    [ps*ps, wh*ww] (y-hat x x-hat), bf16
      'kron_hilo' — same, two bf16 hi/lo passes (~2^-17 error)

    Why kron: the two-matmul form needs a batched x-contraction plus a
    final swapaxes — VPU relayouts of ~1 MB per roi.  Ablation (see
    tools/bench_roialign.py) showed compute, not DMA or MXU rate,
    dominates the 18.7 us/roi step (compute-only 18.1, dma-only 12.5,
    bf16 hats no faster), so the kron form spends 11x more FLOPs
    (308 vs 28 MFLOP/side) to buy ZERO relayouts: the weight build is
    elementwise on the natural [ps*ps, wh*ww] layout, the window reshape
    [wh, ww, C] -> [wh*ww, C] merges leading dims (free), and the matmul
    output [ps*ps, C] IS the y-major result.

    ``avg``: bin-mean pooling FOLDED INTO THE WEIGHTS.  avg=s returns the
    [ps, ps, C] means of s x s sample blocks of the (ps*avg)-sample grid
    (``bin_h``/``bin_w`` are the FULL grid's steps, i.e. roi / (ps*avg)).
    Exact by linearity: mean of s*s bilinear samples == one sampling pass
    with the s-averaged hat rows — and the weight matrix shrinks s x in
    rows (e.g. the right side's 7x7/sr2 pool: [49, wh*ww] instead of
    [196, wh*ww] + a separate mean).
    """
    if isinstance(hat_dtype, str) and hat_dtype.startswith("kron"):
        # Sample positions vary only along rows (r = y*ps + x), cell
        # indices only along columns (q = h*ww + w): build both as thin
        # [R, 1] / [1, Q] arrays so the expensive int div/mod runs on
        # ~3K elements, and only the final hat compare+multiply touches
        # the full [ps*ps, wh*ww] tile.
        r_col = jax.lax.broadcasted_iota(jnp.int32, (ps * ps, 1), 0)
        y_idx = (r_col // ps).astype(jnp.float32)
        x_idx = (r_col % ps).astype(jnp.float32)
        q_row = jax.lax.broadcasted_iota(jnp.int32, (1, wh * ww), 1)
        h_idx = (q_row // ww).astype(jnp.float32)             # [1, wh*ww]
        w_idx = (q_row % ww).astype(jnp.float32)
        wy = wx = 0.0
        for a in range(avg):                      # avg-folded hat rows
            ys = jnp.clip(y1 + (y_idx * avg + a + 0.5) * bin_h,
                          0.0, wh - 1.0)                      # [ps*ps, 1]
            xs = jnp.clip(x1 + (x_idx * avg + a + 0.5) * bin_w,
                          0.0, ww - 1.0)
            wy = wy + jnp.maximum(0.0, 1.0 - jnp.abs(h_idx - ys))
            wx = wx + jnp.maximum(0.0, 1.0 - jnp.abs(w_idx - xs))
        wgt = wy * wx * (1.0 / (avg * avg))
        win2 = window.reshape(wh * ww, c)
        if hat_dtype == "kron_bf16":
            out = jnp.dot(wgt.astype(jnp.bfloat16), win2,
                          preferred_element_type=jnp.float32)
        else:
            hi, lo = _hi_lo(wgt)
            out = (jnp.dot(hi, win2, preferred_element_type=jnp.float32)
                   + jnp.dot(lo, win2, preferred_element_type=jnp.float32))
        return out.reshape(ps, ps, c)                # already y-major
    n = ps * avg
    grid = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            .astype(jnp.float32) + 0.5)
    ys = jnp.clip(y1 + grid * bin_h, 0.0, wh - 1.0)
    xs = jnp.clip(x1 + grid * bin_w, 0.0, ww - 1.0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (n, wh),
                                      1).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (n, ww),
                                      1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iota_h - ys[:, None]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_w - xs[:, None]))
    if avg > 1:
        wy = wy.reshape(ps, avg, wh).mean(axis=1)
        wx = wx.reshape(ps, avg, ww).mean(axis=1)

    def contract_y(wy_):
        return jnp.dot(wy_, window.reshape(wh, ww * c),
                       preferred_element_type=jnp.float32)

    if hat_dtype == "hilo":
        # y pass: the window is ALREADY bf16 (exact operand), so splitting
        # wy alone reconstructs the f32 product to ~2^-17.
        wy_hi, wy_lo = _hi_lo(wy)
        tmp = (contract_y(wy_hi) + contract_y(wy_lo)).reshape(ps, ww, c)
        # x pass: tmp is f32 — split BOTH operands; the lo x lo term is
        # ~2^-18 and dropped (3 small matmuls, vs the 2 big y-passes).
        tmp_hi = tmp.astype(jnp.bfloat16)
        tmp_lo = (tmp - tmp_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wx_hi, wx_lo = _hi_lo(wx)
        dn = (((1,), (1,)), ((), ()))
        out = (jax.lax.dot_general(wx_hi, tmp_hi, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(wx_hi, tmp_lo, dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
               + jax.lax.dot_general(wx_lo, tmp_hi, dimension_numbers=dn,
                                     preferred_element_type=jnp.float32))
    else:
        wy = wy.astype(hat_dtype)
        wx = wx.astype(hat_dtype)
        tmp = contract_y(wy).reshape(ps, ww, c)
        if hat_dtype != jnp.float32:
            tmp = tmp.astype(hat_dtype)
        out = jax.lax.dot_general(
            wx, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jnp.swapaxes(out, 0, 1)                   # [ps(y), ps(x), C]


def _stereo_kernel(meta_l_ref, geom_l_ref, meta_r_ref, geom_r_ref, *refs,
                   num_levels: int, p: int, pk: int, win_shapes, c: int,
                   n_rois: int, hat_dtype=jnp.float32,
                   bench_skip: str | None = None, packed_out: bool = False,
                   group: int = 1):
    """Double-buffered fused stereo RoIAlign, ``group`` rois per grid step.

    Scratch is ONE max-size window per (side, slot, group member); each
    level's window is DMA'd into its prefix so all levels share the
    buffer.  While step i's rois are being sampled, step i+1's windows
    are already in flight (ping-pong slots) — the per-step cost becomes
    max(DMA, compute) instead of their sum.  ``group`` > 1 amortizes the
    per-step machinery (output-block copy latency, grid sequencing) over
    several rois and keeps 2*group window DMAs in flight per side;
    requires ``packed_out`` (per-roi output blocks can't be grouped).

    MEASURED (v5e, tools/bench_roialign.py): group=2 is a NEGATIVE
    result — 16.4 us/roi vs 9.4 at group=1, despite a lower step floor
    (2.8 vs 3.5): the doubled window scratch (12.6 MB) pressures VMEM
    enough to wreck the rest of the pipeline stage, and group=4 does
    not compile at all.  group=1 is production; the parameter stays,
    bit-identical-tested, as the measurement lever that closed this
    line of inquiry.

    ``bench_skip`` (BENCH-ONLY, never set in production) ablates one half
    of the step so tools/bench_roialign.py can attribute the per-roi cost:
      'dma'     — skip all window DMAs; sample whatever is in scratch
                  (garbage values, correct shapes/timing of the compute)
      'compute' — run the DMAs but write constant outputs
    """
    assert group == 1 or packed_out, "group > 1 requires packed_out"
    feat_l = refs[:num_levels]
    feat_r = refs[num_levels:2 * num_levels]
    if packed_out:
        # ONE output block [group, pk*pk + 2*p*p, C] per step: per roi,
        # rows [0, pk*pk) = kpt samples, then 7x7 L, then 7x7 R.
        # Measured motivation: the per-step floor (write-zeros kernel, no
        # DMA/compute) is 12.5 us/roi with THREE out blocks — the grid
        # machinery's per-block output copies dominate the whole stage,
        # so pack them into one (and group rois to amortize further).
        packed_ref = refs[2 * num_levels]
        n_out = 1
    else:
        out14l_ref, out7l_ref, out7r_ref = \
            refs[2 * num_levels:2 * num_levels + 3]
        n_out = 3
    scratch_l, scratch_r = refs[2 * num_levels + n_out:
                                2 * num_levels + n_out + 2]
    sem_l, sem_r = refs[-2], refs[-1]

    i = pl.program_id(0)                             # step index
    n_steps = n_rois // group
    ps = pk                                          # = p * 2 = 14 samples

    def dma(side_feats, scratch, sem, meta_ref, j, slot, g):
        """Start-or-wait helper: returns the copy descriptors per level."""
        out = []
        for lvl in range(num_levels):
            wh, ww = win_shapes[lvl]
            y0 = meta_ref[j, 1]
            x0 = pl.multiple_of(meta_ref[j, 2], 8)
            out.append((lvl, pltpu.make_async_copy(
                side_feats[lvl].at[pl.ds(y0, wh), pl.ds(x0, ww), :],
                scratch.at[slot, g, pl.ds(0, wh), pl.ds(0, ww), :],
                sem.at[slot, g])))
        return out

    def start_group(step, slot):
        for g in range(group):
            j = step * group + g
            for meta_ref, feats, scratch, sem in (
                    (meta_l_ref, feat_l, scratch_l, sem_l),
                    (meta_r_ref, feat_r, scratch_r, sem_r)):
                for lvl, copy in dma(feats, scratch, sem, meta_ref, j,
                                     slot, g):
                    @pl.when(meta_ref[j, 0] == lvl)
                    def _():
                        copy.start()

    def wait_one(step, slot, g):
        j = step * group + g
        for meta_ref, feats, scratch, sem in (
                (meta_l_ref, feat_l, scratch_l, sem_l),
                (meta_r_ref, feat_r, scratch_r, sem_r)):
            for lvl, copy in dma(feats, scratch, sem, meta_ref, j,
                                 slot, g):
                @pl.when(meta_ref[j, 0] == lvl)
                def _():
                    copy.wait()

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    if bench_skip not in ("dma", "all"):
        @pl.when(i == 0)
        def _():
            start_group(0, 0)

        @pl.when(i + 1 < n_steps)
        def _():
            start_group(i + 1, nxt)

    if bench_skip in ("compute", "all"):
        if bench_skip == "compute":                  # consume the DMAs
            for g in range(group):
                wait_one(i, slot, g)
        for g in range(group):
            if packed_out:
                packed_ref[g] = jnp.zeros((ps * ps + 2 * p * p, c),
                                          jnp.float32)
            else:
                out14l_ref[0] = jnp.zeros((ps, ps, c), jnp.float32)
                out7l_ref[0] = jnp.zeros((p, p, c), jnp.float32)
                out7r_ref[0] = jnp.zeros((p, p, c), jnp.float32)
        return

    for g in range(group):
        j = i * group + g
        if bench_skip != "dma":
            wait_one(i, slot, g)
        valid_l = (meta_l_ref[j, 3] > 0).astype(jnp.float32)
        valid_r = (meta_r_ref[j, 3] > 0).astype(jnp.float32)

        for lvl in range(num_levels):
            wh, ww = win_shapes[lvl]

            @pl.when(meta_l_ref[j, 0] == lvl)
            def _():
                window = scratch_l[slot, g, pl.ds(0, wh), pl.ds(0, ww), :]
                samples = _sample_grid(
                    window, wh, ww, c, ps,
                    geom_l_ref[j, 0], geom_l_ref[j, 1],
                    geom_l_ref[j, 2], geom_l_ref[j, 3],
                    hat_dtype=hat_dtype) * valid_l
                pooled = samples.reshape(p, 2, p, 2, c).mean(axis=(1, 3))
                if packed_out:
                    packed_ref[g, pl.ds(0, ps * ps)] = samples.reshape(
                        ps * ps, c)
                    packed_ref[g, pl.ds(ps * ps, p * p)] = pooled.reshape(
                        p * p, c)
                else:
                    out14l_ref[0] = samples
                    out7l_ref[0] = pooled

            @pl.when(meta_r_ref[j, 0] == lvl)
            def _():
                # The right side only needs the p x p / sr-2 pool: fold
                # the 2x2 bin-mean into the hat weights (avg=2, exact by
                # linearity) — half the weight rows, no separate mean.
                window = scratch_r[slot, g, pl.ds(0, wh), pl.ds(0, ww), :]
                pooled = _sample_grid(
                    window, wh, ww, c, p,
                    geom_r_ref[j, 0], geom_r_ref[j, 1],
                    geom_r_ref[j, 2], geom_r_ref[j, 3],
                    hat_dtype=hat_dtype, avg=2) * valid_r
                if packed_out:
                    packed_ref[g, pl.ds(ps * ps + p * p, p * p)] = \
                        pooled.reshape(p * p, c)
                else:
                    out7r_ref[0] = pooled


# Tighter per-level window bounds than the generic kernel: a roi assigned
# to level k has sqrt(wh) <= 28 cells, so even 4:1-aspect boxes fit in 64
# columns; P4/P5 are small enough to window (nearly) whole.
_STEREO_WIN = [(48, 64), (48, 64), (24, 64), (12, 40)]

# ---------------------------------------------------------------------------
# Branchless ATLAS forward (negative result, kept as a tested experiment).
#
# Hypothesis: the per-level `pl.when` forward above constructs 4 (levels)
# x 2 (sides) x 2 (start/wait phases) = 16 predicated DMA descriptors per
# grid step, and that scalar bookkeeping dominates the ~8 us step.
# Packing the pyramid levels row-wise into ONE per-image atlas turns the
# level lookup into a static row offset, so each step issues exactly one
# unconditional fixed-shape window DMA per side and the body is branchless.
#
# MEASURED (v5e, tools/bench_roialign.py, batch 16 x 300 rois): the atlas
# kernel is *slightly slower* (+45 ms vs +39 ms per batch-16 pipeline) —
# predication was never the cost, because only the taken level's
# descriptors actually execute; the per-step floor is the serialized
# 48x64x256 window DMA + two MXU contractions, identical in both designs.
# Kept because (a) the parity test pins the hat-weight zero-extension
# argument below, which future window-shrinking work relies on, and
# (b) it is the natural starting point for a multi-roi-per-step variant.
#
# Correctness at level boundaries needs no masking: a window that extends
# past its level's rows/cols (short levels, or P5's 40 < 64 columns) reads
# neighbouring-level or padding cells, but the sampling positions are
# clamped to the level's true extent (dynamic per-roi scalars), and the
# linear-interpolation hat weight max(0, 1 - |iota - x|) is EXACTLY zero
# for every cell >= 1 past a clamped position — garbage cells contribute
# 0.0 * garbage = 0.0 to the f32 accumulation, which changes nothing.
# ---------------------------------------------------------------------------

_ATLAS_WIN = (48, 64)      # static window; covers every per-level window


def _pack_atlas(feats):
    """Row-concatenate pyramid levels (widths zero-padded to the max) plus
    a window-high runway so the last level's window DMA stays in bounds.
    Returns (atlas [sum H_l + WIN_H, W_max, C], row offsets per level)."""
    wmax = max(f.shape[1] for f in feats)
    c = feats[0].shape[-1]
    rows = [jnp.pad(f, ((0, 0), (0, wmax - f.shape[1]), (0, 0)))
            for f in feats]
    rows.append(jnp.zeros((_ATLAS_WIN[0], wmax, c), feats[0].dtype))
    offs = [0]
    for f in feats:
        offs.append(offs[-1] + f.shape[0])
    return jnp.concatenate(rows, 0), offs[:-1]


def _atlas_meta(level_shapes, rois, strides, ps):
    """meta [R, 4] (atlas y0, x0, valid, unused) + geom [R, 6]
    (y1, x1, bin_h, bin_w, clamp_y, clamp_x) for the atlas kernel."""
    win_shapes = [(min(h, bh), min(w, bw))
                  for (h, w), (bh, bw) in zip(level_shapes, _STEREO_WIN)]
    meta, geom = _roi_window_meta(level_shapes, win_shapes, rois,
                                  strides, ps)
    levels = meta[:, 0]
    offs = [0]
    for h, _ in level_shapes:
        offs.append(offs[-1] + h)
    y0_atlas = meta[:, 1] + jnp.asarray(offs[:-1], jnp.int32)[levels]
    # Sample-position clamp bounds: the level's true extent inside the
    # window (identical to the per-level kernel's static wh-1 / ww-1).
    clamp_y = jnp.asarray([h - 1 for h, _ in win_shapes],
                          jnp.float32)[levels]
    clamp_x = jnp.asarray([w - 1 for _, w in win_shapes],
                          jnp.float32)[levels]
    meta_a = jnp.stack([y0_atlas, meta[:, 2], meta[:, 3],
                        jnp.zeros_like(levels)], -1).astype(jnp.int32)
    geom_a = jnp.concatenate([geom, clamp_y[:, None], clamp_x[:, None]], -1)
    return meta_a, geom_a


def _sample_grid_clamped(window, wh, ww, c, ps, y1, x1, bin_h, bin_w,
                         hi_y, hi_x):
    """:func:`_sample_grid` with DYNAMIC clamp bounds (the level's true
    extent inside the fixed-size atlas window)."""
    grid = (jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0)[:, 0]
            .astype(jnp.float32) + 0.5)
    ys = jnp.clip(y1 + grid * bin_h, 0.0, hi_y)
    xs = jnp.clip(x1 + grid * bin_w, 0.0, hi_x)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (ps, wh),
                                      1).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (ps, ww),
                                      1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iota_h - ys[:, None]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_w - xs[:, None]))
    tmp = jnp.dot(wy, window.reshape(wh, ww * c),
                  preferred_element_type=jnp.float32).reshape(ps, ww, c)
    out = jax.lax.dot_general(
        wx, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.swapaxes(out, 0, 1)                   # [ps(y), ps(x), C]


def _stereo_kernel_atlas(meta_l_ref, geom_l_ref, meta_r_ref, geom_r_ref,
                         atlas_l_ref, atlas_r_ref, out14l_ref, out7l_ref,
                         out7r_ref, scratch_l, scratch_r, sem_l, sem_r,
                         *, p: int, pk: int, c: int, n_rois: int):
    """One roi per grid step; ONE fixed-shape window DMA per side, no
    per-level branches; double-buffered (ping-pong slots) like the
    per-level kernel."""
    wh, ww = _ATLAS_WIN
    i = pl.program_id(0)
    ps = pk

    def start(meta_ref, atlas_ref, scratch, sem, j, slot):
        y0 = meta_ref[j, 0]
        x0 = pl.multiple_of(meta_ref[j, 1], 8)
        pltpu.make_async_copy(
            atlas_ref.at[pl.ds(y0, wh), pl.ds(x0, ww), :],
            scratch.at[slot], sem.at[slot]).start()

    def wait(meta_ref, atlas_ref, scratch, sem, j, slot):
        y0 = meta_ref[j, 0]
        x0 = pl.multiple_of(meta_ref[j, 1], 8)
        pltpu.make_async_copy(
            atlas_ref.at[pl.ds(y0, wh), pl.ds(x0, ww), :],
            scratch.at[slot], sem.at[slot]).wait()

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        start(meta_l_ref, atlas_l_ref, scratch_l, sem_l, 0, 0)
        start(meta_r_ref, atlas_r_ref, scratch_r, sem_r, 0, 0)

    @pl.when(i + 1 < n_rois)
    def _():
        start(meta_l_ref, atlas_l_ref, scratch_l, sem_l, i + 1, nxt)
        start(meta_r_ref, atlas_r_ref, scratch_r, sem_r, i + 1, nxt)

    wait(meta_l_ref, atlas_l_ref, scratch_l, sem_l, i, slot)
    wait(meta_r_ref, atlas_r_ref, scratch_r, sem_r, i, slot)

    valid_l = (meta_l_ref[i, 2] > 0).astype(jnp.float32)
    valid_r = (meta_r_ref[i, 2] > 0).astype(jnp.float32)

    samples = _sample_grid_clamped(
        scratch_l[slot], wh, ww, c, ps,
        geom_l_ref[i, 0], geom_l_ref[i, 1], geom_l_ref[i, 2],
        geom_l_ref[i, 3], geom_l_ref[i, 4], geom_l_ref[i, 5]) * valid_l
    out14l_ref[0] = samples
    out7l_ref[0] = samples.reshape(p, 2, p, 2, c).mean(axis=(1, 3))

    samples_r = _sample_grid_clamped(
        scratch_r[slot], wh, ww, c, ps,
        geom_r_ref[i, 0], geom_r_ref[i, 1], geom_r_ref[i, 2],
        geom_r_ref[i, 3], geom_r_ref[i, 4], geom_r_ref[i, 5]) * valid_r
    out7r_ref[0] = samples_r.reshape(p, 2, p, 2, c).mean(axis=(1, 3))


def stereo_roi_align_pallas_atlas(feats_l, feats_r, rois_l, rois_r,
                                  strides, pooling_size: int = 7,
                                  kpt_size: int = 14,
                                  interpret: bool = False):
    """Atlas-packed branchless fused stereo RoIAlign for one image.

    Same signature and semantics as :func:`stereo_roi_align_pallas`
    (parity-tested).  Measured NO faster than the per-level kernel on the
    v5e (see the block comment above) — not used by the production path;
    kept as the pinned-correct starting point for multi-roi-per-step work.
    """
    assert kpt_size == pooling_size * 2
    r = rois_l.shape[0]
    c = feats_l[0].shape[-1]
    level_shapes = [(f.shape[0], f.shape[1]) for f in feats_l]

    atlas_l, _ = _pack_atlas(list(feats_l))
    atlas_r, _ = _pack_atlas(list(feats_r))
    meta_l, geom_l = _atlas_meta(level_shapes, rois_l, strides, kpt_size)
    meta_r, geom_r = _atlas_meta(level_shapes, rois_r, strides, kpt_size)

    wh, ww = _ATLAS_WIN
    p = pooling_size
    kernel = functools.partial(_stereo_kernel_atlas, p=p, pk=kpt_size,
                               c=c, n_rois=r)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec((1, kpt_size, kpt_size, c),
                         lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((2, wh, ww, c), feats_l[0].dtype)] * 2 +
            [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]),
    )
    out14l, out7l, out7r = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((r, kpt_size, kpt_size, c), jnp.float32),
            jax.ShapeDtypeStruct((r, p, p, c), jnp.float32),
            jax.ShapeDtypeStruct((r, p, p, c), jnp.float32),
        ),
        interpret=interpret,
    )(meta_l, geom_l, meta_r, geom_r, atlas_l, atlas_r)
    return out7l, out7r, out14l


def _auto_interpret(interpret):
    """interpret=None -> interpret mode everywhere except real TPU, so the
    same code path runs in CPU tests without explicit flags."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def stereo_roi_align_pallas(feats_l, feats_r, rois_l, rois_r, strides,
                            pooling_size: int = 7, kpt_size: int = 14,
                            interpret: bool = False,
                            hat_dtype=jnp.float32,
                            bench_skip: str | None = None,
                            packed_out: bool = False,
                            group: int = 1):
    """Fused stereo RoIAlign for one image.

    feats_*: 4-level pyramids [H_l, W_l, C]; rois_*: [R, 4].
    Returns (pooled_l [R, 7, 7, C], pooled_r [R, 7, 7, C],
             pooled_kpt_l [R, 14, 14, C]) — identical semantics to three
    calls of :func:`multilevel_roi_align` with (7, sr=2), (7, sr=2),
    (14, sr=1).
    """
    assert kpt_size == pooling_size * 2
    assert group == 1 or packed_out, "group > 1 requires packed_out"
    r = rois_l.shape[0]
    c = feats_l[0].shape[-1]
    num_levels = len(feats_l)
    level_shapes = [(f.shape[0], f.shape[1]) for f in feats_l]
    win_shapes = [(min(h, bh), min(w, bw))
                  for (h, w), (bh, bw) in zip(level_shapes, _STEREO_WIN)]

    meta_l, geom_l = _roi_window_meta(level_shapes, win_shapes, rois_l,
                                      strides, kpt_size)
    meta_r, geom_r = _roi_window_meta(level_shapes, win_shapes, rois_r,
                                      strides, kpt_size)
    rp = ((r + group - 1) // group) * group          # pad to group multiple
    if rp != r:
        pad = ((0, rp - r), (0, 0))
        meta_l = jnp.pad(meta_l, pad)                # level 0, origin 0,
        meta_r = jnp.pad(meta_r, pad)                # valid 0 -> zero out
        geom_l = jnp.pad(geom_l, pad)
        geom_r = jnp.pad(geom_r, pad)

    kernel = functools.partial(
        _stereo_kernel, num_levels=num_levels, p=pooling_size, pk=kpt_size,
        win_shapes=win_shapes, c=c, n_rois=rp, hat_dtype=hat_dtype,
        bench_skip=bench_skip, packed_out=packed_out, group=group)

    p = pooling_size
    if packed_out:
        rows = kpt_size * kpt_size + 2 * p * p
        out_specs = pl.BlockSpec((group, rows, c), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((rp, rows, c), jnp.float32)
    else:
        out_specs = (
            pl.BlockSpec((1, kpt_size, kpt_size, c),
                         lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, p, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((rp, kpt_size, kpt_size, c), jnp.float32),
            jax.ShapeDtypeStruct((rp, p, p, c), jnp.float32),
            jax.ShapeDtypeStruct((rp, p, p, c), jnp.float32),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(rp // group,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)
                  for _ in range(2 * num_levels)],
        out_specs=out_specs,
        scratch_shapes=(
            [pltpu.VMEM((2, group, max(h for h, _ in win_shapes),
                         max(w for _, w in win_shapes), c),
                        feats_l[0].dtype)] * 2 +
            [pltpu.SemaphoreType.DMA((2, group)),
             pltpu.SemaphoreType.DMA((2, group))]),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(meta_l, geom_l, meta_r, geom_r, *feats_l, *feats_r)
    if packed_out == "raw":
        return out[:r] if rp != r else out           # [R, rows, C]
    if packed_out:
        pp, kk = p * p, kpt_size * kpt_size
        out14l = out[:r, :kk].reshape(r, kpt_size, kpt_size, c)
        out7l = out[:r, kk:kk + pp].reshape(r, p, p, c)
        out7r = out[:r, kk + pp:].reshape(r, p, p, c)
    else:
        out14l, out7l, out7r = (o[:r] for o in out)
    return out7l, out7r, out14l


# ---------------------------------------------------------------------------
# Backward pass: transpose of the hat-matrix sampling, as a Pallas kernel.
#
# Behavioral reference: the backward half of
# ``lib/model/csrc/cuda/ROIAlign_cuda.cu`` (scatter-add of bilinear weights
# into the feature gradient).  TPU design: the forward samples are
#     samples = swap( wx @ (wy @ W) )            (two MXU matmuls)
# so the cotangent of the window W is exactly
#     dW = wy^T @ swap(g)-contracted-with-wx     (two MXU matmuls again)
# — no scatters.  Each grid step accumulates one roi's window gradient into
# the per-level HBM gradient arrays via read-modify-write DMA; TPU Pallas
# grid steps execute SEQUENTIALLY on the core, so the RMW is race-free (the
# CUDA kernel needs atomics here; we need nothing).
# ---------------------------------------------------------------------------

def _grad_window(g_samples, wh, ww, c, ps, y1, x1, bin_h, bin_w):
    """Transpose of :func:`_sample_grid`: cotangent [ps, ps, C] (y-major)
    -> window gradient [wh, ww*C]."""
    grid = (jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0)[:, 0]
            .astype(jnp.float32) + 0.5)
    ys = jnp.clip(y1 + grid * bin_h, 0.0, wh - 1.0)
    xs = jnp.clip(x1 + grid * bin_w, 0.0, ww - 1.0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (ps, wh),
                                      1).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (ps, ww),
                                      1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iota_h - ys[:, None]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(iota_w - xs[:, None]))
    g_pre = jnp.swapaxes(g_samples, 0, 1)            # [ps(x), ps(y), C]
    # d_tmp[w, y, C] = sum_x wx[x, w] * g_pre[x, y, C]
    d_tmp = jax.lax.dot_general(
        wx, g_pre, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [ww, ps(y), C]
    d_tmp = jnp.swapaxes(d_tmp, 0, 1)                # [ps(y), ww, C]
    # dW[wh, ww*C] = wy^T @ d_tmp
    return jax.lax.dot_general(
        wy, d_tmp.reshape(ps, ww * c),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [wh, ww*C]


def _stereo_bwd_kernel(meta_l_ref, geom_l_ref, meta_r_ref, geom_r_ref,
                       gpk_ref, *refs,
                       num_levels: int, p: int, pk: int, win_shapes,
                       c: int):
    """One (batch, roi) pair per grid step; meta carries (level, y0, x0,
    valid, batch).  The cotangent arrives as ONE packed block
    [1, pk*pk + 2*p*p, C] per roi (same row layout as the forward's
    packed output — the forward fix showed per-step block copies are the
    grid's dominant cost, and the same applies to INPUT blocks here).
    refs layout: gl_in[L] + gr_in[L] (aliased with outputs) + gl_out[L]
    + gr_out[L] + scratch (acc_l, acc_r, sem)."""
    n_in = 2 * num_levels
    out_refs = refs[n_in:n_in + 2 * num_levels]
    gl_out = out_refs[:num_levels]
    gr_out = out_refs[num_levels:]
    acc_l, acc_r, sem = refs[-3], refs[-2], refs[-1]

    i = pl.program_id(0)
    ps = pk
    kk, pp = pk * pk, p * p

    d14 = gpk_ref[0, :kk].reshape(pk, pk, c)
    d7l = gpk_ref[0, kk:kk + pp].reshape(p, p, c)
    d7r = gpk_ref[0, kk + pp:].reshape(p, p, c)
    d7l_up = jnp.repeat(jnp.repeat(d7l, 2, 0), 2, 1) * 0.25
    d7r_up = jnp.repeat(jnp.repeat(d7r, 2, 0), 2, 1) * 0.25
    g_left = (d14 + d7l_up) * \
        (meta_l_ref[i, 3] > 0).astype(jnp.float32)
    g_right = d7r_up * (meta_r_ref[i, 3] > 0).astype(jnp.float32)

    for side, (meta_ref, geom_ref, g, outs, acc) in enumerate((
            (meta_l_ref, geom_l_ref, g_left, gl_out, acc_l),
            (meta_r_ref, geom_r_ref, g_right, gr_out, acc_r))):
        b = meta_ref[i, 4]
        y0 = meta_ref[i, 1]
        x0 = pl.multiple_of(meta_ref[i, 2], 8)
        for lvl in range(num_levels):
            wh, ww = win_shapes[lvl]

            @pl.when(meta_ref[i, 0] == lvl)
            def _():
                dw = _grad_window(
                    g, wh, ww, c, ps,
                    geom_ref[i, 0], geom_ref[i, 1],
                    geom_ref[i, 2], geom_ref[i, 3])          # [wh, ww*C]
                region = outs[lvl].at[b, pl.ds(y0, wh), pl.ds(x0, ww), :]
                load = pltpu.make_async_copy(
                    region, acc.at[pl.ds(0, wh), pl.ds(0, ww), :], sem)
                load.start()
                load.wait()
                acc[pl.ds(0, wh), pl.ds(0, ww), :] = \
                    acc[pl.ds(0, wh), pl.ds(0, ww), :] + \
                    dw.reshape(wh, ww, c)
                store = pltpu.make_async_copy(
                    acc.at[pl.ds(0, wh), pl.ds(0, ww), :], region, sem)
                store.start()
                store.wait()


def _stereo_roi_align_bwd_impl(feats_l, feats_r, rois_l, rois_r, strides,
                               pooling_size, kpt_size, interpret,
                               g_packed):
    """Batched backward: returns (d_feats_l, d_feats_r) as float32 arrays
    shaped like the (batched) input pyramids.  ``g_packed`` is the
    cotangent in packed-row layout [B, R, pk*pk + 2*p*p, C].

    One pallas_call per IMAGE (grid = R), sequenced with ``lax.map``:
    Mosaic's per-grid-step scalar bookkeeping costs ~2 KB of SMEM per
    step, so a whole-batch grid of B*R steps blows the 1 MB SMEM budget
    at production shapes (observed: batch 8 x 128 rois -> "Used 2.00M of
    1.00M smem"); per-image grids stay comfortably under it and compile
    the kernel once."""
    bsz, r = rois_l.shape[:2]
    c = feats_l[0].shape[-1]
    num_levels = len(feats_l)
    level_shapes = [(f.shape[1], f.shape[2]) for f in feats_l]
    win_shapes = [(min(h, bh), min(w, bw))
                  for (h, w), (bh, bw) in zip(level_shapes, _STEREO_WIN)]

    p = pooling_size
    kernel = functools.partial(
        _stereo_bwd_kernel, num_levels=num_levels, p=p, pk=kpt_size,
        win_shapes=win_shapes, c=c)

    wh_max = max(h for h, _ in win_shapes)
    ww_max = max(w for _, w in win_shapes)
    rows = kpt_size * kpt_size + 2 * p * p
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(r,),
        in_specs=(
            [pl.BlockSpec((1, rows, c), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)] +
            [pl.BlockSpec(memory_space=pltpu.HBM)
             for _ in range(2 * num_levels)]),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.HBM)
                        for _ in range(2 * num_levels)),
        scratch_shapes=[pltpu.VMEM((wh_max, ww_max, c), jnp.float32),
                        pltpu.VMEM((wh_max, ww_max, c), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )

    def one_image(args):
        rl, rr, gpk_i = args
        b0 = jnp.zeros((r, 1), jnp.int32)

        def meta_of(rois):
            meta, geom = _roi_window_meta(level_shapes, win_shapes, rois,
                                          strides, kpt_size)
            return jnp.concatenate([meta, b0], -1), geom

        meta_l, geom_l = meta_of(rl)
        meta_r, geom_r = meta_of(rr)
        zeros = [jnp.zeros((1, h, w, c), jnp.float32)
                 for h, w in level_shapes] * 2
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((1, h, w, c), jnp.float32)
                for h, w in level_shapes * 2),
            # Zero-initialised gradient accumulators alias the outputs so
            # each grid step read-modify-writes them in place.  Operand
            # indices INCLUDE the 4 scalar-prefetch args: meta/geom are
            # 0..3, the packed cotangent is 4, accumulators start at 5.
            input_output_aliases={5 + k: k for k in range(2 * num_levels)},
            interpret=interpret,
        )(meta_l, geom_l, meta_r, geom_r, gpk_i, *zeros)
        return tuple(o[0] for o in outs)

    outs = jax.lax.map(one_image, (rois_l, rois_r, g_packed))
    d_feats_l = list(outs[:num_levels])
    d_feats_r = list(outs[num_levels:])
    return d_feats_l, d_feats_r


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def stereo_roi_align_batched(feats_l, feats_r, rois_l, rois_r, strides,
                             pooling_size: int = 7, kpt_size: int = 14,
                             interpret: bool | None = None):
    """Differentiable BATCHED fused stereo RoIAlign.

    feats_*: tuples of [B, H_l, W_l, C] pyramid levels; rois_*: [B, R, 4].
    Returns (pooled_l [B,R,7,7,C], pooled_r, pooled_kpt_l [B,R,14,14,C]).
    Forward = the fused double-buffered kernel; backward = hat-matrix
    transpose kernel (gradients flow to the FEATURES; rois get none — the
    detector feeds proposals through stop_gradient, matching the reference
    where RoI coordinates are not differentiated either).
    """
    interpret = _auto_interpret(interpret)
    # packed_out merges the three per-roi output blocks into one: measured
    # 18.7 -> 9.3 us/roi on the v5e (the per-step output-copy machinery,
    # not DMA or compute, dominated the grid step — see the step-floor
    # ablation rows in tools/bench_roialign.py).  Math is unchanged (f32
    # hat matmuls); outputs are bit-identical to the unpacked kernel.
    fn = functools.partial(stereo_roi_align_pallas, strides=strides,
                           pooling_size=pooling_size, kpt_size=kpt_size,
                           interpret=interpret, packed_out=True)
    return jax.vmap(lambda fl, fr, rl, rr: fn(list(fl), list(fr), rl, rr))(
        tuple(feats_l), tuple(feats_r), rois_l, rois_r)


def _batched_fwd(feats_l, feats_r, rois_l, rois_r, strides, pooling_size,
                 kpt_size, interpret):
    out = stereo_roi_align_batched(feats_l, feats_r, rois_l, rois_r,
                                   strides, pooling_size, kpt_size,
                                   interpret)
    return out, (tuple(feats_l), tuple(feats_r), rois_l, rois_r)


def _batched_bwd(strides, pooling_size, kpt_size, interpret, res, g):
    feats_l, feats_r, rois_l, rois_r = res
    d7l, d7r, d14l = g
    b, r = rois_l.shape[:2]
    c = d14l.shape[-1]
    p, pk = pooling_size, kpt_size
    g_packed = jnp.concatenate([                     # packed-row cotangent
        d14l.reshape(b, r, pk * pk, c),
        d7l.reshape(b, r, p * p, c),
        d7r.reshape(b, r, p * p, c)], axis=2)
    dl, dr = _stereo_roi_align_bwd_impl(
        feats_l, feats_r, rois_l, rois_r, strides, pooling_size, kpt_size,
        _auto_interpret(interpret), g_packed)
    dl = tuple(d.astype(f.dtype) for d, f in zip(dl, feats_l))
    dr = tuple(d.astype(f.dtype) for d, f in zip(dr, feats_r))
    return (dl, dr, jnp.zeros_like(rois_l), jnp.zeros_like(rois_r))


stereo_roi_align_batched.defvjp(_batched_fwd, _batched_bwd)


_HAT_MODES = {"f32": jnp.float32, "kron_bf16": "kron_bf16",
              "kron_hilo": "kron_hilo"}


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def stereo_roi_align_batched_packed(feats_l, feats_r, rois_l, rois_r,
                                    strides, pooling_size: int = 7,
                                    kpt_size: int = 14,
                                    interpret: bool | None = None,
                                    hat: str = "f32"):
    """Like :func:`stereo_roi_align_batched` but returns the RAW packed
    per-roi block [B, R, pk*pk + 2*p*p, C] (row layout: kpt samples, then
    7x7 left, then 7x7 right).

    Returning the packed array lets INFERENCE consumers slice lazily:
    the head input concat reads the two 7x7 sections fused, and the
    keypoint branch gathers its D<<R NMS survivors BEFORE slicing the
    kpt section.  Splitting eagerly (the 3-tuple API) re-materializes
    ~1.8 GB/batch-16 of full-size slices that XLA cannot fuse away —
    measured to cost MORE than the packed kernel saves (bench.py 114.5
    -> 108.1 pairs/s with eager splits vs the unpacked kernel).

    ``hat``: sampling-weight mode, one of _HAT_MODES ("f32" exact —
    default; "kron_bf16"/"kron_hilo" are faster single-matmul modes with
    ~2^-9 / ~2^-17 relative weight error — INFERENCE-ONLY: the custom
    backward is the exact f32 hat transpose regardless, so non-f32
    forward + training would use slightly mismatched gradients).
    """
    interpret = _auto_interpret(interpret)
    fn = functools.partial(stereo_roi_align_pallas, strides=strides,
                           pooling_size=pooling_size, kpt_size=kpt_size,
                           interpret=interpret, packed_out="raw",
                           hat_dtype=_HAT_MODES[hat])
    return jax.vmap(lambda fl, fr, rl, rr: fn(list(fl), list(fr), rl, rr))(
        tuple(feats_l), tuple(feats_r), rois_l, rois_r)


def _batched_packed_fwd(feats_l, feats_r, rois_l, rois_r, strides,
                        pooling_size, kpt_size, interpret, hat):
    out = stereo_roi_align_batched_packed(feats_l, feats_r, rois_l, rois_r,
                                          strides, pooling_size, kpt_size,
                                          interpret, hat)
    return out, (tuple(feats_l), tuple(feats_r), rois_l, rois_r)


def _batched_packed_bwd(strides, pooling_size, kpt_size, interpret, hat,
                        res, g):
    # g is ALREADY in packed-row layout [B, R, pk*pk + 2*p*p, C] — it
    # flows straight into the bwd kernel's per-roi input block, with no
    # full-size slice materializations on either side.
    feats_l, feats_r, rois_l, rois_r = res
    dl, dr = _stereo_roi_align_bwd_impl(
        feats_l, feats_r, rois_l, rois_r, strides, pooling_size, kpt_size,
        _auto_interpret(interpret), g)
    dl = tuple(d.astype(f.dtype) for d, f in zip(dl, feats_l))
    dr = tuple(d.astype(f.dtype) for d, f in zip(dr, feats_r))
    return (dl, dr, jnp.zeros_like(rois_l), jnp.zeros_like(rois_r))


stereo_roi_align_batched_packed.defvjp(_batched_packed_fwd,
                                       _batched_packed_bwd)
