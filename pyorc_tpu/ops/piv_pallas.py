"""Fused Pallas TPU kernel for PIV: band-resident window correlation.

The XLA-composed pipeline (ops.piv) materializes the interrogation-window
stack ([pairs, windows, wy, wx] — with 50% overlap ~4x the frame bytes) and
the correlation planes in HBM. This kernel removes both round-trips:

  grid = (n_pairs,); per program a fori_loop walks the row bands with
  double-buffered DMA: two [wy, W] image bands (frame t and t+1) stream into
  VMEM while the previous band computes. Windows of each band are built by
  shifted reshapes, demeaned, transformed with a matmul-DFT (MXU), spectrally
  conjugate-multiplied, inverse-transformed, and each correlation plane is
  reduced to (u, v, corr_max, s2n) with a one-hot peak + 3-point Gaussian
  subpixel fit — all in VMEM. Only [n_rows, n_cols]-sized results are written.

HBM traffic drops from ~8x frame bytes to ~2x frame bytes + O(n_windows)
outputs; the DFT matmuls run on the MXU at fp32.

Window grid assumption (checked by the wrapper): uniform starts whose step
divides the window size — the standard PIV configuration.
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import windows as win
from .piv import _dft_mats

__all__ = ["piv_pairs_fused", "piv_ensemble_fused", "KERNEL_ROUTE"]

# Last route each entrypoint actually took, e.g. {"piv_pairs_fused":
# "tileband", "piv_ensemble_fused": "xla_scan"}. Tests assert on this so a
# silent downgrade (fused kernel dies, fallback ladder swallows it) FAILS
# instead of passing vacuously — the round-4 tileband-ensemble regression
# shipped precisely because nothing observed which kernel ran.
KERNEL_ROUTE: dict = {}


def _route(entry: str, route: str) -> None:
    KERNEL_ROUTE[entry] = route


def _interpret_needs_cpu_pin() -> bool:
    """Interpret-mode kernels must execute on the CPU backend.

    Pallas interpret mode emulates the kernel with plain jax ops; executed on
    the tunneled axon TPU backend that emulation silently computes garbage
    (measured: constant displacement fields). Interpret is a CPU debugging
    path — pin it there. Returns False once already inside the CPU pin (the
    fused entrypoints recurse once under ``jax.default_device``)."""
    if jax.default_backend() == "cpu":
        return False
    dev = jax.config.jax_default_device
    return dev is None or getattr(dev, "platform", None) != "cpu"


def _strict_kernels() -> bool:
    """PYORC_TPU_STRICT_KERNELS=1 turns every exception-driven kernel
    fallback into a hard failure (geometry-based routing to the XLA path is
    intended behavior and stays allowed). Enabled in conftest."""
    return os.environ.get("PYORC_TPU_STRICT_KERNELS", "0").lower() not in ("", "0", "false")


def _recoverable(e: Exception) -> bool:
    """Whether an exception may legitimately trigger a kernel fallback.

    Compiler/runtime failures (Mosaic lowering rejections, scoped-VMEM
    overflow, XLA runtime errors) are resource/backend conditions the
    fallback ladders exist for. Python programming errors — a TypeError from
    a miswired operand list, a ValueError from a bad shape at trace time —
    are bugs and must propagate ALWAYS, strict mode or not."""
    if isinstance(e, (TypeError, AttributeError, NameError, KeyError, IndexError, AssertionError)):
        return False
    if isinstance(e, ValueError):
        msg = str(e).lower()
        return "vmem" in msg or "mosaic" in msg or "pallas" in msg
    return True


def _fallback(entry: str, route: str, err: Exception, what: str) -> None:
    """Record an exception-driven downgrade; warn, or raise in strict mode."""
    if _strict_kernels():
        raise RuntimeError(
            f"{entry}: {what} failed and PYORC_TPU_STRICT_KERNELS is set "
            f"(would have fallen back to {route})."
        ) from err
    _route(entry, route)
    warnings.warn(
        f"{what} failed ({err}); falling back to {route}.",
        stacklevel=3,
    )


def _band_windows(band, c0, cnt, wx, step_x, n_cols):
    """[wy, W] band -> [cnt, wy, wx] windows for columns [c0, c0+cnt).

    Static lane-dimension slices + stack: Mosaic cannot split the lane
    dimension via reshape, but static lane slices lower cleanly (verified on
    v5e for arbitrary — including odd — offsets and widths). Columns beyond
    ``n_cols`` clamp to the last window: callers pad chunk counts up to the
    MXU packing group and discard the duplicate results on store.
    """
    wins = []
    for c in range(cnt):
        j = min(c0 + c, n_cols - 1)
        wins.append(jax.lax.slice_in_dim(band, j * step_x, j * step_x + wx, axis=1)[None])
    return jnp.concatenate(wins, axis=0)


def _r2(op, x):
    """Two-step reduction over the last two axes with keepdims (Mosaic cannot
    lower multi-axis keepdims reductions in one op)."""
    return op(op(x, axis=-1, keepdims=True), axis=-2, keepdims=True)


def _demean_one(band, wy, wx, step_x, c0, cnt, n_cols):
    """Build + demean one frame's window chunk; returns (a, sa, valid_a)."""
    wa = _band_windows(band, c0, cnt, wx, step_x, n_cols).astype(jnp.float32)
    a = wa - _r2(jnp.mean, wa)
    sa = jnp.sqrt(_r2(jnp.mean, a * a))  # [cnt,1,1]
    return a, sa, sa > 1e-6


def _demean(band_a, band_b, wy, wx, step_x, c0, cnt, n_cols):
    """Build + demean window chunks; returns (a, b, sa, sb, valid)."""
    a, sa, va = _demean_one(band_a, wy, wx, step_x, c0, cnt, n_cols)
    b, sb, vb = _demean_one(band_b, wy, wx, step_x, c0, cnt, n_cols)
    return a, b, sa, sb, va & vb


def _mmT(x):
    return jnp.swapaxes(x, -1, -2)


def _mm(v, m):
    # batched right-multiply (flattening the batch into rows measured
    # neutral-to-worse: the reshape relayout cancels the pipeline gain)
    return jnp.matmul(v, m, preferred_element_type=jnp.float32)


def _dft2t_fwd(v, cxt, sxt, cyT, syT):
    """Forward transposed 2-D DFT: v -> (at_re, at_im) with At = (Fy v FxT)^T.

    Split from the inverse so the multi-pair kernel can compute each frame's
    spectra ONCE and reuse them for both pairs that touch the frame."""
    p_ = _mm(v, cxt)
    q_ = _mm(v, sxt)
    pt = _mmT(p_)
    qt = _mmT(q_)
    at_re = _mm(pt, cyT) - _mm(qt, syT)
    at_im = _mm(pt, syT) + _mm(qt, cyT)
    return at_re, at_im


def _corr_from_spectra(at_re, at_im, bt_re, bt_im, icxt, isxt, icyT, isyT):
    """conj(A)*B spectral product + inverse transposed 2-D DFT -> raw corr."""
    st_re = at_re * bt_re + at_im * bt_im
    st_im = at_re * bt_im - at_im * bt_re
    # inverse: corr = (1/N) Re(conj(Fy) S conj(Fx)^T) with S = T(St)
    st_re_t = _mmT(st_re)
    st_im_t = _mmT(st_im)
    v_re = _mm(st_re_t, icxt) + _mm(st_im_t, isxt)
    v_im = _mm(st_im_t, icxt) - _mm(st_re_t, isxt)
    return _mmT(_mm(_mmT(v_re), icyT) + _mm(_mmT(v_im), isyT))


def _corr_raw_transposed(a, b, cxt, sxt, cyT, syT, icxt, isxt, icyT, isyT):
    """Raw circular cross-correlation planes via transposed-spectra matmul-DFT.

    2-D matmul-DFT with right-multiplications only: Mosaic lowers batched
    right matmuls and batched minor-dim transposes, but a broadcast LEFT
    matmul would need an unsupported lane-merging reshape. We therefore keep
    spectra TRANSPOSED: At = (Fy v FxT)^T = (P + iQ)^T (CyT + iSyT). The
    inverse-stage matrices (icxt...) may be row-rolled variants that bake the
    fftshift into the transform (used by the packed path, where a plain
    pltpu.roll would mix packed windows).
    """
    at_re, at_im = _dft2t_fwd(a, cxt, sxt, cyT, syT)
    bt_re, bt_im = _dft2t_fwd(b, cxt, sxt, cyT, syT)
    return _corr_from_spectra(at_re, at_im, bt_re, bt_im, icxt, isxt, icyT, isyT)


def _pack_windows(w, p, wy, wx):
    """[cnt, wy, wx] -> [cnt/p^2, p*wy, p*wx]: p x p windows per MXU tile.

    Windows are grouped in CONTIGUOUS batch blocks (quadrant (r, c) of tile k
    holds window (r*p + c) * cnt/g + k): strided batch slices would lower to
    unsupported >2-D gathers.
    """
    g = p * p
    cnt4 = w.shape[0] // g
    chunk = lambda j: w[j * cnt4 : (j + 1) * cnt4]
    rows = [
        jnp.concatenate([chunk(r * p + c) for c in range(p)], axis=-1) for r in range(p)
    ]
    return jnp.concatenate(rows, axis=-2)


def _unpack_windows(c4, p, wy, wx, cnt):
    """Inverse of :func:`_pack_windows` (static slices + batch concat)."""
    quads = [
        c4[:, r * wy : (r + 1) * wy, c * wx : (c + 1) * wx]
        for r in range(p)
        for c in range(p)
    ]
    return jnp.concatenate(quads, axis=0)


def _finish_corr(corr, sa, sb, valid, wy, wx):
    """Normalize fftshifted planes and reduce to (u, v, cmax, s2n) [cnt, 1]."""
    n_pix = wy * wx
    # one fused normalization pass: /n_pix and /denom merged into a single
    # per-window scalar divide (two full-plane passes -> one)
    denom = n_pix * jnp.maximum(n_pix * sa * sb, 1e-10)
    corr = corr / denom
    corr = jnp.maximum(corr, 0.0)
    corr = jnp.where(valid, corr, 0.0)

    cmax = _r2(jnp.max, corr)  # [n_cols,1,1]
    cmean = _r2(jnp.mean, corr)
    s2n = cmax / jnp.maximum(cmean, 1e-10)

    # One-hot peak localization + 3-point Gaussian subpixel, matching
    # ops.piv.subpixel_peak exactly: first (row-major) argmax, stencil clamped
    # one pixel inside, centre re-read at the clamped position.
    is_peak = (corr >= cmax).astype(jnp.float32)
    # tpu.iota only produces integers; cast afterwards
    row_ids = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 1).astype(jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 2).astype(jnp.float32)
    lin_ids = row_ids * wx + col_ids
    big = jnp.float32(wy * wx * 2)
    first_lin = _r2(jnp.min, jnp.where(is_peak > 0, lin_ids, big))
    iy = jnp.floor(first_lin / wx)
    ix = first_lin - iy * wx
    iyc = jnp.clip(iy, 1.0, wy - 2.0)
    ixc = jnp.clip(ix, 1.0, wx - 2.0)

    # 3x3 stencil via three row-stripe reductions instead of four full-plane
    # rolls + five masked full-plane sums: each stripe sums exactly one
    # (zero-masked) row of the plane, so every stencil value is the same
    # single corr element bit-for-bit; the remaining masked sums run on
    # [cnt, 1, wx] stripes. Fewer VPU passes AND four fewer live planes.
    rsum = lambda m: jnp.sum(jnp.where(m, corr, 0.0), axis=1, keepdims=True)
    stripe_c = rsum(row_ids == iyc)  # [cnt, 1, wx], row iyc of each plane
    stripe_u = rsum(row_ids == iyc - 1.0)
    stripe_d = rsum(row_ids == iyc + 1.0)
    col_s = jax.lax.broadcasted_iota(jnp.int32, stripe_c.shape, 2).astype(jnp.float32)
    ssum = lambda st, m: jnp.sum(jnp.where(m, st, 0.0), axis=-1, keepdims=True)

    eps = 1e-10
    colm = col_s == ixc
    c0 = jnp.maximum(ssum(stripe_c, colm), eps)
    cl = jnp.maximum(ssum(stripe_c, col_s == ixc - 1.0), eps)
    cr = jnp.maximum(ssum(stripe_c, col_s == ixc + 1.0), eps)
    cu = jnp.maximum(ssum(stripe_u, colm), eps)
    cd = jnp.maximum(ssum(stripe_d, colm), eps)
    log0 = jnp.log(c0)

    def safe_div(num, den):
        den = jnp.where(jnp.abs(den) < eps, -eps, den)
        return num / den

    dx = safe_div(jnp.log(cl) - jnp.log(cr), 2 * jnp.log(cl) - 4 * log0 + 2 * jnp.log(cr))
    dy = safe_div(jnp.log(cu) - jnp.log(cd), 2 * jnp.log(cu) - 4 * log0 + 2 * jnp.log(cd))
    dx = jnp.clip(dx, -1.0, 1.0)
    dy = jnp.clip(dy, -1.0, 1.0)
    u = (ixc + dx) - wx // 2
    v = -((iyc + dy) - wy // 2)
    # u/v stay FINITE here (invalid windows are NaN'd by the caller after the
    # lane-transpose: a NaN entering the transpose matmul would poison the
    # whole row through 0 * NaN contributions)
    # [n_cols, 1, 1] -> [n_cols, 1] (rank stays >= 2)
    sq = lambda x: jax.lax.squeeze(x, (2,))
    return sq(u), sq(v), sq(cmax), sq(s2n), sq(valid.astype(jnp.float32))


def _chunk_plan(n_cols: int, wy: int, wx: int, pack: int, ppg: int = 1):
    """(col_chunk, temp_bytes): windows per call and the VMEM they cost.

    The live set per in-flight window is modeled as 8 lane-padded [wy, wx]
    temporaries (inputs, spectra, product, correlation plane — calibrated
    against the compiler's scoped-vmem accounting at 64 px and the 26/32 px
    overflows; the true live set measured 6-10 depending on size). Budget
    9MB of temporaries (outputs are lane-flat since the [.., n_cols] layout,
    so temporaries own most of the 16MB scope); more windows per call
    amortize MXU latency. The halving retry in the wrapper covers model
    error.
    """
    g = pack * pack
    if ppg <= 1:
        per_win = 8 * (-(-wy // 8) * 8) * 128 * 4
        budget = 9 << 20
    else:
        # live set per window column: 2*(ppg+1) spectra planes (packed dense —
        # p*wx fills the 128 lanes) + ~8 inverse/product temporaries + one
        # frame's lane-padded window build
        per_win = (2 * (ppg + 1) + 8) * wy * wx * 4 + wy * 128 * 4
        budget = 7 << 20
    cols = max(int(budget // per_win), 1)
    cols = max(cols // g * g, g) if g > 1 else min(cols, 24)
    cols = min(cols, -(-n_cols // g) * g if g > 1 else n_cols)
    return cols, cols * per_win


def _kernel(
    b0_ref,  # SMEM scalar [1]: first (global) band of this strip
    frames_hbm,  # ANY/HBM ref [T, H, W]
    cy_ref,
    sy_ref,
    cx_ref,
    sx_ref,
    pm_ref,  # [8, p*wy, p*wx] packed block-diagonal DFT matrices
    u_ref,
    v_ref,
    cmax_ref,
    s2n_ref,
    bands,  # VMEM scratch [2, ppg+1, band_h, W] (double buffer x frames)
    sems,  # DMA semaphores [2, ppg+1]
    *,
    wy: int,
    wx: int,
    step_y: int,
    step_x: int,
    n_rows: int,  # bands processed by THIS launch (strip height)
    n_cols: int,
    pack: int,  # windows packed per MXU-tile axis (1 = packing disabled)
    band_h: int,  # DMA height: wy (+ alignment slack for odd step_y), round8
    col_chunk: int,
    pair_stride: int,  # 1: consecutive frames; 2: interleaved (a0,b0,a1,b1..)
    ppg: int,  # pairs per grid step (consecutive pairs share frames; >1
    # requires pair_stride == 1). Each grid step streams ppg+1 frame
    # bands instead of 2*ppg and computes each shared frame's window
    # build + demean + forward DFT ONCE — the forward transform is 12
    # of the 18 matmul stages, so sharing cuts matmul FLOPs/pair by up
    # to a third and window-build issue traffic by up to half.
):
    base = pl.program_id(0) * ppg * pair_stride  # first frame of this step
    band0 = b0_ref[0]
    cy = cy_ref[:]
    sy = sy_ref[:]
    cxt = cx_ref[:].T
    sxt = sx_ref[:].T
    cyT = jnp.swapaxes(cy, 0, 1)
    syT = jnp.swapaxes(sy, 0, 1)
    pm = pm_ref[:] if pack > 1 else None
    aligned = step_y % 8 == 0
    n_frames = ppg + 1

    # Odd step_y (e.g. the 26/13 grid from window_size 25): the DMA starts at
    # the aligned-down row 8*floor(r0/8) — provably divisible by the 8-sublane
    # tiling — and the band is rotated into place in VMEM (dynamic-shift
    # roll); Mosaic rejects unaligned HBM DMAs and dynamic sublane slices.
    def row0(band_idx):
        r0 = (band0 + band_idx) * step_y
        return r0, (r0 if aligned else 8 * (r0 // 8))

    def get_dma(slot, f, band_idx):
        _, r0a = row0(band_idx)
        return pltpu.make_async_copy(
            frames_hbm.at[base + f, pl.ds(r0a, band_h), :], bands.at[slot, f], sems.at[slot, f]
        )

    def extract_band(buf, band_idx):
        if aligned:
            return jax.lax.slice_in_dim(buf, 0, wy, axis=0)
        r0, r0a = row0(band_idx)
        rolled = pltpu.roll(buf, band_h - (r0 - r0a), 0)
        return jax.lax.slice_in_dim(rolled, 0, wy, axis=0)

    for f in range(n_frames):
        get_dma(0, f, 0).start()
    g = pack * pack

    def loop_body(band_idx, _):
        slot = band_idx % 2
        nxt = (band_idx + 1) % 2

        @pl.when(band_idx + 1 < n_rows)
        def _():
            for f in range(n_frames):
                get_dma(nxt, f, band_idx + 1).start()

        for f in range(n_frames):
            get_dma(slot, f, band_idx).wait()
        bds = [extract_band(bands[slot, f], band_idx) for f in range(n_frames)]
        row_parts = [[] for _ in range(ppg)]
        for c0 in range(0, n_cols, col_chunk):
            cnt = min(col_chunk, n_cols - c0)
            # clamp-pad up to the packing group; duplicates discarded below
            cnt_pad = -(-cnt // g) * g if pack > 1 else cnt
            # forward phase, ONCE per frame: windows -> demean -> spectra
            fwd = []
            for f in range(n_frames):
                a, sa, va = _demean_one(bds[f], wy, wx, step_x, c0, cnt_pad, n_cols)
                if pack > 1:
                    a = _pack_windows(a, pack, wy, wx)
                    sp = _dft2t_fwd(a, pm[0], pm[1], pm[2], pm[3])
                else:
                    sp = _dft2t_fwd(a, cxt, sxt, cyT, syT)
                fwd.append((sp, sa, va))
            for j in range(ppg):
                (a_re, a_im), sa, va = fwd[j]
                (b_re, b_im), sb, vb = fwd[j + 1]
                if pack > 1:
                    corr4 = _corr_from_spectra(a_re, a_im, b_re, b_im, pm[4], pm[5], pm[6], pm[7])
                    corr = _unpack_windows(corr4, pack, wy, wx, cnt_pad)
                else:
                    corr = _corr_from_spectra(a_re, a_im, b_re, b_im, cxt, sxt, cyT, syT)
                    # fftshift both axes (the packed path bakes it into pm[4:])
                    corr = pltpu.roll(corr, wy // 2, 1)
                    corr = pltpu.roll(corr, wx // 2, 2)
                u, v, cmax, s2n, validf = _finish_corr(corr, sa, sb, va & vb, wy, wx)
                # transpose the [cnt, 5] result columns onto lanes with one MXU
                # dot (outputs keep n_cols on the 128-lane axis: a [.., n_cols, 1]
                # layout would pad every band's results to 128 lanes)
                res = jnp.concatenate([u, v, cmax, s2n, validf], axis=1)  # [cnt_pad, 5]
                eye = (
                    jax.lax.broadcasted_iota(jnp.int32, (cnt_pad, cnt_pad), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (cnt_pad, cnt_pad), 1)
                ).astype(jnp.float32)
                # HIGHEST: the transpose carries VALUES — default single-pass
                # bf16 would round u/v through 8 mantissa bits
                res_t = jax.lax.dot_general(
                    res, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [5, cnt_pad]
                row_parts[j].append(res_t[:, 0:cnt] if cnt_pad != cnt else res_t)
        # dynamic-sublane stores must span the block's full lane extent
        # (partial-width stores into multi-lane-tile rows are rejected), so
        # assemble the whole band row as a value and store it once per output
        b = pl.ds(band_idx, 1)
        for j in range(ppg):
            parts = row_parts[j]
            row = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            ok = row[4:5] > 0.5
            u_ref[j, b, :] = jnp.where(ok, row[0:1], jnp.nan)
            v_ref[j, b, :] = jnp.where(ok, row[1:2], jnp.nan)
            cmax_ref[j, b, :] = row[2:3]
            s2n_ref[j, b, :] = row[3:4]
        return 0

    jax.lax.fori_loop(0, n_rows, loop_body, 0)


# -- packed-domain ("tileband") pairs kernel -------------------------------------
#
# For the standard 50%-overlap grid (step = w/2), windows at even (or odd)
# indices tile CONTIGUOUSLY: band[step*c : step*c + p*w] is exactly p abutting
# windows (window c+2q starts at in-slice lane q*w). The whole pipeline then
# stays in the dense packed domain:
#   - tile build: p wide slices per [p*w, p*w] tile (vs p*p window slices)
#   - demeaning: zeroing the DC bin of one spectrum (a constant shift only
#     carries energy at frequency (0,0)), i.e. ONE elementwise mask — no
#     per-window mean subtract/broadcast
#   - per-window stats: blockwise sums as two B1-matrix contractions on the
#     MXU; blockwise max/min as p-slice trees; per-window scalars live as
#     [n_t, p, p] slabs
#   - subpixel: the one-hot/roll trick works tile-wide because the stencil is
#     clamped one pixel inside each window, so tile rolls never leak across
#     window blocks at selected positions
#   - result rows assemble via one batched matmul against a scatter constant
# This removes the lane-padding (a [cnt, 26, 26] stack pads 26 -> 128 lanes)
# and the per-window slice traffic that dominate the sliced path below 64 px.


def _tb_shape(w: int) -> Tuple[int, int]:
    """(py, px) window-blocks per tile axis for the tileband kernel.

    py fills the 128 sublanes with wp-padded window rows; px matches it on
    the lane axis (a 2x-wider px was measured slower: the extra block-
    diagonal x-stage FLOPs cost more than the saved tile-build stores).
    """
    wp = -(-w // 8) * 8
    py = max(128 // wp, 1)
    return py, py


def _tb_consts(w: int, n_cols: int):
    """Host-built constants for the tileband kernel.

    Tiles are RECTANGULAR [py*wp, px*w] with wp = round8(w): each window row
    block is padded to the 8-sublane tiling so the tile-build stores are
    fully aligned. The padding rows carry image garbage; the y-DFT matrices
    and the block-sum/broadcast matrices are zero there, and lin_mod is
    sentineled.

    Returns (dc_mask [pxw, pwh], cst [3, pwh, pxw] (lin/row/col mods),
    b1x [pxw, px], b1y [pwh, py], qt [n_t, py, n_cols], qs [px, n_cols]).
    qt/qs scatter per-window scalars from tile slabs into band-row order:
    window j lives in tile t = 2*(j // g2) + j%2 (g2 = 2*py*px) at block
    row r, col q with k = (j % g2) // 2, r = k // px, q = k % px.
    """
    py, px = _tb_shape(w)
    wp = -(-w // 8) * 8
    pxw = px * w
    pwh = py * wp
    g2 = 2 * py * px
    n_t = 2 * (-(-n_cols // g2))
    b1x = np.zeros((pxw, px), np.float32)
    b1y = np.zeros((pwh, py), np.float32)
    for c in range(px):
        b1x[c * w : (c + 1) * w, c] = 1.0
    for r in range(py):
        b1y[r * wp : r * wp + w, r] = 1.0
    ii = np.arange(pwh)[:, None] % wp  # space-y within block (incl. padding)
    jj = np.arange(pxw)[None, :] % w  # space-x within block
    real = ii < w
    lin_mod = np.where(real, ii * w + jj, 2.0 * w * w).astype(np.float32)
    row_mod = np.broadcast_to(ii, (pwh, pxw)).astype(np.float32)
    col_mod = np.broadcast_to(jj, (pwh, pxw)).astype(np.float32)
    cst = np.stack([lin_mod, row_mod, col_mod])
    # spectra live TRANSPOSED: [x-freq (pxw sublanes), y-freq (pwh lanes)]
    fx = np.arange(pxw)[:, None] % w
    fy = np.arange(pwh)[None, :] % wp
    dc_mask = 1.0 - ((fx == 0) & (fy == 0)).astype(np.float32)
    qt = np.zeros((n_t, py, n_cols), np.float32)
    qs = np.zeros((px, n_cols), np.float32)
    for j in range(n_cols):
        u, i = divmod(j, g2)
        k, par = i // 2, i % 2
        r, q = divmod(k, px)
        qt[2 * u + par, r, j] = 1.0
        qs[q, j] = 1.0
    return dc_mask, cst, b1x, b1y, qt, qs


def _tb_mats(w: int):
    """(pmx [4, pxw, pxw], pmy [4, pwh, pwh]) block-diagonal DFT matrices.

    pmx: forward CXT, SXT; inverse (fftshift-folded) ICXT, ISXT over w-blocks.
    pmy: same for the y stages over wp-blocks, zero-padded beyond w so the
    tile's alignment-padding rows neither contribute nor receive energy.
    """
    py, px = _tb_shape(w)
    wp = -(-w // 8) * 8
    c, s = _dft_mats(w)
    bdx = lambda m: np.kron(np.eye(px, dtype=np.float32), m.astype(np.float32))
    c_s = np.roll(c, -(w // 2), axis=0)
    s_s = np.roll(s, -(w // 2), axis=0)
    pmx = np.stack([bdx(c.T), bdx(s.T), bdx(c_s.T), bdx(s_s.T)])

    def pad_y(m):
        out = np.zeros((wp, wp), np.float32)
        out[:w, :w] = m
        return out

    bdy = lambda m: np.kron(np.eye(py, dtype=np.float32), pad_y(m.astype(np.float32)))
    pmy = np.stack([bdy(c.T), bdy(s.T), bdy(c_s.T), bdy(s_s.T)])
    return pmx, pmy


def _tb_kernel(
    b0_ref,  # SMEM scalar [1]: first (global) band of this strip
    frames_hbm,  # ANY/HBM ref [T, H, W]
    pmx_ref,  # [4, pxw, pxw] x-stage DFT matrices
    pmy_ref,  # [4, pwh, pwh] y-stage DFT matrices (zero-padded blocks)
    dc_ref,  # [pxw, pwh] DC-bin mask (transposed-spectrum domain)
    cst_ref,  # [3, pwh, pxw]: lin_mod, row_mod, col_mod
    b1x_ref,  # [pxw, px]
    b1y_ref,  # [pwh, py]
    qt_ref,  # [5*bband*n_t, py, n_cols] (host-tiled: one per assembled scalar x band)
    qs_ref,  # [px, n_cols]
    u_ref,
    v_ref,
    cmax_ref,
    s2n_ref,
    band_a,  # VMEM scratch [2, band_h, W] (double buffer)
    band_b,
    tiles_s,  # VMEM scratch [2*bband*n_t, pwh, pxw]: packed tiles, frames a/b
    sem_a,
    sem_b,
    *,
    w: int,
    step_y: int,
    step_x: int,
    n_rows: int,  # bands processed by THIS launch; a multiple of bband
    n_cols: int,
    band_h: int,
    bband: int,  # bands per loop iteration (batched through the whole math)
    pair_stride: int,  # 1: consecutive frames; 2: interleaved (a0,b0,a1,b1..)
):
    pair = pl.program_id(0) * pair_stride
    band0 = b0_ref[0]
    pmx = pmx_ref[:]
    pmy = pmy_ref[:]
    dc_mask = dc_ref[:]
    lin_mod = cst_ref[0]
    row_mod = cst_ref[1]
    col_mod = cst_ref[2]
    b1x = b1x_ref[:]
    b1y = b1y_ref[:]
    qt5 = qt_ref[:]
    qs = qs_ref[:]
    aligned = step_y % 8 == 0
    py, px = _tb_shape(w)
    wp = -(-w // 8) * 8
    pxw = px * w
    pwh = py * wp
    g2 = 2 * py * px
    n_t = qt5.shape[0] // (5 * bband)
    n_pix = w * w
    T = lambda x: jnp.swapaxes(x, -1, -2)
    mm = lambda x, m: jnp.matmul(x, m, preferred_element_type=jnp.float32)
    # Blockwise gather matmuls carry VALUES (not FLOPs): ablation put them at
    # ~47% of kernel time when they ran at HIGHEST (6-pass fp32). Mosaic
    # rejects Precision.HIGH, so ~18-bit accuracy is built by hand: one
    # 1-pass bf16 matmul on the bf16-roundable part plus one on the residual
    # (the 0/1 gather matrices are exact in bf16, so each pass is exact for
    # its operand part). Nothing downstream of a block_sum needs more — the
    # one bit-exact consumer, the `corr >= blockmax` peak compare, uses the
    # exact 3-pass split (mm3 in ``bcast``).
    def mm1(x, m):
        return jnp.matmul(x, m, preferred_element_type=jnp.float32)

    def mm2(x, m):
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        return mm1(hi, m) + mm1(x - hi, m)

    def mm3(x, m):
        # EXACT for 0/1 matrices: fp32's 24-bit mantissa splits into three
        # bf16-exact 8-bit parts (round-to-nearest residuals are exactly
        # representable), each pass exact, fp32 accumulation exact
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = x - hi
        mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
        return mm1(hi, m) + mm1(mid, m) + mm1(r1 - mid, m)

    mmx = mm2
    mt = bband * n_t  # tiles per frame per group

    b1xt = b1x.T
    b1yt = b1y.T

    def block_sum(x):  # [n_t, pwh, pxw] -> [n_t, py(r), px(c)]
        return T(mmx(T(mmx(x, b1x)), b1y))

    def block_reduce(x, red):  # slice-tree for max/min -> [n_t, py, px]
        rows = [red(jax.lax.slice_in_dim(x, r * wp, (r + 1) * wp, axis=1), 1) for r in range(py)]
        xr = jnp.concatenate(rows, axis=1)  # [n_t, py, pxw]
        cols = [red(jax.lax.slice_in_dim(xr, c * w, (c + 1) * w, axis=2), 2) for c in range(px)]
        return jnp.concatenate(cols, axis=2)

    rmax = lambda x, ax: jnp.max(x, axis=ax, keepdims=True)
    rmin = lambda x, ax: jnp.min(x, axis=ax, keepdims=True)

    def bcast(m, mm=None):
        # [n_t, py(r), px(c)] -> [n_t, pwh, pxw] (zero at padding rows).
        # Exactness is per-site: the peak compare needs all 24 fp32 mantissa
        # bits (mm3, the default — half the passes of Precision.HIGHEST);
        # small-integer peak coordinates are exact even at 1-pass bf16 (mm1);
        # approximate means ride the 2-pass split (mm2).
        if mm is None:
            mm = mm3
        return T(mm(T(mm(m, b1xt)), b1yt))

    def dft2t(v):  # [n_t, pwh, pxw] -> transposed spectra [n_t, pxw, pwh]
        p_ = mm(v, pmx[0])
        q_ = mm(v, pmx[1])
        pt = T(p_)
        qt_ = T(q_)
        return mm(pt, pmy[0]) - mm(qt_, pmy[1]), mm(pt, pmy[1]) + mm(qt_, pmy[0])

    def row0(band_idx):
        r0 = (band0 + band_idx) * step_y
        return r0, (r0 if aligned else 8 * (r0 // 8))

    def get_dma(slot, band_idx):
        _, r0a = row0(band_idx)
        return (
            pltpu.make_async_copy(frames_hbm.at[pair, pl.ds(r0a, band_h), :], band_a.at[slot], sem_a.at[slot]),
            pltpu.make_async_copy(frames_hbm.at[pair + 1, pl.ds(r0a, band_h), :], band_b.at[slot], sem_b.at[slot]),
        )

    def extract_band(buf, band_idx):
        # [wp, W]: the window band plus (wp - w) alignment-padding rows of
        # following image content (excluded by the zero-padded matrices)
        if aligned:
            return jax.lax.slice_in_dim(buf, 0, wp, axis=0)
        r0, r0a = row0(band_idx)
        rolled = pltpu.roll(buf, band_h - (r0 - r0a), 0)
        return jax.lax.slice_in_dim(rolled, 0, wp, axis=0)

    def build_tiles(band, f, b):  # [wp, W] stored into tiles_s[(f*bband+b)*n_t :]
        # one [wp, px*w] store per tile row: at 50% overlap px consecutive
        # same-parity windows are CONTIGUOUS in the band (window c+2q starts
        # at in-slice lane q*w). (Mosaic rejects sublane-concats of slices
        # with mismatched lane offsets; aligned scratch stores lower cleanly.)
        for t in range(n_t):
            u_, par = divmod(t, 2)
            for r in range(py):
                w0 = min(u_ * g2 + 2 * px * r + par, n_cols - 1)
                tiles_s[(f * bband + b) * n_t + t, wp * r : wp * (r + 1), :] = (
                    jax.lax.slice_in_dim(band, w0 * step_x, w0 * step_x + pxw, axis=1)
                )

    da0, db0 = get_dma(0, 0)
    da0.start()
    db0.start()

    def loop_body(g, _):
        # stream bband bands into the tile scratch (double-buffered DMA),
        # then run the whole math pipeline ONCE on the [bband*n_t] batch —
        # per-op issue overhead amortizes over bband bands
        first = g * bband
        for b in range(bband):
            band_idx = first + b
            slot = band_idx % 2
            nxt = (band_idx + 1) % 2

            @pl.when(band_idx + 1 < n_rows)
            def _(nxt=nxt, band_idx=band_idx):
                da, db = get_dma(nxt, band_idx + 1)
                da.start()
                db.start()

            da, db = get_dma(slot, band_idx)
            da.wait()
            db.wait()
            build_tiles(extract_band(band_a[slot], band_idx), 0, b)
            build_tiles(extract_band(band_b[slot], band_idx), 1, b)

        # EXPLICIT packed-domain demeaning (block means broadcast back): the
        # DC-mask trick alone is exact in exact arithmetic, but correlating
        # raw high-mean data leaves ~(mu/sigma)^2-times-larger low-frequency
        # spectral products whose fp32 cancellation noise corrupts smooth
        # imagery at the 1% level. Both frames of all bband bands ride one
        # [2*mt, ...] batch through demean + forward DFT — read straight out
        # of the tile scratch (frame-major layout), no concat copy.
        ab = tiles_s[0 : 2 * mt]
        # approximate means suffice: the DC mask removes the exact mean term
        # from the correlation; demeaning only tames fp32 cancellation noise
        ab = ab - bcast(block_sum(ab) / n_pix, mm=mmx)
        ssqs = block_sum(ab * ab)
        ssq_a = jax.lax.slice_in_dim(ssqs, 0, mt, axis=0)
        ssq_b = jax.lax.slice_in_dim(ssqs, mt, 2 * mt, axis=0)

        ab_re, ab_im = dft2t(ab)
        # zero DC on frame a: conj(A)B then has no mean term
        at_re = jax.lax.slice_in_dim(ab_re, 0, mt, axis=0) * dc_mask
        at_im = jax.lax.slice_in_dim(ab_im, 0, mt, axis=0) * dc_mask
        bt_re = jax.lax.slice_in_dim(ab_re, mt, 2 * mt, axis=0)
        bt_im = jax.lax.slice_in_dim(ab_im, mt, 2 * mt, axis=0)
        st_re = at_re * bt_re + at_im * bt_im
        st_im = at_re * bt_im - at_im * bt_re
        st_re_t = T(st_re)
        st_im_t = T(st_im)
        v_re = mm(st_re_t, pmx[2]) + mm(st_im_t, pmx[3])
        v_im = mm(st_im_t, pmx[2]) - mm(st_re_t, pmx[3])
        corr = T(mm(T(v_re), pmy[2]) + mm(T(v_im), pmy[3]))
        # clip BEFORE normalization (positive scaling commutes with the clip)
        corr = jnp.maximum(corr, 0.0)

        cmax_raw = block_reduce(corr, rmax)
        csum_raw = block_sum(corr)
        ispk = corr >= bcast(cmax_raw)  # exact: same values fed both sides
        lin = jnp.where(ispk, lin_mod, jnp.float32(2 * n_pix))
        first_lin = block_reduce(lin, rmin)
        iy = jnp.floor(first_lin / w)
        ix = first_lin - iy * w
        iyc = jnp.clip(iy, 1.0, w - 2.0)
        ixc = jnp.clip(ix, 1.0, w - 2.0)
        # ONE broadcast for both peak coordinates (ablation showed this whole
        # stencil stage at >50% of kernel time when it ran 3 bcasts, 4 tile
        # rolls and 5 separate block_sum chains). Peak coordinates are small
        # integers (< 128) — exact in bf16, so a single 1-pass matmul
        iyx = bcast(jnp.concatenate([iyc, ixc], axis=0), mm=mm1)
        iyB = jax.lax.slice_in_dim(iyx, 0, mt, axis=0)
        ixB = jax.lax.slice_in_dim(iyx, mt, 2 * mt, axis=0)
        at_y = row_mod == iyB
        at_x = col_mod == ixB
        # neighbour reads via SHIFTED one-hots (no tile rolls): the clamped
        # stencil keeps iyc/ixc one pixel inside each window block, so the
        # +-1 masks stay inside the block too
        oh0 = (at_y & at_x).astype(jnp.float32)
        ohl = (at_y & (col_mod == ixB - 1.0)).astype(jnp.float32)
        ohr = (at_y & (col_mod == ixB + 1.0)).astype(jnp.float32)
        ohu = ((row_mod == iyB - 1.0) & at_x).astype(jnp.float32)
        ohd = ((row_mod == iyB + 1.0) & at_x).astype(jnp.float32)
        # all five stencil extractions in ONE batched slice-tree: each masked
        # plane has exactly one non-negative value per block (corr >= 0 after
        # the clip), so blockMAX == blockSUM — and the max tree is pure VPU,
        # no matmul passes or transposes
        sten5 = jnp.concatenate(
            [oh0 * corr, ohl * corr, ohr * corr, ohu * corr, ohd * corr], axis=0
        )
        sten = block_reduce(sten5, rmax)

        # per-window scalar math on [mt, py, px] slabs (matches _finish_corr;
        # sigma from the demeaned tiles, like the XLA path)
        sa = jnp.sqrt(jnp.maximum(ssq_a / n_pix, 0.0))
        sb = jnp.sqrt(jnp.maximum(ssq_b / n_pix, 0.0))
        valid = (sa > 1e-6) & (sb > 1e-6)
        validf = valid.astype(jnp.float32)
        denom = jnp.maximum(n_pix * sa * sb, 1e-10) * n_pix
        cmax = jnp.where(valid, cmax_raw / denom, 0.0)
        cmean = jnp.where(valid, csum_raw / denom, 0.0) / n_pix
        s2n = cmax / jnp.maximum(cmean, 1e-10)

        eps = 1e-10
        # normalize + log the whole 5-slab stencil stack in one pass
        valid5 = jnp.concatenate([valid] * 5, axis=0)
        denom5 = jnp.concatenate([denom] * 5, axis=0)
        logs = jnp.log(jnp.maximum(jnp.where(valid5, sten / denom5, 0.0), eps))
        sl = lambda k: jax.lax.slice_in_dim(logs, k * mt, (k + 1) * mt, axis=0)
        log0 = sl(0)
        lcl = sl(1)
        lcr = sl(2)
        lcu = sl(3)
        lcd = sl(4)

        def safe_div(num, den):
            den = jnp.where(jnp.abs(den) < eps, -eps, den)
            return num / den

        dx = safe_div(lcl - lcr, 2 * lcl - 4 * log0 + 2 * lcr)
        dy = safe_div(lcu - lcd, 2 * lcu - 4 * log0 + 2 * lcd)
        dx = jnp.clip(dx, -1.0, 1.0)
        dy = jnp.clip(dy, -1.0, 1.0)
        u = (ixc + dx) - w // 2
        v = -((iyc + dy) - w // 2)

        # all five scalar fields through ONE batched assemble; entry order is
        # (scalar, band, tile), so a [5*bband, n_t, ...] reshape sums tiles
        # per (scalar, band) and rows land band-contiguous per scalar
        allsc = jnp.concatenate([validf, u, v, cmax, s2n], axis=0)  # [5*mt, py, px]
        m1 = mmx(T(allsc), qt5)  # [5*mt, px, n_cols]
        m2 = jnp.sum(m1.reshape(5 * bband, n_t, px, n_cols), axis=1)  # [5*bband, px, n_cols]
        rows = jnp.sum(m2 * qs, axis=1)  # [5*bband, n_cols] in window order
        # per-band single-row stores: Mosaic only lowers dynamic sublane
        # stores that are single-row or provably 8-aligned, and `first` is a
        # multiple of bband, not 8
        for b in range(bband):
            ok = rows[b : b + 1] > 0.5
            bsl = pl.ds(first + b, 1)
            u_ref[0, bsl, :] = jnp.where(ok, rows[bband + b : bband + b + 1], jnp.nan)
            v_ref[0, bsl, :] = jnp.where(ok, rows[2 * bband + b : 2 * bband + b + 1], jnp.nan)
            cmax_ref[0, bsl, :] = rows[3 * bband + b : 3 * bband + b + 1]
            s2n_ref[0, bsl, :] = rows[4 * bband + b : 4 * bband + b + 1]
        return 0

    jax.lax.fori_loop(0, n_rows // bband, loop_body, 0)


def _tb_bband(w: int, n_cols: int, share: bool = False) -> int:
    """Bands batched per loop iteration, sized by a VMEM live-set model.

    The math pipeline's peak live set is ~8 [n_t, pwh, pad128(pxw)] fp32
    plane-arrays (demeaned tiles + spectra + correlation + stencil stack);
    batching bband bands multiplies that. Budget ~11MB of the 16MB scope for
    them (tiles scratch, band buffers, DFT matrices and output blocks take
    the rest); the wrapper's vmem-overflow retry halves on model error.
    Measured on v5e at 16 px 1080p: 519 / 545 / 572 / 583 pairs/s at
    bband 1 / 2 / 3 / 4 (diminishing — the band DMA + tile-build stores
    scale with bands).

    ``share`` (tileband ENSEMBLE with the forward-spectra cache): the cache
    holds one frame's (re, im) spectra plus its ssq across grid steps — ~2
    extra plane-arrays live at peak on top of the downstream set (the forward
    batch itself halves, mt instead of 2*mt).
    """
    py, px = _tb_shape(w)
    wp = -(-w // 8) * 8
    g2 = 2 * py * px
    n_t = 2 * (-(-n_cols // g2))
    plane = n_t * (py * wp) * (-(-(px * w) // 128) * 128) * 4
    per_band = (9 if share else 8) * plane
    if share == "pairs":
        # shared-forward PER-PAIR kernel: the spectra cache's 2 extra planes
        # AND the peak-stencil stack's widest batch (sten5: 5 planes) are
        # both live in the same launch — but not simultaneously at peak, so
        # its budget runs slightly hotter (measured: 26 px bband=2 compiles
        # and gains +3.5%; bband=3 is a real overflow the retry ladder
        # halves away on other shapes)
        per_band = 10 * plane
        return max(1, min(int((13 << 20) // per_band), 4))
    return max(1, min(int((11 << 20) // per_band), 4))


@functools.partial(jax.jit, static_argnums=(1, 2, 4, 5, 6, 7, 8))
def _piv_pairs_tb_jit(imgs, sas, steps, band0, nb, n_cols, interpret, pair_stride=1, bband=1):
    """Tileband variant of _piv_pairs_fused_jit (50%-overlap square windows)."""
    wy, wx = sas
    step_y, step_x = steps
    w = wx
    t = imgs.shape[0]
    n_pairs = t // pair_stride if pair_stride > 1 else t - 1
    _, band_h = _fused_plan(wy, wx, step_y)
    py, px = _tb_shape(w)
    wp = -(-w // 8) * 8
    band_h = max(band_h, wp)
    pmx, pmy = _tb_mats(w)
    dc_mask, cst, b1x, b1y, qt, qs = _tb_consts(w, n_cols)
    w_img = imgs.shape[-1]
    frames = imgs.astype(jnp.float32)
    b0_arr = jnp.asarray(band0, dtype=jnp.int32).reshape(1)
    pxw = px * w
    pwh = py * wp
    n_t = qt.shape[0]
    # one qt block per assembled scalar x band, tiled on the host so the
    # kernel's batched assemble needs no per-iteration concat of a constant
    qt5 = np.tile(qt, (5 * bband, 1, 1))
    # the band loop runs in groups of bband; pad the strip's band count (the
    # padded bands read real-but-irrelevant rows — the caller pads the frame
    # tall enough — and their result rows are sliced off below)
    nb_pad = -(-nb // bband) * bband

    kernel = functools.partial(
        _tb_kernel, w=w, step_y=step_y, step_x=step_x, n_rows=nb_pad, n_cols=n_cols,
        band_h=band_h, bband=bband, pair_stride=pair_stride,
    )
    out_shape = [jax.ShapeDtypeStruct((n_pairs, nb_pad, n_cols), jnp.float32) for _ in range(4)]
    out_spec = pl.BlockSpec((1, nb_pad, n_cols), lambda p_: (p_, 0, 0), memory_space=pltpu.VMEM)
    vspec = lambda *dims: pl.BlockSpec(dims, lambda p_: (0,) * len(dims), memory_space=pltpu.VMEM)
    u, v, cmax, s2n = pl.pallas_call(
        kernel,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            vspec(4, pxw, pxw),
            vspec(4, pwh, pwh),
            vspec(pxw, pwh),
            vspec(3, pwh, pxw),
            vspec(pxw, px),
            vspec(pwh, py),
            vspec(5 * bband * n_t, py, n_cols),
            vspec(px, n_cols),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, band_h, w_img), jnp.float32),
            pltpu.VMEM((2, band_h, w_img), jnp.float32),
            pltpu.VMEM((2 * bband * n_t, pwh, pxw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        b0_arr, frames, jnp.asarray(pmx), jnp.asarray(pmy), jnp.asarray(dc_mask),
        jnp.asarray(cst), jnp.asarray(b1x), jnp.asarray(b1y), jnp.asarray(qt5), jnp.asarray(qs),
    )
    if nb_pad != nb:
        u, v, cmax, s2n = (x[:, :nb] for x in (u, v, cmax, s2n))
    return u, v, cmax, s2n


def _tb_ens_kernel(
    frames_hbm,  # ANY/HBM ref [T, H, W]
    pmx_ref,  # [4, pxw, pxw]
    pmy_ref,  # [4, pwh, pwh]
    dc_ref,  # [pxw, pwh]
    cst_ref,  # [3, pwh, pxw] lin/row/col mods (pairs mode; dummy in ens mode)
    b1x_ref,  # [pxw, px]
    b1y_ref,  # [pwh, py]
    qt_ref,  # [(3 ens | 5 pairs)*bband*n_t, py, n_cols]
    qs_ref,  # [px, n_cols]
    acc_ref,  # ens: [1, mt, pwh, pxw] packed corr-sum block, resident across
    # pairs; pairs mode: u [1, 1, bband, n_cols] per (pair, strip)
    count_ref,  # ens: [1, bband, n_cols] resident block; pairs: v
    cmax_ref,  # [1, 1, bband, n_cols] per (strip, pair)
    s2n_ref,
    bufs,  # VMEM scratch [3, slab_h, W]: rotating frame-slab buffers
    tiles_s,  # VMEM scratch [mt (share) or 2*mt, pwh, pxw]
    spec_s,  # VMEM scratch [2*mt, pxw, pwh] fwd-spectra cache (share_fwd only)
    ssq_s,  # VMEM scratch [mt, py, px] block sum-of-squares cache (share_fwd)
    sems,
    *,
    w: int,
    step_y: int,
    step_x: int,
    n_cols: int,
    n_pairs: int,
    corr_min: float,
    s2n_min: float,
    bband: int,
    slab_h: int,
    share_fwd: bool,  # cache each frame's tile build + demean + forward DFT
    # across the two pairs that touch it (scratch persists across the
    # sequential pair grid steps), so the forward phase runs once per FRAME
    # instead of twice per interior frame; bit-exact vs the unshared path
    # (per-tile batched ops are independent of batch composition).
    mode: str = "ens",  # "ens": VMEM-resident corr-sum accumulation;
    # "pairs": the per-pair contract — the same shared-forward correlation
    # pipeline finished by _tb_kernel's peak-stencil stage, with u/v/cmax/s2n
    # written per (pair, strip) instead of accumulated.
):
    """Tileband ENSEMBLE kernel: the per-pair tileband correlation pipeline
    (see ``_tb_kernel``) WITHOUT its u/v peak-stencil stage, plus a packed
    [mt, pwh, pxw] corr-sum accumulator that stays VMEM-resident across the
    pair grid axis (reduction pattern: the acc/count output blocks' index
    maps are constant in the innermost grid dim). One frame slab streams per
    pair (consecutive pairs share a frame — 3 rotating buffers), vs two per
    band in the per-pair kernel. Unpacking the packed accumulator to
    [n_windows, wy, wx] order happens ONCE in XLA after the launch.

    Replaces the reference's long-video ensemble path
    (pyorc/velocimetry/ffpiv.py:182-376) at the shipped small window sizes.
    """
    s = pl.program_id(0)
    p = pl.program_id(1)
    pmx = pmx_ref[:]
    pmy = pmy_ref[:]
    dc_mask = dc_ref[:]
    b1x = b1x_ref[:]
    b1y = b1y_ref[:]
    qt = qt_ref[:]
    qs = qs_ref[:]
    aligned = step_y % 8 == 0
    py, px = _tb_shape(w)
    wp = -(-w // 8) * 8
    pxw = px * w
    pwh = py * wp
    g2 = 2 * py * px
    n_sc = 3 if mode == "ens" else 5  # assembled scalars per band
    n_t = qt.shape[0] // (n_sc * bband)
    mt = bband * n_t
    n_pix = w * w
    n_frames = frames_hbm.shape[0]
    T = lambda x: jnp.swapaxes(x, -1, -2)
    mm = lambda x, m: jnp.matmul(x, m, preferred_element_type=jnp.float32)

    def mm1(x, m):
        return jnp.matmul(x, m, preferred_element_type=jnp.float32)

    def mm2(x, m):
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        return mm1(hi, m) + mm1(x - hi, m)

    def mm3(x, m):
        # EXACT for 0/1 matrices (see _tb_kernel)
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = x - hi
        mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
        return mm1(hi, m) + mm1(mid, m) + mm1(r1 - mid, m)

    mmx = mm2
    b1xt = b1x.T
    b1yt = b1y.T

    def block_sum(x):
        return T(mmx(T(mmx(x, b1x)), b1y))

    def block_reduce(x, red):
        rows = [red(jax.lax.slice_in_dim(x, r * wp, (r + 1) * wp, axis=1), 1) for r in range(py)]
        xr = jnp.concatenate(rows, axis=1)
        cols = [red(jax.lax.slice_in_dim(xr, c * w, (c + 1) * w, axis=2), 2) for c in range(px)]
        return jnp.concatenate(cols, axis=2)

    rmax = lambda x, ax: jnp.max(x, axis=ax, keepdims=True)
    rmin = lambda x, ax: jnp.min(x, axis=ax, keepdims=True)

    def bcast(m, mm=None):
        if mm is None:
            mm = mmx
        return T(mm(T(mm(m, b1xt)), b1yt))

    def dft2t(v):
        p_ = mm(v, pmx[0])
        q_ = mm(v, pmx[1])
        pt = T(p_)
        qt_ = T(q_)
        return mm(pt, pmy[0]) - mm(qt_, pmy[1]), mm(pt, pmy[1]) + mm(qt_, pmy[0])

    # strip slab rows: bands [s*bband, (s+1)*bband) cover contiguous image
    # rows (50% overlap -> stride step_y, height wp each)
    r0 = (s * bband) * step_y
    r0a = r0 if aligned else 8 * (r0 // 8)

    def dma(frame_idx):
        f = jnp.minimum(frame_idx, n_frames - 1)
        return pltpu.make_async_copy(
            frames_hbm.at[f, pl.ds(r0a, slab_h), :], bufs.at[frame_idx % 3], sems.at[frame_idx % 3]
        )

    def extract_band(buf, b):
        # [wp, W]: band b of the strip (plus wp - w alignment-padding rows of
        # following image content, excluded by the zero-padded matrices)
        if aligned:
            return jax.lax.slice_in_dim(buf, b * step_y, b * step_y + wp, axis=0)
        rolled = pltpu.roll(buf, slab_h - ((r0 - r0a) + b * step_y), 0)
        return jax.lax.slice_in_dim(rolled, 0, wp, axis=0)

    def build_tiles(band, f, b):
        for t in range(n_t):
            u_, par = divmod(t, 2)
            for r in range(py):
                w0 = min(u_ * g2 + 2 * px * r + par, n_cols - 1)
                tiles_s[(f * bband + b) * n_t + t, wp * r : wp * (r + 1), :] = (
                    jax.lax.slice_in_dim(band, w0 * step_x, w0 * step_x + pxw, axis=1)
                )

    @pl.when(p == 0)
    def _():
        if mode == "ens":
            # the resident accumulator blocks zero once per strip; in pairs
            # mode every output block is per-(pair, strip), nothing persists
            acc_ref[...] = jnp.zeros_like(acc_ref)
            count_ref[...] = jnp.zeros_like(count_ref)
        dma(0).start()
        dma(1).start()

    # prefetch one frame ahead; never start a copy no later pair waits on
    @pl.when(p + 2 <= n_pairs)
    def _():
        dma(p + 2).start()

    if share_fwd:
        # forward phase for ONE frame: tile build + demean + ssq + forward
        # DFT (frame slot 0 of the mt-sized tile scratch)
        def fwd_frame(buf_idx):
            for b in range(bband):
                build_tiles(extract_band(bufs[buf_idx], b), 0, b)
            a = tiles_s[0:mt]
            a = a - bcast(block_sum(a) / n_pix)
            ssq = block_sum(a * a)
            re, im = dft2t(a)
            return re, im, ssq

        @pl.when(p == 0)
        def _():
            # seed the cache with frame 0's forward state (per strip: the
            # pair axis is the innermost grid dim, so p restarts per strip)
            dma(0).wait()
            re0, im0, ssq0 = fwd_frame(0)
            spec_s[0:mt] = re0
            spec_s[mt : 2 * mt] = im0
            ssq_s[...] = ssq0

        dma(p + 1).wait()
        bt_re, bt_im, ssq_b = fwd_frame((p + 1) % 3)
        # read frame p's cached state BEFORE overwriting the slot with
        # frame p+1's (which serves pair p+1 as its A side)
        at_re = spec_s[0:mt] * dc_mask
        at_im = spec_s[mt : 2 * mt] * dc_mask
        ssq_a = ssq_s[...]
        spec_s[0:mt] = bt_re
        spec_s[mt : 2 * mt] = bt_im
        ssq_s[...] = ssq_b
    else:
        @pl.when(p == 0)
        def _():
            dma(0).wait()

        dma(p + 1).wait()
        for b in range(bband):
            build_tiles(extract_band(bufs[p % 3], b), 0, b)
            build_tiles(extract_band(bufs[(p + 1) % 3], b), 1, b)

        # demean + forward DFT, both frames of all bands in one batch (see
        # _tb_kernel for the numerical rationale)
        ab = tiles_s[0 : 2 * mt]
        ab = ab - bcast(block_sum(ab) / n_pix)
        ssqs = block_sum(ab * ab)
        ssq_a = jax.lax.slice_in_dim(ssqs, 0, mt, axis=0)
        ssq_b = jax.lax.slice_in_dim(ssqs, mt, 2 * mt, axis=0)

        ab_re, ab_im = dft2t(ab)
        at_re = jax.lax.slice_in_dim(ab_re, 0, mt, axis=0) * dc_mask
        at_im = jax.lax.slice_in_dim(ab_im, 0, mt, axis=0) * dc_mask
        bt_re = jax.lax.slice_in_dim(ab_re, mt, 2 * mt, axis=0)
        bt_im = jax.lax.slice_in_dim(ab_im, mt, 2 * mt, axis=0)
    st_re = at_re * bt_re + at_im * bt_im
    st_im = at_re * bt_im - at_im * bt_re
    st_re_t = T(st_re)
    st_im_t = T(st_im)
    v_re = mm(st_re_t, pmx[2]) + mm(st_im_t, pmx[3])
    v_im = mm(st_im_t, pmx[2]) - mm(st_re_t, pmx[3])
    corr = T(mm(T(v_re), pmy[2]) + mm(T(v_im), pmy[3]))
    corr = jnp.maximum(corr, 0.0)

    cmax_raw = block_reduce(corr, rmax)
    csum_raw = block_sum(corr)
    sa = jnp.sqrt(jnp.maximum(ssq_a / n_pix, 0.0))
    sb = jnp.sqrt(jnp.maximum(ssq_b / n_pix, 0.0))
    valid = (sa > 1e-6) & (sb > 1e-6)
    denom = jnp.maximum(n_pix * sa * sb, 1e-10) * n_pix
    cmax_n = jnp.where(valid, cmax_raw / denom, 0.0)
    cmean_n = jnp.where(valid, csum_raw / denom, 0.0) / n_pix
    s2n_n = cmax_n / jnp.maximum(cmean_n, 1e-10)
    if mode == "ens":
        okf = (
            (cmax_n >= corr_min).astype(jnp.float32)
            * (s2n_n >= s2n_min).astype(jnp.float32)
            * valid.astype(jnp.float32)
        )  # [mt, py, px]

        # gated, normalized plane accumulation in the PACKED domain: one bcast
        # of ok/denom + one fused multiply-add on the resident block
        acc_ref[0] += corr * bcast(okf / denom)

        # per-pair scalars (gated, matching piv_ensemble_scan's contract)
        # through the batched qt/qs assemble into band-row order
        allsc = jnp.concatenate([okf, okf * cmax_n, okf * s2n_n], axis=0)  # [3mt, py, px]
        m1 = mmx(T(allsc), qt)  # [3mt, px, n_cols]
        m2 = jnp.sum(m1.reshape(3 * bband, n_t, px, n_cols), axis=1)
        rows = jnp.sum(m2 * qs, axis=1)  # [3*bband, n_cols]
        for b in range(bband):
            count_ref[0, b : b + 1, :] += rows[b : b + 1]
            cmax_ref[0, 0, b : b + 1, :] = rows[bband + b : bband + b + 1]
            s2n_ref[0, 0, b : b + 1, :] = rows[2 * bband + b : 2 * bband + b + 1]
        return

    # -- pairs mode: _tb_kernel's peak-stencil finish on the mt batch --------
    lin_mod = cst_ref[0]
    row_mod = cst_ref[1]
    col_mod = cst_ref[2]
    validf = valid.astype(jnp.float32)
    ispk = corr >= bcast(cmax_raw, mm=mm3)  # exact: same values fed both sides
    lin = jnp.where(ispk, lin_mod, jnp.float32(2 * n_pix))
    first_lin = block_reduce(lin, rmin)
    iy = jnp.floor(first_lin / w)
    ix = first_lin - iy * w
    iyc = jnp.clip(iy, 1.0, w - 2.0)
    ixc = jnp.clip(ix, 1.0, w - 2.0)
    # ONE broadcast for both peak coordinates (small integers: exact in bf16)
    iyx = bcast(jnp.concatenate([iyc, ixc], axis=0), mm=mm1)
    iyB = jax.lax.slice_in_dim(iyx, 0, mt, axis=0)
    ixB = jax.lax.slice_in_dim(iyx, mt, 2 * mt, axis=0)
    at_y = row_mod == iyB
    at_x = col_mod == ixB
    # neighbour reads via SHIFTED one-hots (no tile rolls); the clamped
    # stencil keeps iyc/ixc one pixel inside each window block
    oh0 = (at_y & at_x).astype(jnp.float32)
    ohl = (at_y & (col_mod == ixB - 1.0)).astype(jnp.float32)
    ohr = (at_y & (col_mod == ixB + 1.0)).astype(jnp.float32)
    ohu = ((row_mod == iyB - 1.0) & at_x).astype(jnp.float32)
    ohd = ((row_mod == iyB + 1.0) & at_x).astype(jnp.float32)
    # all five stencil extractions in ONE batched slice-tree (blockMAX ==
    # blockSUM: one non-negative value per block after the clip)
    sten5 = jnp.concatenate(
        [oh0 * corr, ohl * corr, ohr * corr, ohu * corr, ohd * corr], axis=0
    )
    sten = block_reduce(sten5, rmax)

    eps = 1e-10
    valid5 = jnp.concatenate([valid] * 5, axis=0)
    denom5 = jnp.concatenate([denom] * 5, axis=0)
    logs = jnp.log(jnp.maximum(jnp.where(valid5, sten / denom5, 0.0), eps))
    sl = lambda k: jax.lax.slice_in_dim(logs, k * mt, (k + 1) * mt, axis=0)
    log0 = sl(0)
    lcl = sl(1)
    lcr = sl(2)
    lcu = sl(3)
    lcd = sl(4)

    def safe_div(num, den):
        den = jnp.where(jnp.abs(den) < eps, -eps, den)
        return num / den

    dx = safe_div(lcl - lcr, 2 * lcl - 4 * log0 + 2 * lcr)
    dy = safe_div(lcu - lcd, 2 * lcu - 4 * log0 + 2 * lcd)
    dx = jnp.clip(dx, -1.0, 1.0)
    dy = jnp.clip(dy, -1.0, 1.0)
    u = (ixc + dx) - w // 2
    v = -((iyc + dy) - w // 2)

    # all five scalar fields through ONE batched assemble (see _tb_kernel)
    allsc = jnp.concatenate([validf, u, v, cmax_n, s2n_n], axis=0)  # [5*mt, py, px]
    m1 = mmx(T(allsc), qt)  # [5*mt, px, n_cols]
    m2 = jnp.sum(m1.reshape(5 * bband, n_t, px, n_cols), axis=1)
    rows = jnp.sum(m2 * qs, axis=1)  # [5*bband, n_cols] in window order
    for b in range(bband):
        ok = rows[b : b + 1] > 0.5
        acc_ref[0, 0, b : b + 1, :] = jnp.where(ok, rows[bband + b : bband + b + 1], jnp.nan)
        count_ref[0, 0, b : b + 1, :] = jnp.where(
            ok, rows[2 * bband + b : 2 * bband + b + 1], jnp.nan
        )
        cmax_ref[0, 0, b : b + 1, :] = rows[3 * bband + b : 3 * bband + b + 1]
        s2n_ref[0, 0, b : b + 1, :] = rows[4 * bband + b : 4 * bband + b + 1]


def _tb_unpack_perm(w: int, n_cols: int) -> np.ndarray:
    """Window j -> flat (tile, block-row, block-col) index in the packed
    accumulator (inverse of the build_tiles layout, see _tb_consts)."""
    py, px = _tb_shape(w)
    g2 = 2 * py * px
    perm = np.zeros(n_cols, np.int64)
    for j in range(n_cols):
        u, i = divmod(j, g2)
        k, par = i // 2, i % 2
        r, q = divmod(k, px)
        perm[j] = (2 * u + par) * py * px + r * px + q
    return perm


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def _piv_ensemble_tb_jit(
    imgs, sas, steps, n_rows, n_cols, corr_min, s2n_min, interpret, bband, share_fwd=True
):
    """Tileband ensemble PIV (50%-overlap square windows < 32 px).

    Returns the ``piv_ensemble_scan`` contract: (corr_sum [n_windows, wy, wx],
    corr_count [n_windows], corr_max / s2n [n_pairs, n_rows, n_cols]).
    """
    wy, wx = sas
    step_y, step_x = steps
    w = wx
    n_pairs = imgs.shape[0] - 1
    py, px = _tb_shape(w)
    wp = -(-w // 8) * 8
    pxw = px * w
    pwh = py * wp
    n_pix = w * w
    pmx, pmy = _tb_mats(w)
    dc_mask, cst, b1x, b1y, qt, qs = _tb_consts(w, n_cols)
    n_t = qt.shape[0]
    mt = bband * n_t
    qt3 = np.tile(qt, (3 * bband, 1, 1))
    n_strips = -(-n_rows // bband)
    nb_pad = n_strips * bband
    slack = 0 if step_y % 8 == 0 else 7
    slab_h = -(-(slack + (bband - 1) * step_y + wp) // 8) * 8

    # pad once: lane extent to the 128 tiling + the tileband build slack, row
    # extent to cover the last strip's slab (padded bands read real-but-
    # irrelevant rows; their rows are sliced off below)
    w_needed = step_x * (n_cols - 1) + pxw
    pad_w = max(w_needed - imgs.shape[-1], 0) + (-max(w_needed, imgs.shape[-1])) % 128
    pad_h = max((n_strips - 1) * bband * step_y + slab_h - imgs.shape[-2], 0)
    if pad_w or pad_h:
        imgs = jnp.pad(imgs, ((0, 0), (0, pad_h), (0, pad_w)))
    frames = imgs.astype(jnp.float32)
    w_img = frames.shape[-1]

    kernel = functools.partial(
        _tb_ens_kernel, w=w, step_y=step_y, step_x=step_x, n_cols=n_cols,
        n_pairs=n_pairs, corr_min=float(corr_min), s2n_min=float(s2n_min),
        bband=bband, slab_h=slab_h, share_fwd=bool(share_fwd),
    )
    # cmax/s2n are 4-D so the block's trailing two dims EQUAL the array dims
    # (a (1, bband, n_cols) block over [n_pairs, nb_pad, n_cols] would need
    # bband % 8 == 0 — Mosaic's sublane block constraint)
    out_shape = [
        jax.ShapeDtypeStruct((n_strips, mt, pwh, pxw), jnp.float32),  # packed corr-sum
        jax.ShapeDtypeStruct((n_strips, bband, n_cols), jnp.float32),  # count
        jax.ShapeDtypeStruct((n_pairs, n_strips, bband, n_cols), jnp.float32),  # cmax
        jax.ShapeDtypeStruct((n_pairs, n_strips, bband, n_cols), jnp.float32),  # s2n
    ]
    vspec = lambda *dims: pl.BlockSpec(dims, lambda s_, p_: (0,) * len(dims), memory_space=pltpu.VMEM)
    acc, count, cmax, s2n = pl.pallas_call(
        kernel,
        grid=(n_strips, n_pairs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vspec(4, pxw, pxw),
            vspec(4, pwh, pwh),
            vspec(pxw, pwh),
            vspec(3, pwh, pxw),
            vspec(pxw, px),
            vspec(pwh, py),
            vspec(3 * bband * n_t, py, n_cols),
            vspec(px, n_cols),
        ],
        out_specs=[
            pl.BlockSpec((1, mt, pwh, pxw), lambda s_, p_: (s_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bband, n_cols), lambda s_, p_: (s_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bband, n_cols), lambda s_, p_: (p_, s_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bband, n_cols), lambda s_, p_: (p_, s_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, slab_h, w_img), jnp.float32),
            # share mode builds one frame's tiles at a time and caches its
            # forward state; the dummies keep the kernel signature static
            pltpu.VMEM(((mt if share_fwd else 2 * mt), pwh, pxw), jnp.float32),
            pltpu.VMEM((2 * mt, pxw, pwh) if share_fwd else (8, 128), jnp.float32),
            pltpu.VMEM((mt, py, px) if share_fwd else (8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        frames, jnp.asarray(pmx), jnp.asarray(pmy), jnp.asarray(dc_mask),
        jnp.asarray(cst), jnp.asarray(b1x), jnp.asarray(b1y), jnp.asarray(qt3),
        jnp.asarray(qs),
    )
    # unpack the packed accumulator to window order, ONCE: [n_strips, mt,
    # pwh, pxw] -> blocks -> gather real windows -> [n_windows, wy, wx]
    blocks = acc.reshape(n_strips, bband, n_t, py, wp, px, w)[:, :, :, :, :w]
    blocks = jnp.moveaxis(blocks, 5, 4).reshape(n_strips, bband, n_t * py * px, w, w)
    perm = jnp.asarray(_tb_unpack_perm(w, n_cols))
    corr_sum = blocks[:, :, perm].reshape(nb_pad, n_cols, w, w)[:n_rows]
    corr_sum = corr_sum.reshape(n_rows * n_cols, w, w)
    corr_count = count.reshape(nb_pad, n_cols)[:n_rows].reshape(n_rows * n_cols)
    cmax = cmax.reshape(n_pairs, nb_pad, n_cols)[:, :n_rows]
    s2n = s2n.reshape(n_pairs, nb_pad, n_cols)[:, :n_rows]
    return corr_sum, corr_count, cmax, s2n


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def _piv_pairs_sf_jit(imgs, sas, steps, n_rows, n_cols, interpret, bband, share_fwd=True):
    """Shared-forward per-pair tileband PIV (50%-overlap square windows < 32 px).

    Launches ``_tb_ens_kernel`` in ``mode="pairs"``: one frame-slab DMA +
    tile build + demean + forward DFT per FRAME (cached across the two pairs
    that touch it, 3 rotating slab buffers) instead of two per pair, finished
    by the per-pair peak-stencil stage. Returns the ``piv_pairs`` contract:
    (u, v, corr_max, s2n) each [n_pairs, n_rows, n_cols]. Consecutive-frame
    stacks only (``pair_stride=2`` keeps the band kernel: interleaved pairs
    share no frames, so there is nothing to cache).
    """
    wy, wx = sas
    step_y, step_x = steps
    w = wx
    n_pairs = imgs.shape[0] - 1
    py, px = _tb_shape(w)
    wp = -(-w // 8) * 8
    pxw = px * w
    pwh = py * wp
    pmx, pmy = _tb_mats(w)
    dc_mask, cst, b1x, b1y, qt, qs = _tb_consts(w, n_cols)
    n_t = qt.shape[0]
    mt = bband * n_t
    qt5 = np.tile(qt, (5 * bband, 1, 1))
    n_strips = -(-n_rows // bband)
    nb_pad = n_strips * bband
    slack = 0 if step_y % 8 == 0 else 7
    slab_h = -(-(slack + (bband - 1) * step_y + wp) // 8) * 8

    w_needed = step_x * (n_cols - 1) + pxw
    pad_w = max(w_needed - imgs.shape[-1], 0) + (-max(w_needed, imgs.shape[-1])) % 128
    pad_h = max((n_strips - 1) * bband * step_y + slab_h - imgs.shape[-2], 0)
    if pad_w or pad_h:
        imgs = jnp.pad(imgs, ((0, 0), (0, pad_h), (0, pad_w)))
    frames = imgs.astype(jnp.float32)
    w_img = frames.shape[-1]

    kernel = functools.partial(
        _tb_ens_kernel, w=w, step_y=step_y, step_x=step_x, n_cols=n_cols,
        n_pairs=n_pairs, corr_min=0.0, s2n_min=0.0,
        bband=bband, slab_h=slab_h, share_fwd=bool(share_fwd), mode="pairs",
    )
    pair_shape = jax.ShapeDtypeStruct((n_pairs, n_strips, bband, n_cols), jnp.float32)
    pair_spec = pl.BlockSpec(
        (1, 1, bband, n_cols), lambda s_, p_: (p_, s_, 0, 0), memory_space=pltpu.VMEM
    )
    vspec = lambda *dims: pl.BlockSpec(dims, lambda s_, p_: (0,) * len(dims), memory_space=pltpu.VMEM)
    u, v, cmax, s2n = pl.pallas_call(
        kernel,
        grid=(n_strips, n_pairs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vspec(4, pxw, pxw),
            vspec(4, pwh, pwh),
            vspec(pxw, pwh),
            vspec(3, pwh, pxw),
            vspec(pxw, px),
            vspec(pwh, py),
            vspec(5 * bband * n_t, py, n_cols),
            vspec(px, n_cols),
        ],
        out_specs=[pair_spec] * 4,
        out_shape=[pair_shape] * 4,
        scratch_shapes=[
            pltpu.VMEM((3, slab_h, w_img), jnp.float32),
            pltpu.VMEM(((mt if share_fwd else 2 * mt), pwh, pxw), jnp.float32),
            pltpu.VMEM((2 * mt, pxw, pwh) if share_fwd else (8, 128), jnp.float32),
            pltpu.VMEM((mt, py, px) if share_fwd else (8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        frames, jnp.asarray(pmx), jnp.asarray(pmy), jnp.asarray(dc_mask),
        jnp.asarray(cst), jnp.asarray(b1x), jnp.asarray(b1y), jnp.asarray(qt5),
        jnp.asarray(qs),
    )
    out = []
    for x in (u, v, cmax, s2n):
        out.append(x.reshape(n_pairs, nb_pad, n_cols)[:, :n_rows])
    return tuple(out)


def piv_pairs_fused(
    imgs,
    dim_size: Tuple[int, int],
    sas: Tuple[int, int],
    overlap: Tuple[int, int],
    n_rows: int,
    n_cols: int,
    signal_threshold: Optional[float] = None,
    interpret: bool = False,
    pair_stride: int = 1,
):
    """Fused-kernel PIV: frames [T,H,W] -> (u, v, corr_max, s2n) [T-1, n_rows, n_cols].

    ``pair_stride=2`` correlates interleaved explicit pairs (a0,b0,a1,b1,...)
    — used by multi-pass PIV, whose deformed pair stacks are not consecutive
    frames — yielding [T//2, ...] outputs.

    Falls back to the XLA-composed pipeline when the window grid does not
    match the strided fast-path layout or a signal_threshold is requested.
    """
    if interpret and _interpret_needs_cpu_pin():
        with jax.default_device(jax.devices("cpu")[0]):
            return piv_pairs_fused(
                np.asarray(imgs), dim_size, sas, overlap, n_rows, n_cols,
                signal_threshold, interpret, pair_stride,
            )
    from . import piv as piv_ops

    wy, wx = sas
    row0, col0 = win.get_window_starts(dim_size, sas, overlap)
    step_y = piv_ops._strided_axis_starts(np.asarray(row0), wy)
    step_x = piv_ops._strided_axis_starts(np.asarray(col0), wx)
    if not _fused_geometry_ok(wy, wx, step_y, step_x) or signal_threshold is not None:
        _route("piv_pairs_fused", "xla_geometry")
        if pair_stride != 1:
            u, v, cmax, s2n = piv_ops.piv_pairs(
                imgs, dim_size, sas, overlap, n_rows, n_cols, signal_threshold
            )
            return u[::pair_stride], v[::pair_stride], cmax[::pair_stride], s2n[::pair_stride]
        return piv_ops.piv_pairs(imgs, dim_size, sas, overlap, n_rows, n_cols, signal_threshold)
    pack, band_h = _fused_plan(wy, wx, step_y)
    # strip planning: the per-pair output blocks live in VMEM for the whole
    # program. With n_cols on the lane axis a [1, nb, n_cols] block costs
    # pad8(nb) * pad128(n_cols) * 4 bytes per output — every realistic config
    # (incl. 4K at 16 px) fits one launch; the strip split survives as a
    # safety net for degenerate geometries.
    imgs = jnp.asarray(imgs)
    last_err = None
    tileband = _tileband_ok(wy, wx, step_x, pack)
    bband = _tb_bband(wx, n_cols) if tileband else 1
    n_pairs = imgs.shape[0] // pair_stride if pair_stride > 1 else imgs.shape[0] - 1
    if tileband and pair_stride == 1 and n_pairs >= 2:
        # shared-forward tileband: one slab DMA + tile build + forward DFT
        # per FRAME (cached across the two pairs that touch it) instead of
        # two per pair — the same structural win the ensemble kernel gets
        # from its spectra cache, kept for per-pair outputs
        sf_bband = _tb_bband(wx, n_cols, share="pairs")
        while sf_bband >= 1:
            try:
                out = _piv_pairs_sf_jit(
                    imgs, (wy, wx), (step_y, step_x), n_rows, n_cols,
                    bool(interpret), sf_bband,
                )
                _route("piv_pairs_fused", "tileband_sf")
                return out
            except Exception as e:
                if not _recoverable(e):
                    raise  # programming error, never a fallback condition
                last_err = e
                msg = str(e)
                if "vmem" in msg.lower() and sf_bband > 1:
                    sf_bband //= 2
                    continue
                if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
                    raise
                break
        # fall through to the band tileband kernel below (strict mode: error)
        if _strict_kernels():
            raise RuntimeError(
                "piv_pairs_fused: shared-forward tileband kernel failed and "
                "PYORC_TPU_STRICT_KERNELS is set (would have fallen back to "
                "the band tileband kernel)."
            ) from last_err
        warnings.warn(
            f"shared-forward tileband kernel failed ({last_err}); "
            "falling back to the band tileband kernel.",
            stacklevel=2,
        )
    # pair blocking (sliced path only): share each interior frame's window
    # build + forward DFT between the two pairs that use it
    ppg = 4 if (pair_stride == 1 and not tileband and n_pairs >= 4) else 1
    band_scratch = 2 * (ppg + 1) * band_h * (-(-imgs.shape[-1] // 128) * 128) * 4
    # 4 outputs x ppg pair rows, 1/8 sublane tile amortized
    per_band = (-(-n_cols // 128) * 128) * 4 * 4 * max(ppg, 1)
    _, temp_bytes = _chunk_plan(n_cols, wy, wx, pack, ppg)
    reserve = temp_bytes + 8 * (pack * wy) * (-(-(pack * wx) // 128) * 128) * 4
    # ppg > 1's tighter per-window model keeps closer to the true live set, so
    # it gets more of the 16MB scope; the vmem-retry ladder covers the rest
    budget = ((14 << 20) if ppg > 1 else (12 << 20) + (512 << 10))
    nb_max = max(int((budget - band_scratch - reserve) // per_band), 4)
    while nb_max >= 4:
        try:
            out = _piv_pairs_fused_strips(
                imgs, (wy, wx), (step_y, step_x), n_rows, n_cols, nb_max, bool(interpret),
                int(pair_stride), bband, ppg,
            )
            _route("piv_pairs_fused", "tileband" if tileband else "sliced")
            return out
        except Exception as e:
            if not _recoverable(e):
                raise  # programming error, never a fallback condition
            last_err = e
            msg = str(e)
            # the compiler's scoped-vmem accounting beats any host-side model;
            # on overflow retry with fewer batched bands/pairs, then fewer
            # bands per launch
            if "vmem" in msg.lower() and bband > 1:
                bband //= 2
                continue
            if "vmem" in msg.lower() and ppg > 1:
                ppg //= 2
                continue
            if "vmem" in msg.lower() and nb_max > 4:
                nb_max = max(nb_max // 2, 4)
                continue
            # device (HBM) OOM must propagate: the engine's chunk-splitting
            # backoff handles it, and the XLA fallback needs MORE memory
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
                raise
            break
    # Any other Pallas/Mosaic failure (lowering rejection, a renamed compiler
    # error class...) degrades to the slower-but-correct XLA pipeline with an
    # observable warning rather than a hard failure (strict mode: an error).
    _fallback("piv_pairs_fused", "xla", last_err, "fused PIV kernel")
    u, v, cmax, s2n = piv_ops.piv_pairs(imgs, dim_size, sas, overlap, n_rows, n_cols, signal_threshold)
    if pair_stride != 1:
        return u[::pair_stride], v[::pair_stride], cmax[::pair_stride], s2n[::pair_stride]
    return u, v, cmax, s2n


def _fused_geometry_ok(wy, wx, step_y, step_x) -> bool:
    """Window grids the fused kernels can run.

    Uniform strided grids only. Square windows up to 128 px run the packed-MXU
    path at ANY alignment (odd steps use super-band DMA + static unaligned
    VMEM slices — e.g. the reference's window_size-25 -> 26/13 grid,
    /root/reference/examples/ngwerere/ngwerere.yml:16). Non-square windows
    need the legacy 8-aligned >= 64 px layout.
    """
    if step_y is None or step_x is None:
        return False
    if wy == wx and 8 <= wx <= 128:
        return True
    return (
        step_y % 8 == 0 and step_x % 8 == 0 and wy % 8 == 0 and wx % 8 == 0 and min(wy, wx) >= 64
    )


def _fused_plan(wy: int, wx: int, step_y: int):
    """(pack, band_h) for the fused kernels.

    pack: windows per MXU-tile axis (tile = pack*wy x pack*wx, <= 128 lanes).
    band_h: per-band DMA height — the window height rounded to the 8-sublane
    tiling, plus up to 7 rows of alignment slack when the band row offset is
    not 8-divisible (the DMA then starts at the aligned-down row and the band
    is rotated into place in VMEM).
    """
    pack = max(128 // wx, 1) if wy == wx else 1
    slack = 0 if step_y % 8 == 0 else 7
    band_h = -(-(wy + slack) // 8) * 8
    return pack, band_h


def _tileband_ok(wy: int, wx: int, step_x: int, pack: int) -> bool:
    """The packed-domain kernel needs the standard 50%-overlap square grid
    (step = w/2 makes even/odd windows tile contiguously). Per-pair routing:
    <= 32 px runs the tileband (round-5 shared-forward measurements, 1080p
    pairs/s — 16 px: 943 vs XLA-era 252, 32 px: 953 tileband_sf vs 700
    sliced); at 64 px the sliced-pack path stays ahead (1073 vs 1033 sf —
    few windows per band make per-window slicing cheap while the packed
    stats machinery still pays per-plane costs)."""
    return wy == wx and 2 * step_x == wx and 8 <= wx <= 32


def _tb_ens_splits(wy: int, wx: int, step_x: int, n_cols: int) -> int:
    """Ensemble routing plan: the tileband ensemble beats the sliced
    accumulator at EVERY window size (round-5 1080p pairs/s,
    tileband/sliced — 16 px: 1274/—, 26 px: 890/—, 32 px: 1257/868,
    64 px: 1288/1140), so route to it whenever the 50%-overlap square
    geometry holds and a VMEM plan exists. Oversize grids whose packed
    accumulator alone would blow the scope (4K at 64 px wants ~18 MB) are
    COLUMN-SPLIT into the fewest window-grid chunks that fit (measured 4K
    64 px: col-split x2 371 vs sliced 287 pairs/s, x3 341). Returns the
    split count, or 0 when the kernel should not be used — a PLAN decision,
    never the exception ladder (which strict mode turns into an error)."""
    if not (wy == wx and 2 * step_x == wx and 8 <= wx <= 64):
        return 0
    py, px = _tb_shape(wx)
    wp = -(-wx // 8) * 8
    g2 = 2 * py * px
    for k in (1, 2, 3, 4):
        nc = -(-n_cols // k)
        if k > 1 and nc < g2 // 2:  # degenerate chunks: less than one tile
            break
        n_t = 2 * (-(-nc // g2))
        plane = n_t * (py * wp) * (-(-(px * wx) // 128) * 128) * 4
        if 9 * plane <= (11 << 20):  # the bband=1 shared-forward live set
            return k
    return 0


def _piv_ensemble_tb_chunks(
    imgs, sas, steps, n_rows, n_cols, corr_min, s2n_min, interpret, bband,
    share, n_splits,
):
    """Column-split tileband ensemble: the window grid is cut into n_splits
    lane-contiguous chunks of ONE static shape (the last chunk overlaps
    backward; its already-computed columns are sliced off), each launched
    through ``_piv_ensemble_tb_jit`` on the lane-sliced frames."""
    if n_splits == 1:
        return _piv_ensemble_tb_jit(
            imgs, sas, steps, n_rows, n_cols, corr_min, s2n_min, interpret, bband, share
        )
    w = sas[1]
    step_x = steps[1]
    nc = -(-n_cols // n_splits)
    parts = []
    prev_end = 0
    for i in range(n_splits):
        c0 = min(i * nc, n_cols - nc)
        cs, cc, cm, sn = _piv_ensemble_tb_jit(
            imgs[:, :, c0 * step_x:], sas, steps, n_rows, nc,
            corr_min, s2n_min, interpret, bband, share,
        )
        keep = prev_end - c0  # columns already produced by earlier chunks
        parts.append((
            cs.reshape(n_rows, nc, w, w)[:, keep:],
            cc.reshape(n_rows, nc)[:, keep:],
            cm[:, :, keep:],
            sn[:, :, keep:],
        ))
        prev_end = c0 + nc
    corr_sum = jnp.concatenate([p[0] for p in parts], axis=1).reshape(n_rows * n_cols, w, w)
    count = jnp.concatenate([p[1] for p in parts], axis=1).reshape(n_rows * n_cols)
    cmax = jnp.concatenate([p[2] for p in parts], axis=2)
    s2n = jnp.concatenate([p[3] for p in parts], axis=2)
    return corr_sum, count, cmax, s2n


def _piv_pairs_fused_strips(
    imgs, sas, steps, n_rows, n_cols, nb_max, interpret, pair_stride=1, bband=None, ppg=1
):
    # pad ONCE, globally: the band DMA needs the lane (width) extent to be a
    # multiple of the 128-lane tiling, the last band's buffer may read past
    # the frame bottom, and the tileband build slices p windows at once (up
    # to step*(n_cols-1) + p*w lanes). Real windows never read the padding.
    wy, wx = sas
    step_y, step_x = steps
    pack, band_h = _fused_plan(wy, wx, step_y)
    tileband = _tileband_ok(wy, wx, step_x, pack)
    if tileband:
        if bband is None:
            bband = _tb_bband(wx, n_cols)
        jit_fn = functools.partial(_piv_pairs_tb_jit, bband=bband)
    else:
        bband = 1
        jit_fn = functools.partial(_piv_pairs_fused_jit, ppg=ppg)
    # + (bband - 1) slack: each strip's band count pads up to a bband multiple
    # and the padded bands still DMA real rows
    rows_needed = (n_rows - 1 + (bband - 1)) * step_y + band_h
    w_needed = step_x * (n_cols - 1) + _tb_shape(wx)[1] * wx if tileband else imgs.shape[-1]
    pad_w = max(w_needed - imgs.shape[-1], 0) + (-max(w_needed, imgs.shape[-1])) % 128
    pad_h = max(rows_needed - imgs.shape[-2], 0)
    if pad_w or pad_h:
        imgs = jnp.pad(imgs, ((0, 0), (0, pad_h), (0, pad_w)))
    if n_rows <= nb_max:
        return jit_fn(imgs, sas, steps, 0, n_rows, n_cols, interpret, pair_stride)
    outs = []
    for b0 in range(0, n_rows, nb_max):
        nb = min(nb_max, n_rows - b0)
        outs.append(jit_fn(imgs, sas, steps, b0, nb, n_cols, interpret, pair_stride))
    return tuple(jnp.concatenate([o[k] for o in outs], axis=1) for k in range(4))


def _packed_mats(wy: int, wx: int, pack: int) -> np.ndarray:
    """[8, pack*wy, pack*wx] block-diagonal DFT matrices for the packed path.

    Order: forward CXT, SXT, CYT, SYT; inverse (fftshift-folded, rows of the
    base transform rolled by -w/2) ICXT, ISXT, ICYT, ISYT.
    """
    cy, sy = _dft_mats(wy)
    cx, sx = _dft_mats(wx)
    eye = np.eye(pack, dtype=np.float32)
    bd = lambda m: np.kron(eye, m.astype(np.float32))
    cy_s = np.roll(cy, -(wy // 2), axis=0)
    sy_s = np.roll(sy, -(wy // 2), axis=0)
    cx_s = np.roll(cx, -(wx // 2), axis=0)
    sx_s = np.roll(sx, -(wx // 2), axis=0)
    return np.stack(
        [bd(cx.T), bd(sx.T), bd(cy.T), bd(sy.T), bd(cx_s.T), bd(sx_s.T), bd(cy_s.T), bd(sy_s.T)]
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 4, 5, 6, 7, 8))
def _piv_pairs_fused_jit(imgs, sas, steps, band0, nb, n_cols, interpret, pair_stride=1, ppg=1):
    wy, wx = sas
    step_y, step_x = steps
    assert pair_stride == 1 or ppg == 1, "pair blocking shares frames; stride>1 pairs don't"
    t = imgs.shape[0]
    n_pairs = t // pair_stride if pair_stride > 1 else t - 1
    pack, band_h = _fused_plan(wy, wx, step_y)
    col_chunk, _ = _chunk_plan(n_cols, wy, wx, pack, ppg)
    cy, sy = (jnp.asarray(m) for m in _dft_mats(wy))
    cx, sx = (jnp.asarray(m) for m in _dft_mats(wx))
    pm = jnp.asarray(_packed_mats(wy, wx, pack))
    # frames arrive pre-padded from _piv_pairs_fused_strips (width to the
    # 128-lane tiling, height to cover the last band's buffer); with ppg > 1
    # also pad the PAIR axis so every grid step owns a full pair block (the
    # duplicated last frame correlates with itself; results are sliced off)
    n_steps = -(-n_pairs // ppg)
    pad_t = n_steps * ppg + 1 - t if pair_stride == 1 else 0
    if pad_t > 0:
        imgs = jnp.concatenate([imgs, jnp.repeat(imgs[-1:], pad_t, axis=0)], axis=0)
    w_img = imgs.shape[-1]
    frames = imgs.astype(jnp.float32)
    sb0_arr = jnp.asarray(band0, dtype=jnp.int32).reshape(1)

    kernel = functools.partial(
        _kernel, wy=wy, wx=wx, step_y=step_y, step_x=step_x, n_rows=nb, n_cols=n_cols,
        pack=pack, band_h=band_h, col_chunk=col_chunk, pair_stride=pair_stride, ppg=ppg,
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_steps * ppg, nb, n_cols), jnp.float32) for _ in range(4)
    ]
    out_spec = pl.BlockSpec((ppg, nb, n_cols), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)
    mat_spec = lambda n: pl.BlockSpec((n, n), lambda p: (0, 0), memory_space=pltpu.VMEM)
    u, v, cmax, s2n = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # strip band offset (scalar)
            pl.BlockSpec(memory_space=pl.ANY),  # frames stay in HBM; DMA'd per band
            mat_spec(wy),
            mat_spec(wy),
            mat_spec(wx),
            mat_spec(wx),
            pl.BlockSpec(
                (8, pack * wy, pack * wx), lambda p: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, ppg + 1, band_h, w_img), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ppg + 1)),
        ],
        interpret=interpret,
    )(sb0_arr, frames, cy, sy, cx, sx, pm)
    if n_steps * ppg != n_pairs:
        u, v, cmax, s2n = (x[:n_pairs] for x in (u, v, cmax, s2n))
    return u, v, cmax, s2n


# -- fused ensemble kernel -----------------------------------------------------


def _ens_fwd_chunk(bandv, cy, sy, cxt, sxt, pm, wy, wx, step_x, c0, cnt, pack, n_cols):
    """Forward phase for one frame band's column chunk: window build + demean
    + forward DFT. Returns (re, im, sa, valid) — the cacheable per-frame
    state the shared-forward ensemble path reuses for both pairs that touch
    the frame (consecutive pairs share their interior frame)."""
    a, sa, va = _demean_one(bandv, wy, wx, step_x, c0, cnt, n_cols)
    if pack > 1:
        a = _pack_windows(a, pack, wy, wx)
        re, im = _dft2t_fwd(a, pm[0], pm[1], pm[2], pm[3])
    else:
        re, im = _dft2t_fwd(a, cxt, sxt, jnp.swapaxes(cy, 0, 1), jnp.swapaxes(sy, 0, 1))
    return re, im, sa, va


def _ens_chunk_from_spectra(fa, fb, cy, sy, cxt, sxt, pm, wy, wx, cnt, pack):
    """Spectral product + inverse DFT + normalization from two cached forward
    chunks: (corr [cnt, wy, wx], cmax [cnt,1,1], s2n [cnt,1,1])."""
    a_re, a_im, sa, va = fa
    b_re, b_im, sb, vb = fb
    if pack > 1:
        corr4 = _corr_from_spectra(a_re, a_im, b_re, b_im, pm[4], pm[5], pm[6], pm[7])
        corr = _unpack_windows(corr4, pack, wy, wx, cnt)
    else:
        cyT = jnp.swapaxes(cy, 0, 1)
        syT = jnp.swapaxes(sy, 0, 1)
        corr = _corr_from_spectra(a_re, a_im, b_re, b_im, cxt, sxt, cyT, syT)
        corr = pltpu.roll(corr, wy // 2, 1)
        corr = pltpu.roll(corr, wx // 2, 2)
    valid = va & vb
    n_pix = wy * wx
    # one fused normalization pass (see _finish_corr)
    corr = corr / (n_pix * jnp.maximum(n_pix * sa * sb, 1e-10))
    corr = jnp.maximum(corr, 0.0)
    corr = jnp.where(valid, corr, 0.0)
    cmax = _r2(jnp.max, corr)
    cmean = _r2(jnp.mean, corr)
    s2n = cmax / jnp.maximum(cmean, 1e-10)
    return corr, cmax, s2n


def _ens_chunk(band_a, band_b, cy, sy, cxt, sxt, pm, wy, wx, step_x, c0, cnt, pack, n_cols):
    """Normalized, clipped, fftshifted corr planes + per-window stats for one
    column chunk: (corr [cnt, wy, wx], cmax [cnt,1,1], s2n [cnt,1,1]).
    When pack > 1 the caller clamp-pads cnt to a multiple of pack**2 and
    slices the duplicate results off afterwards."""
    fa = _ens_fwd_chunk(band_a, cy, sy, cxt, sxt, pm, wy, wx, step_x, c0, cnt, pack, n_cols)
    fb = _ens_fwd_chunk(band_b, cy, sy, cxt, sxt, pm, wy, wx, step_x, c0, cnt, pack, n_cols)
    return _ens_chunk_from_spectra(fa, fb, cy, sy, cxt, sxt, pm, wy, wx, cnt, pack)


_ENS_GROUP = 8  # pairs per grid step (output block sublane constraint)


def _ens_kernel(
    frames_hbm,  # ANY/HBM ref [T, H, W]
    cy_ref,
    sy_ref,
    cx_ref,
    sx_ref,
    pm_ref,
    corr_sum_ref,  # [1, n_cols, wy, wx] block, resident across pair groups
    count_ref,  # [1, _ENS_GROUP, n_cols] block, resident across pair groups
    cmax_ref,  # [1, _ENS_GROUP, n_cols] block per (band, group)
    s2n_ref,
    bufs,  # VMEM scratch [3, wy, W]: rotating frame-band buffers
    sems,
    *,
    wy: int,
    wx: int,
    step_y: int,
    step_x: int,
    n_cols: int,
    n_pairs: int,  # REAL pair count (grid may cover padded groups)
    corr_min: float,
    s2n_min: float,
    pack: int,
    col_chunk: int,
    buf_h: int,  # DMA buffer height (covers alignment slack for odd step_y)
    share_fwd: bool,  # cache each frame's forward spectra across the two
    # pairs that share it: the window build + demean + forward DFT (12 of
    # the 18 matmul stages) then run ~9/16 as often. Costs two full-band
    # spectra sets of VMEM; the wrapper gates it on fit.
):
    band = pl.program_id(0)
    grp = pl.program_id(1)
    n_frames = frames_hbm.shape[0]
    cy = cy_ref[:]
    sy = sy_ref[:]
    cxt = cx_ref[:].T
    sxt = sx_ref[:].T
    pm = pm_ref[:] if pack > 1 else None

    # odd step_y (e.g. the 26/13 grid): DMA from the aligned-down row
    # 8*floor(r0/8) — provably 8-divisible — and rotate the band into place
    # in VMEM (dynamic-shift roll), since Mosaic rejects unaligned HBM DMAs
    # and dynamic sublane slices.
    r0 = band * step_y
    r0a = r0 if step_y % 8 == 0 else 8 * (r0 // 8)

    def dma(frame_idx):
        f = jnp.minimum(frame_idx, n_frames - 1)
        return pltpu.make_async_copy(
            frames_hbm.at[f, pl.ds(r0a, buf_h), :], bufs.at[frame_idx % 3], sems.at[frame_idx % 3]
        )

    def extract_band(buf):
        if step_y % 8 == 0:
            return jax.lax.slice_in_dim(buf, 0, wy, axis=0)
        rolled = pltpu.roll(buf, buf_h - (r0 - r0a), 0)
        return jax.lax.slice_in_dim(rolled, 0, wy, axis=0)

    first_pair = grp * _ENS_GROUP

    # zero the resident accumulators at the start of each band
    @pl.when(grp == 0)
    def _():
        corr_sum_ref[...] = jnp.zeros_like(corr_sum_ref)
        count_ref[...] = jnp.zeros_like(count_ref)
        # frame chain restarts per band: frames 0 and 1
        dma(first_pair).start()
        dma(first_pair + 1).start()

    n_groups = pl.num_programs(1)
    for i in range(_ENS_GROUP):
        pair = first_pair + i

        # prefetch two frames ahead (clamped reads are harmless), but never
        # start a copy that no later pair will wait on — an un-waited DMA
        # corrupts the semaphore chain for the next band
        @pl.when(pair + 2 <= n_groups * _ENS_GROUP)
        def _():
            dma(pair + 2).start()

        @pl.when(jnp.logical_and(grp == 0, i == 0))
        def _():
            dma(pair).wait()

        dma(pair + 1).wait()
        pair_ok = (pair < n_pairs).astype(jnp.float32)
        band_a = extract_band(bufs[pair % 3])
        band_b = extract_band(bufs[(pair + 1) % 3])
        g = pack * pack
        chunks = [
            (c0, min(col_chunk, n_cols - c0)) for c0 in range(0, n_cols, col_chunk)
        ]
        if share_fwd:
            fwd_band = lambda bandv: [
                _ens_fwd_chunk(
                    bandv, cy, sy, cxt, sxt, pm, wy, wx, step_x, c0,
                    -(-cnt // g) * g if pack > 1 else cnt, pack, n_cols,
                )
                for c0, cnt in chunks
            ]
            if i == 0:
                prev_fwd = fwd_band(band_a)
            cur_fwd = fwd_band(band_b)
        for j, (c0, cnt) in enumerate(chunks):
            cnt_pad = -(-cnt // g) * g if pack > 1 else cnt
            if share_fwd:
                corr, cmax, s2n = _ens_chunk_from_spectra(
                    prev_fwd[j], cur_fwd[j], cy, sy, cxt, sxt, pm, wy, wx, cnt_pad, pack
                )
            else:
                corr, cmax, s2n = _ens_chunk(
                    band_a, band_b, cy, sy, cxt, sxt, pm, wy, wx, step_x, c0, cnt_pad, pack, n_cols
                )
            if cnt_pad != cnt:
                corr, cmax, s2n = (
                    jax.lax.slice_in_dim(t, 0, cnt, axis=0) for t in (corr, cmax, s2n)
                )
            ok = (
                (cmax >= corr_min).astype(jnp.float32)
                * (s2n >= s2n_min).astype(jnp.float32)
                * pair_ok
            )  # [cnt,1,1]
            corr_sum_ref[0, c0 : c0 + cnt] += ok * corr
            # transpose (ok, cmax*ok, s2n*ok) rows via one MXU dot_general
            sq = lambda x: jax.lax.squeeze(x, (2,))
            res = jnp.concatenate([sq(ok), sq(ok * cmax), sq(ok * s2n)], axis=1)  # [cnt, 3]
            eye = (
                jax.lax.broadcasted_iota(jnp.int32, (cnt, cnt), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (cnt, cnt), 1)
            ).astype(jnp.float32)
            res_t = jax.lax.dot_general(
                res, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [3, cnt]
            count_ref[0, i : i + 1, c0 : c0 + cnt] += res_t[0:1]
            cmax_ref[0, i : i + 1, c0 : c0 + cnt] = res_t[1:2]
            s2n_ref[0, i : i + 1, c0 : c0 + cnt] = res_t[2:3]
        if share_fwd:
            prev_fwd = cur_fwd  # frame i+1's spectra serve pair i+1 as its A side


def piv_ensemble_fused(
    imgs,
    dim_size: Tuple[int, int],
    sas: Tuple[int, int],
    overlap: Tuple[int, int],
    n_rows: int,
    n_cols: int,
    corr_min: float = 0.2,
    s2n_min: float = 3.0,
    signal_threshold: Optional[float] = None,
    interpret: bool = False,
    share_fwd: Optional[bool] = None,
):
    """Fused ensemble PIV: corr-sum/count accumulate IN VMEM across the pair
    axis (the output block is resident across the inner grid dimension, the
    standard reduction pattern), so neither the window stack nor per-pair
    correlation planes ever reach HBM. Returns the `piv_ensemble_scan`
    contract: (corr_sum [n_windows, wy, wx], corr_count [n_windows],
    corr_max [n_pairs, n_rows, n_cols], s2n [n_pairs, n_rows, n_cols]).

    ``share_fwd``: None = auto-enable the forward-spectra cache when it fits
    VMEM (both the tileband <32 px and sliced >=32 px kernels); True/False
    force it (tests).
    """
    if interpret and _interpret_needs_cpu_pin():
        # see _interpret_needs_cpu_pin
        with jax.default_device(jax.devices("cpu")[0]):
            return piv_ensemble_fused(
                np.asarray(imgs), dim_size, sas, overlap, n_rows, n_cols,
                corr_min, s2n_min, signal_threshold, interpret, share_fwd,
            )
    from . import piv as piv_ops

    wy, wx = sas
    row0, col0 = win.get_window_starts(dim_size, sas, overlap)
    step_y = piv_ops._strided_axis_starts(np.asarray(row0), wy)
    step_x = piv_ops._strided_axis_starts(np.asarray(col0), wx)
    if not _fused_geometry_ok(wy, wx, step_y, step_x) or signal_threshold is not None:
        _route("piv_ensemble_fused", "xla_geometry")
        return piv_ops.piv_ensemble_scan(
            imgs, dim_size, sas, overlap, n_rows, n_cols, corr_min, s2n_min, signal_threshold
        )
    imgs = jnp.asarray(imgs)
    pack = _fused_plan(wy, wx, step_y)[0]
    tb_splits = _tb_ens_splits(wy, wx, step_x, n_cols)
    if tb_splits:
        # every 50%-overlap square config with a VMEM plan (incl. the
        # reference's shipped 16/26 px, the 32/64 px staples, and col-split
        # oversize grids — see _tb_ens_splits)
        # runs the tileband ensemble kernel: the per-pair tileband pipeline
        # minus its u/v stencil stage, with a VMEM-resident packed corr-sum
        # over a (strips, pairs) grid and one frame slab DMA per pair. (An
        # earlier round-2-era packed-accumulator variant measured 10x slower
        # — it lacked bband batching, the batched assemble, and the bf16
        # 2-pass gather matmuls; this one shares all of the per-pair
        # kernel's round-3 machinery.)
        # share ladder: forward-spectra cache on (the cache costs ~2 extra
        # mt-plane arrays; _tb_bband's share-aware budget accounts for it),
        # halving bband on scoped-VMEM overflow, then the unshared kernel
        share_plan = [True, False] if share_fwd is None else [bool(share_fwd)]
        tb_failed = None
        for tb_share in share_plan:
            bband = _tb_bband(wx, -(-n_cols // tb_splits), share=tb_share)
            while True:
                try:
                    out = _piv_ensemble_tb_chunks(
                        imgs, (wy, wx), (step_y, step_x), n_rows, n_cols,
                        float(corr_min), float(s2n_min), bool(interpret), bband,
                        tb_share, tb_splits,
                    )
                    _route(
                        "piv_ensemble_fused",
                        "tileband" if tb_splits == 1 else "tileband_colsplit",
                    )
                    return out
                except Exception as e:
                    if not _recoverable(e):
                        raise  # programming error, never a fallback condition
                    msg = str(e).lower()
                    # match only the scoped-VMEM overflow, not every message
                    # that prints a "memory space vmem" block spec
                    vmem_over = "vmem" in msg and any(
                        t in msg for t in ("exceed", "limit", "alloc", "scoped")
                    )
                    if vmem_over and bband > 1:
                        bband //= 2
                        continue
                    if "resource_exhausted" in msg or "out of memory" in msg:
                        raise  # engine chunk backoff handles device OOM
                    tb_failed = e
                    break
        if tb_failed is not None:
            _fallback("piv_ensemble_fused", "sliced", tb_failed, "tileband ensemble kernel")
    # share-ladder: auto (cache forward spectra if they fit) -> no-share on a
    # scoped-VMEM overflow (the host-side fit model can be wrong) -> XLA scan
    attempts = [share_fwd] if share_fwd is not None else [None, False]
    last_err = None
    for i_att, share in enumerate(attempts):
        try:
            out = _piv_ensemble_fused_jit(
                imgs, (wy, wx), (step_y, step_x), n_rows, n_cols,
                float(corr_min), float(s2n_min), bool(interpret), share,
            )
            _route("piv_ensemble_fused", "sliced")
            return out
        except Exception as e:
            if not _recoverable(e):
                raise  # programming error, never a fallback condition
            last_err = e
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
                raise  # engine chunk backoff handles device OOM; XLA needs MORE
            if "vmem" in msg.lower() and i_att + 1 < len(attempts):
                continue
            break
    # degrade to the slower-but-correct XLA scan on any Pallas failure
    # (strict mode: an error)
    _fallback("piv_ensemble_fused", "xla_scan", last_err, "fused ensemble kernel")
    return piv_ops.piv_ensemble_scan(
        imgs, dim_size, sas, overlap, n_rows, n_cols, corr_min, s2n_min, signal_threshold
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _piv_ensemble_fused_jit(
    imgs, sas, steps, n_rows, n_cols, corr_min, s2n_min, interpret, share_fwd=None
):
    wy, wx = sas
    step_y, step_x = steps
    n_pairs = imgs.shape[0] - 1
    n_groups = -(-n_pairs // _ENS_GROUP)
    cy, sy = (jnp.asarray(m) for m in _dft_mats(wy))
    cx, sx = (jnp.asarray(m) for m in _dft_mats(wx))
    pack = _fused_plan(wy, wx, step_y)[0]
    pm = jnp.asarray(_packed_mats(wy, wx, pack))
    # buffer height: the exact band for aligned steps; alignment slack (the
    # DMA starts at the aligned-down row, up to 7 rows early) for odd steps
    buf_h = -(-wy // 8) * 8 if step_y % 8 == 0 else -(-(wy + 7) // 8) * 8
    # the band DMA requires the lane (width) extent be a multiple of the
    # 128-lane tiling, and the last band's buffer may read past the frame
    # bottom; pad on the host (real windows never read the padding)
    w_img = imgs.shape[-1]
    pad_w = (-w_img) % 128
    pad_h = max((n_rows - 1) * step_y + buf_h - imgs.shape[-2], 0)
    if pad_w or pad_h:
        imgs = jnp.pad(imgs, ((0, 0), (0, pad_h), (0, pad_w)))
    w_img = imgs.shape[-1]
    frames = imgs.astype(jnp.float32)

    # VMEM budget for per-chunk temporaries: the resident corr-sum block,
    # the 3 rotating band buffers and the matrix stack all live alongside
    # them (measured ~500KB of temporaries per chunk column at 64px)
    resident = (
        n_cols * (-(-wy // 8) * 8) * (-(-wx // 128) * 128) * 4
        + 3 * buf_h * w_img * 4
        + (8 * (pack * wy) * (pack * wx) * 4)
        + (1 << 20)
    )
    budget = (15 << 20) - resident
    g = pack * pack
    # shared-forward spectra cache: two full-band sets of (re, im) planes —
    # packed tiles when pack > 1, lane-padded planes otherwise
    if pack > 1:
        cache_bytes = 2 * 2 * (-(-n_cols // g)) * (pack * wy) * (pack * wx) * 4
    else:
        cache_bytes = 2 * 2 * n_cols * wy * (-(-wx // 128) * 128) * 4
    # ~500KB of temporaries per chunk column at 64px, scaled by window area
    per_win = max((500 << 10) * (wy * (-(-wx // 128) * 128)) // (64 * 128), 32 << 10)
    if share_fwd is None:
        # auto: share when the cache still leaves a useful chunk width
        share_fwd = budget - cache_bytes >= 8 * per_win
    if share_fwd:
        budget -= cache_bytes
    col_chunk = max(int(budget // per_win), 4)
    col_chunk = max((col_chunk // g) * g, g) if g > 1 else min(col_chunk, 24)
    col_chunk = min(col_chunk, -(-n_cols // g) * g if g > 1 else n_cols)
    kernel = functools.partial(
        _ens_kernel, wy=wy, wx=wx, step_y=step_y, step_x=step_x, n_cols=n_cols,
        n_pairs=n_pairs, corr_min=corr_min, s2n_min=s2n_min, pack=pack,
        col_chunk=col_chunk, buf_h=buf_h, share_fwd=bool(share_fwd),
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_rows, n_cols, wy, wx), jnp.float32),  # corr_sum
        jax.ShapeDtypeStruct((n_rows, _ENS_GROUP, n_cols), jnp.float32),  # count rows
        jax.ShapeDtypeStruct((n_rows, n_groups * _ENS_GROUP, n_cols), jnp.float32),  # cmax
        jax.ShapeDtypeStruct((n_rows, n_groups * _ENS_GROUP, n_cols), jnp.float32),  # s2n
    ]
    mat_spec = lambda n: pl.BlockSpec((n, n), lambda b, g: (0, 0), memory_space=pltpu.VMEM)
    corr_sum, count_rows, cmax, s2n = pl.pallas_call(
        kernel,
        grid=(n_rows, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            mat_spec(wy),
            mat_spec(wy),
            mat_spec(wx),
            mat_spec(wx),
            pl.BlockSpec(
                (8, pack * wy, pack * wx), lambda b, g: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, n_cols, wy, wx), lambda b, g: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ENS_GROUP, n_cols), lambda b, g: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ENS_GROUP, n_cols), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ENS_GROUP, n_cols), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, buf_h, w_img), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(frames, cy, sy, cx, sx, pm)
    corr_sum = corr_sum.reshape(n_rows * n_cols, wy, wx)
    corr_count = count_rows.sum(axis=1).reshape(n_rows * n_cols)
    cmax = jnp.moveaxis(cmax, 1, 0)[:n_pairs]  # [n_pairs, n_rows, n_cols]
    s2n = jnp.moveaxis(s2n, 1, 0)[:n_pairs]
    return corr_sum, corr_count, cmax, s2n
