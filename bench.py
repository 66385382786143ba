"""Benchmark: PIV frame-pairs/sec/chip at 64x64-window correlation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): frame-pairs/sec/chip at 64x64-window PIV
on 1080p-scale frames. The reference publishes no absolute numbers
(BASELINE.md "published": {}). ``vs_baseline`` is the round-over-round
contract: this run's value over the recorded round-2 value of the SAME
metric on the same hardware (BENCH_r02.json: 754.34 pairs/s), so 1.0 means
"held round-2 performance" and >1.0 means a regression-free improvement.
(The former 10x-numpy-proxy denominator swung 4x between rounds on an
identical kernel from host contention and was dropped; achieved fp32
TFLOP/s is the absolute accounting.)

Timing notes: on the tunneled TPU backend, ``block_until_ready`` resolves on
the remote handle without waiting for execution, so each rep materializes a
scalar reduction of all outputs — this forces full device computation while
moving only bytes across the tunnel.
"""

import json
import time

import numpy as np

# recorded same-metric value from the previous round (BENCH_r02.json)
ROUND2_PAIRS_PER_SEC = 754.34


def _bench_config(window: int, h: int = 1088, w: int = 1920, n_frames: int = 65):
    """(pairs/s, useful fp32 TFLOP/s) for one window size on the live backend."""
    import jax
    import jax.numpy as jnp

    from pyorc_tpu.ops import piv, piv_pallas, windows

    sas = (window, window)
    overlap = (window // 2, window // 2)
    n_rows, n_cols = windows.get_field_shape((h, w), sas, overlap)
    n_pairs = n_frames - 1
    use_fused = jax.default_backend() not in ("cpu",)

    def step(frames):
        fn = piv_pallas.piv_pairs_fused if use_fused else piv.piv_pairs
        u, v, corr_max, s2n = fn(frames, (h, w), sas, overlap, n_rows, n_cols)
        # scalar checksum: forces all outputs to be computed, transfers 4 bytes
        return float(jnp.nansum(u) + jnp.nansum(v) + jnp.nansum(corr_max) + jnp.nansum(s2n))

    # synthesize frames on-device: measures kernel throughput, not the
    # host->device link (which on the tunneled dev backend is very slow).
    # 64-pair batches amortize the ~45ms fixed dispatch latency of a
    # tunneled call — smaller batches are call-overhead-dominated.
    key = jax.random.PRNGKey(0)
    dev_imgs = jax.block_until_ready(jax.random.uniform(key, (n_frames, h, w), jnp.float32, 0, 255))
    _ = step(dev_imgs)  # warmup/compile
    # best-of-8: the shared dev TPU box has multi-x run-to-run contention
    # noise (headline spread measured 1073-1121 across same-code runs); the
    # fastest rep reflects the kernel's actual capability
    dt = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        _ = step(dev_imgs)
        dt = min(dt, time.perf_counter() - t0)
    pairs_per_sec = n_pairs / dt
    # USEFUL matmul-DFT work only (18 stages of 2*w^3 per window = 36*w^3),
    # excluding block-diagonal packing redundancy — an MFU-style accounting
    flops_per_pair = n_rows * n_cols * 36 * window**3
    tflops = pairs_per_sec * flops_per_pair / 1e12
    return pairs_per_sec, tflops


def _peak_gap_strips(imgs, dim_size, sas, overlap, n_rows, n_cols):
    """Top1-minus-top2 correlation gap per window, [n_pairs, n_rows, n_cols].

    Processed in the same row-band strips as ``piv.piv_pairs_strips`` so the
    16 px configuration stays under the correlation-plane memory budget."""
    import functools

    import jax
    import jax.numpy as jnp

    from pyorc_tpu.ops import piv
    from pyorc_tpu.ops import windows as win

    @functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
    def gap_jit(frames, dim_size, sas, overlap, nb):
        corr = piv._cross_corr_jit(
            frames, dim_size, sas, overlap, False, None, piv.default_corr_method()
        )
        flat = corr.reshape(corr.shape[0], corr.shape[1], -1)
        top2 = jax.lax.top_k(flat, 2)[0]
        return (top2[..., 0] - top2[..., 1]).reshape(-1, nb, n_cols)

    imgs = jnp.asarray(imgs)
    n_pairs = imgs.shape[0] - 1
    row0, _ = win.get_window_starts(dim_size, sas, overlap)
    step_y = piv._strided_axis_starts(np.asarray(row0), sas[0])
    total_bytes = n_pairs * n_rows * n_cols * sas[0] * sas[1] * 4
    if step_y is None or total_bytes <= piv._STRIP_CORR_BYTES:
        return np.asarray(gap_jit(imgs, dim_size, sas, overlap, n_rows))
    rows_per_strip = max(1, piv._STRIP_CORR_BYTES // (n_pairs * n_cols * sas[0] * sas[1] * 4))
    parts = []
    for r0 in range(0, n_rows, rows_per_strip):
        r1 = min(r0 + rows_per_strip, n_rows)
        nb = r1 - r0
        top = int(row0[r0])
        h_band = (nb - 1) * step_y + sas[0]
        band = imgs[:, top : top + h_band]
        parts.append(np.asarray(gap_jit(band, (h_band, dim_size[1]), sas, overlap, nb)))
    return np.concatenate(parts, axis=1)


# a window whose top-2 correlation peaks are closer than this is ambiguous:
# the fused kernel's ~1e-3 correlation error (2-pass bf16-split matmuls over
# 18 chained stages) can legitimately flip the argmax there. Measured (r4
# diagnostics): every >0.5 px disagreement at 16 px sat at gap <= 0.0019 on
# cmax of 0.36-0.81; confident peaks (gap above this) always agree.
_PEAK_GAP_CONFIDENT = 5e-3


def _bench_ensemble(window: int, h: int = 1088, w: int = 1920, n_frames: int = 65):
    """pairs/s for the ensemble-accumulation path (the reference's long-video
    production configuration, pyorc/velocimetry/ffpiv.py:182-376) at one
    window size. <32 px routes to the tileband ensemble kernel; >=32 px to
    the sliced VMEM-accumulator kernel."""
    import jax
    import jax.numpy as jnp

    from pyorc_tpu.ops import piv_pallas, windows

    sas = (window, window)
    overlap = (window // 2, window // 2)
    n_rows, n_cols = windows.get_field_shape((h, w), sas, overlap)
    n_pairs = n_frames - 1

    def step(frames):
        cs, cc, cmax, s2n = piv_pallas.piv_ensemble_fused(
            frames, (h, w), sas, overlap, n_rows, n_cols, 0.2, 3.0, None
        )
        return float(jnp.nansum(cmax) + jnp.nansum(cs[:2]) + jnp.nansum(cc[:9]))

    key = jax.random.PRNGKey(0)
    frames = jax.block_until_ready(jax.random.uniform(key, (n_frames, h, w), jnp.float32, 0, 255))
    _ = step(frames)
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = step(frames)
        dt = min(dt, time.perf_counter() - t0)
    return n_pairs / dt


def _parity_config(window: int, h: int = 1088, w: int = 1920):
    """On-chip fused-vs-XLA displacement agreement on particle imagery with a
    known sub-pixel shift. The XLA reference runs the strip-chunked pipeline
    (the monolithic form compile-OOMs at 16 px).

    Returns a dict: q95/max |d| in px over all windows, the fraction of
    windows disagreeing by >0.5 px, and ``cond_max`` — the max |d| over
    windows whose top-2 peak gap exceeds ``_PEAK_GAP_CONFIDENT`` (i.e. the
    peak is unambiguous). ``max`` may be large when two near-equal peaks tie
    (both paths are then valid estimates); ``cond_max`` is the estimator
    contract and must stay sub-pixel."""
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from pyorc_tpu.ops import piv, piv_pallas, windows

    rng = np.random.default_rng(7)
    img = np.zeros((h, w), np.float32)
    n_p = h * w // 40
    ys = rng.integers(0, h, n_p)
    xs = rng.integers(0, w, n_p)
    img[ys, xs] = rng.uniform(100, 255, n_p)
    img = gaussian_filter(img, 1.5, mode="wrap")
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    shifted = np.real(np.fft.ifft2(np.fft.fft2(img) * np.exp(-2j * np.pi * (fy * -1.2 + fx * 2.4))))
    imgs = jnp.asarray(np.stack([img, shifted]).astype(np.float32))

    sas = (window, window)
    overlap = (window // 2, window // 2)
    n_rows, n_cols = windows.get_field_shape((h, w), sas, overlap)
    u_f, v_f, *_ = piv_pallas.piv_pairs_fused(imgs, (h, w), sas, overlap, n_rows, n_cols)
    u_x, v_x, *_ = piv.piv_pairs_strips(imgs, (h, w), sas, overlap, n_rows, n_cols)
    d = np.hypot(np.asarray(u_f) - np.asarray(u_x), np.asarray(v_f) - np.asarray(v_x))
    gap = _peak_gap_strips(imgs, (h, w), sas, overlap, n_rows, n_cols)
    ok = ~np.isnan(d)
    d_ok = d[ok]
    confident = ok & (gap > _PEAK_GAP_CONFIDENT)
    return {
        "q95": round(float(np.quantile(d_ok, 0.95)), 4),
        "max": round(float(d_ok.max()), 4),
        "frac_gt_0.5px": round(float((d_ok > 0.5).mean()), 6),
        "cond_max": round(float(d[confident].max()), 4),
    }


def _bench_chain_4k(window: int = 64, n_frames: int = 33):
    """Measured 4K normalize+orthorectify+ensemble-PIV chain, pairs/s on-chip.

    Runs the SAME ops the lazy frame chain dispatches per chunk — since the
    upload-crop landed that is flt.normalize_with_stats on bbox-cropped
    frames (extrema host-supplied) -> ortho.project_batch with crop-rebased
    maps -> piv_ensemble_fused — on device-synthesized uint8 frames with the
    bench_e2e camera config's real ortho index maps, so the number is the
    chip-bound rate of the whole BASELINE workload minus decode.
    """
    import jax
    import jax.numpy as jnp

    from bench_e2e import H_IMG, W_IMG, nadir_config
    from pyorc_tpu.ops import filters as flt
    from pyorc_tpu.ops import ortho as ortho_ops
    from pyorc_tpu.ops import piv_pallas, windows

    cc = nadir_config()
    shape = cc.shape
    y = np.flipud(np.linspace(cc.resolution / 2, cc.resolution * (shape[0] - 0.5), shape[0]))
    x = np.linspace(cc.resolution / 2, cc.resolution * (shape[1] - 0.5), shape[1])
    maps = ortho_ops.build_ortho_maps(cc, x, y, 0.0, reducer="mean")
    r0, r1, c0, c1 = ortho_ops.source_bbox(maps)
    maps = ortho_ops.crop_maps(maps, r0, c0, r1 - r0, c1 - c0)
    oh, ow = maps.shape_out
    sas = (window, window)
    overlap = (window // 2, window // 2)
    n_rows, n_cols = windows.get_field_shape((oh, ow), sas, overlap)

    key = jax.random.PRNGKey(3)
    frames = jax.block_until_ready(
        jax.random.randint(key, (n_frames, r1 - r0, c1 - c0), 0, 255, jnp.int32).astype(jnp.uint8)
    )
    mean_img = jnp.zeros((r1 - r0, c1 - c0), jnp.float32) + 127.0
    fmin = jnp.full((n_frames, 1, 1), -127.0, jnp.float32)
    fmax = jnp.full((n_frames, 1, 1), 128.0, jnp.float32)

    def chain(f):
        f = flt.normalize_with_stats(f, mean_img, fmin, fmax)
        f = ortho_ops.project_batch(f, maps)
        cs, cnt, cmax, s2n = piv_pallas.piv_ensemble_fused(
            f, (oh, ow), sas, overlap, n_rows, n_cols, 0.2, 3.0, None
        )
        return float(jnp.nansum(cmax) + jnp.nansum(cs[:2]))

    _ = chain(frames)  # compile
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = chain(frames)
        dt = min(dt, time.perf_counter() - t0)
    return (n_frames - 1) / dt


def main():
    import sys

    h, w = 1088, 1920
    pairs_per_sec, tflops = _bench_config(64, h, w)

    out = {
        "metric": "piv_frame_pairs_per_sec_per_chip_64x64_1080p",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / ROUND2_PAIRS_PER_SEC, 3),
        "fp32_tflops": round(tflops, 2),
    }
    if "--full" in sys.argv:
        # per-config table over the reference's real window sizes
        # (ngwerere window_size 25 -> 26 px, geul 15 -> 16 px)
        out["configs"] = {
            f"{win}px_1080p": {"pairs_per_sec": round(p, 1), "fp32_tflops": round(t, 2)}
            for win in (16, 26, 32)
            for p, t in [_bench_config(win, h, w)]
        }
        # ensemble-path rates at every window size (the long-video production
        # configuration; must stay >= the per-pair rates at 16/26 px)
        from pyorc_tpu.ops import piv_pallas

        def _ens(win):
            p = _bench_ensemble(win, h, w)
            # record which kernel actually ran: a silent downgrade to a
            # slower variant must be visible in the committed artifact
            return {"pairs_per_sec": round(p, 1),
                    "route": piv_pallas.KERNEL_ROUTE.get("piv_ensemble_fused")}

        out["ensemble"] = {f"{win}px_1080p": _ens(win) for win in (16, 26, 32, 64)}
        # on-chip fused-vs-XLA displacement parity (recorded artifact):
        # cond_max (unambiguous-peak agreement) is the contract; max may be
        # inflated by near-tie double peaks where both estimates are valid
        out["parity_px"] = {f"{win}px": _parity_config(win, h, w) for win in (16, 26, 32)}
    if "--chain" in sys.argv or "--full" in sys.argv:
        out["chain_4k_pairs_per_sec"] = round(_bench_chain_4k(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
