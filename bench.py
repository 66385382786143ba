"""Benchmark: PIV frame-pairs/sec/chip at 64x64-window correlation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): frame-pairs/sec/chip at 64x64-window PIV
on 1080p-scale frames. The reference publishes no absolute numbers
(BASELINE.md "published": {}), so vs_baseline compares against a same-
algorithm numpy implementation on this host scaled x10 — the reference's
production engine (numba) is documented as "almost an order of magnitude"
faster than its numpy engine (reference pyorc/api/frames.py:136-138), so
x10-numpy is the bar for beating the reference CPU engine.

Timing notes: on the tunneled TPU backend, ``block_until_ready`` resolves on
the remote handle without waiting for execution, so each rep materializes a
scalar reduction of all outputs — this forces full device computation while
moving only bytes across the tunnel.
"""

import json
import time

import numpy as np


def run_numpy_reference(imgs, sas, overlap):
    """Plain numpy same-algorithm implementation (baseline proxy). Returns seconds/pair."""
    from pyorc_tpu.ops import windows as win

    row0, col0 = win.get_window_starts(imgs.shape[-2:], sas, overlap)
    wy, wx = sas
    t0 = time.perf_counter()
    iy = (row0[:, None] + np.arange(wy)).ravel()
    ix = (col0[:, None] + np.arange(wx)).ravel()
    w = imgs[:, iy][:, :, ix].reshape(imgs.shape[0], len(row0), wy, len(col0), wx)
    w = np.moveaxis(w, 3, 2).reshape(imgs.shape[0], -1, wy, wx).astype(np.float32)
    a = w[:-1] - w[:-1].mean(axis=(-2, -1), keepdims=True)
    b = w[1:] - w[1:].mean(axis=(-2, -1), keepdims=True)
    fa = np.fft.rfft2(a)
    fb = np.fft.rfft2(b)
    corr = np.fft.irfft2(np.conj(fa) * fb, s=(wy, wx))
    corr = np.fft.fftshift(corr, axes=(-2, -1))
    sa = a.std(axis=(-2, -1))
    sb = b.std(axis=(-2, -1))
    corr = np.clip(corr / np.maximum(wy * wx * sa * sb, 1e-10)[..., None, None], 0, None)
    peak = corr.reshape(corr.shape[0], corr.shape[1], -1).argmax(axis=-1)
    _ = peak // wx
    _ = peak % wx
    return (time.perf_counter() - t0) / (imgs.shape[0] - 1)


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
    # best-of-5: the shared dev TPU box has multi-x run-to-run contention
    # noise; the fastest rep reflects the kernel's actual capability
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = step(dev_imgs)
        dt = min(dt, time.perf_counter() - t0)
    pairs_per_sec = n_pairs / dt
    # USEFUL matmul-DFT work only (18 stages of 2*w^3 per window = 36*w^3),
    # excluding block-diagonal packing redundancy — an MFU-style accounting
    flops_per_pair = n_rows * n_cols * 36 * window**3
    tflops = pairs_per_sec * flops_per_pair / 1e12
    return pairs_per_sec, tflops


def main():
    import sys

    h, w = 1088, 1920
    pairs_per_sec, tflops = _bench_config(64, h, w)

    # numpy baseline proxy on a small slice (linear in pairs)
    rng = np.random.default_rng(0)
    imgs_np = rng.uniform(0, 255, size=(5, h, w)).astype(np.float32)
    sec_per_pair_numpy = run_numpy_reference(imgs_np, (64, 64), (32, 32))
    baseline_pairs_per_sec = (1.0 / sec_per_pair_numpy) * 10  # numba ~ 10x numpy

    out = {
        "metric": "piv_frame_pairs_per_sec_per_chip_64x64_1080p",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / baseline_pairs_per_sec, 3),
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
