"""Video ingestion + frames filters + projection + full E2E PIV on the geul video."""

import numpy as np
import pytest

import pyorc_tpu

GEUL_MP4 = "/root/reference/examples/geul/dk_control.mp4"
GEUL_CFG = "/root/reference/examples/geul/dk_cam_config.json"


@pytest.fixture(scope="module")
def vid():
    return pyorc_tpu.Video(
        GEUL_MP4, camera_config=GEUL_CFG, start_frame=0, end_frame=6, h_a=92.36, progress=False
    )


@pytest.fixture(scope="module")
def frames(vid):
    return vid.get_frames()


def test_video_metadata(vid):
    assert vid.fps == 10.0
    assert vid.height == 1080 and vid.width == 1920
    assert len(vid.frame_number) == 7  # end_frame is inclusive (reference behaviour)


def test_video_invalid_inputs():
    with pytest.raises(IOError):
        pyorc_tpu.Video("/nonexistent.mp4")
    with pytest.raises(ValueError):
        pyorc_tpu.Video(GEUL_MP4, start_frame=5, end_frame=2, progress=False)


def test_get_frame(vid):
    f = vid.get_frame(0, method="grayscale")
    assert f.shape == (1080, 1920)
    assert f.dtype == np.uint8
    rgb = vid.get_frame(0, method="rgb")
    assert rgb.shape == (1080, 1920, 3)


def test_get_frames_lazy(frames):
    from pyorc_tpu.api.video import LazyFrames

    assert frames.dims == ("time", "y", "x")
    assert isinstance(frames.data, LazyFrames)
    assert frames.shape == (7, 1080, 1920)
    # y axis flipped (bottom-to-top coordinate convention)
    assert frames["y"].values[0] > frames["y"].values[-1]
    assert "camera_config" in frames.attrs
    # time slicing stays lazy
    sub = frames.isel(time=slice(0, 3))
    assert isinstance(sub.data, LazyFrames)
    assert sub.shape[0] == 3
    # materialization matches chunked decode
    assert np.array_equal(np.asarray(sub.data), np.asarray(frames.data)[:3])


def test_filters(frames):
    f_norm = frames.frames.normalize(samples=2)
    assert f_norm.dtype == np.uint8
    assert f_norm.shape == frames.shape
    f_edge = frames.frames.edge_detect()
    assert f_edge.dtype == np.float32
    f_mm = f_edge.frames.minmax(min=-5, max=5)
    assert float(f_mm.values.max()) <= 5.0
    f_range = frames.frames.range()
    assert f_range.dims == ("y", "x")
    assert f_range.dtype == frames.dtype
    f_smooth = frames.frames.smooth()
    assert f_smooth.dtype == np.float32
    f_diff = frames.frames.time_diff()
    assert f_diff.shape[0] == frames.shape[0] - 1
    f_roll = frames.frames.reduce_rolling(samples=3)
    assert f_roll.dtype == np.uint8


def test_gaussian_matches_cv2(rng):
    """Our separable blur must equal cv2.GaussianBlur bit-for-bit-ish."""
    import cv2
    import jax

    from pyorc_tpu.ops import filters as flt

    img = rng.uniform(0, 255, size=(64, 96)).astype(np.float32)
    for ksize in (3, 5, 7, 9):
        ours = np.asarray(flt.gaussian_blur(jax.device_put(img[None]), ksize))[0]
        ref = cv2.GaussianBlur(img, (ksize, ksize), 0)
        assert np.allclose(ours, ref, atol=2e-3), f"ksize {ksize}"


def test_project(frames, vid):
    f_proj = frames.frames.project()
    rows, cols = vid.camera_config.shape
    assert f_proj.shape == (7, rows, cols)
    assert f_proj.dtype == frames.dtype
    # projected coordinate rasters attached
    assert f_proj.coords["xs"].dims == ("y", "x")
    assert f_proj.coords["lon"].dims == ("y", "x")
    assert f_proj.frames.is_projected
    # most of the AOI must be filled from the camera (non-zero)
    filled = (f_proj.values[0] > 0).mean()
    assert filled > 0.5


def test_project_resolution_override(frames):
    import copy
    import json

    from pyorc_tpu.api.cameraconfig import get_camera_config

    f_proj = frames.isel(time=slice(0, 2)).frames.project(resolution=0.1)
    cc = get_camera_config(frames.attrs["camera_config"])
    cc.resolution = 0.1
    assert f_proj.shape[1:] == cc.shape
    # the overridden resolution is recorded in the result's camera config
    assert json.loads(f_proj.attrs["camera_config"])["resolution"] == 0.1


def test_e2e_piv(frames):
    """Full slice: video -> normalize -> project -> PIV velocities."""
    f_norm = frames.frames.normalize(samples=2)
    f_proj = f_norm.frames.project()
    piv = f_proj.frames.get_piv()
    assert set(piv.data_vars) == {"v_x", "v_y", "corr", "s2n"}
    assert piv.sizes["time"] == 6
    v = np.hypot(piv["v_x"].values, piv["v_y"].values)
    assert np.isfinite(v).mean() > 0.9
    assert 0.0 < np.nanmedian(v) < 3.0  # plausible river surface speeds
    # coordinates present for all systems
    for c in ("xp", "yp", "xs", "ys", "lon", "lat"):
        assert c in piv.coords
    # encoding set for int16 output
    assert piv.encoding["v_x"]["scale_factor"] == 0.01


def test_e2e_piv_ensemble(frames):
    f_norm = frames.frames.normalize(samples=2)
    f_proj = f_norm.frames.project()
    piv = f_proj.frames.get_piv(ensemble_corr=True, corr_min=0.1, s2n_min=1.3, count_min=0.1)
    assert piv.sizes["time"] == 1
    v = np.hypot(piv["v_x"].values, piv["v_y"].values)
    assert np.isfinite(v).any()


def test_e2e_piv_multipass(frames):
    """passes=2 runs the deformation cascade through the accessor and stays
    consistent with the single-pass field (same grid, similar magnitudes)."""
    import pytest

    f_norm = frames.frames.normalize(samples=2)
    f_proj = f_norm.frames.project()
    piv1 = f_proj.frames.get_piv()
    piv2 = f_proj.frames.get_piv(passes=2)
    assert piv2.sizes == piv1.sizes
    v1 = np.hypot(piv1["v_x"].values, piv1["v_y"].values)
    v2 = np.hypot(piv2["v_x"].values, piv2["v_y"].values)
    assert np.isfinite(v2).mean() > 0.9
    # same flow, refined: medians within 50%
    assert abs(np.nanmedian(v2) - np.nanmedian(v1)) < 0.5 * max(np.nanmedian(v1), 0.1)
    # ensemble + multipass is rejected
    with pytest.raises(ValueError, match="ensemble_corr"):
        f_proj.frames.get_piv(ensemble_corr=True, passes=2)


def test_reference_export_parity():
    """Every name the reference exports at package level resolves here."""
    import pyorc_tpu

    for n in [
        "CameraConfig", "load_camera_config", "get_camera_config", "Video",
        "Frames", "Velocimetry", "Transect", "CrossSection",
        "service", "cli", "sample_data", "project_numpy", "project_cv",
    ]:
        assert getattr(pyorc_tpu, n) is not None


def test_project_numpy_matches_accessor(frames, vid):
    import copy

    import pyorc_tpu

    proj_acc = frames.frames.project()
    cc = copy.deepcopy(frames.frames.camera_config)
    shape = cc.shape
    y = np.flipud(np.linspace(cc.resolution / 2, cc.resolution * (shape[0] - 0.5), shape[0]))
    x = np.linspace(cc.resolution / 2, cc.resolution * (shape[1] - 0.5), shape[1])
    z = cc.get_z_a(vid.h_a)
    proj_fn = pyorc_tpu.project_numpy(frames, cc, x, y, z)
    assert proj_fn.shape == proj_acc.shape
    assert np.array_equal(
        np.asarray(proj_fn.values, dtype=float), np.asarray(proj_acc.values, dtype=float)
    )


def test_ortho_separable_fast_path(rng):
    """Axis-aligned (separable) maps route through the two-slice/two-gather
    fast path and match the generic element-gather bit for bit."""
    import numpy as np

    from pyorc_tpu.ops import ortho as ortho_ops

    H, W, ny, nx = 64, 96, 40, 72
    row_idx = (np.arange(ny) + 11).astype(np.int32)          # arithmetic, step 1
    col_idx = (np.arange(nx) * 1 + 9).astype(np.int32)
    full_idx = (row_idx[:, None].astype(np.int64) * W + col_idx[None, :]).ravel().astype(np.int32)
    maps = ortho_ops.OrthoMaps(
        full_idx=full_idx, src_idx=None, norm_idx=None, counts=None,
        shape_in=(H, W), shape_out=(ny, nx), row_idx=row_idx, col_idx=col_idx,
    )
    frames = rng.integers(0, 255, (3, H, W)).astype(np.uint8)
    fast = np.asarray(ortho_ops.project_batch(frames, maps))
    generic = np.asarray(
        ortho_ops.project_batch(frames, maps._replace(row_idx=None, col_idx=None))
    )
    assert np.array_equal(fast, generic)

    # non-arithmetic indices (irregular subsample) take the two-gather form
    row_irr = np.sort(rng.choice(H, ny, replace=False)).astype(np.int32)
    full_irr = (row_irr[:, None].astype(np.int64) * W + col_idx[None, :]).ravel().astype(np.int32)
    maps_irr = maps._replace(full_idx=full_irr, row_idx=row_irr)
    fast2 = np.asarray(ortho_ops.project_batch(frames, maps_irr))
    gen2 = np.asarray(ortho_ops.project_batch(frames, maps_irr._replace(row_idx=None, col_idx=None)))
    assert np.array_equal(fast2, gen2)
    assert ortho_ops._arith_spec(row_irr) is None
    assert ortho_ops._arith_spec(np.array([4, 6, 8], np.int32)) == (4, 9, 2)


def test_crop_maps_bit_parity(rng):
    """crop_maps + cropped frames reproduce the uncropped projection exactly,
    for both the generic (gather + group-mean) and separable map forms."""
    from pyorc_tpu.ops import ortho as ortho_ops

    H, W, ny, nx = 48, 80, 20, 30
    # generic maps touching a sub-box [10:38, 14:70], with mean groups
    rows = rng.integers(10, 38, ny * nx)
    cols = rng.integers(14, 70, ny * nx)
    full_idx = (rows.astype(np.int64) * W + cols).astype(np.int32)
    n_mean = 17
    src_idx = (
        rng.integers(10, 38, 4 * n_mean).astype(np.int64) * W
        + rng.integers(14, 70, 4 * n_mean)
    ).astype(np.int32)
    norm_idx = np.repeat(np.arange(n_mean, dtype=np.int32), 4)
    counts = np.full(n_mean, 4.0, np.float32)
    # some cells read the mean block, one reads the zero sentinel
    full_idx[: n_mean] = H * W + 1 + np.arange(n_mean, dtype=np.int32)
    full_idx[n_mean] = H * W
    maps = ortho_ops.OrthoMaps(
        full_idx=full_idx, src_idx=src_idx, norm_idx=norm_idx, counts=counts,
        shape_in=(H, W), shape_out=(ny, nx),
    )
    frames = rng.integers(0, 255, (3, H, W)).astype(np.uint8)
    box = ortho_ops.source_bbox(maps)
    assert box is not None
    r0, r1, c0, c1 = box
    assert 0 < r0 and r1 <= 38 and 0 < c0 and c1 <= 70
    cmaps = ortho_ops.crop_maps(maps, r0, c0, r1 - r0, c1 - c0)
    full = np.asarray(ortho_ops.project_batch(frames, maps))
    cropped = np.asarray(
        ortho_ops.project_batch(np.ascontiguousarray(frames[:, r0:r1, c0:c1]), cmaps)
    )
    assert np.array_equal(full, cropped)

    # separable maps
    row_idx = (np.arange(ny) + 7).astype(np.int32)
    col_idx = (np.arange(nx) * 2 + 5).astype(np.int32)
    fi = (row_idx[:, None].astype(np.int64) * W + col_idx[None, :]).ravel().astype(np.int32)
    smaps = ortho_ops.OrthoMaps(
        full_idx=fi, src_idx=None, norm_idx=None, counts=None,
        shape_in=(H, W), shape_out=(ny, nx), row_idx=row_idx, col_idx=col_idx,
    )
    sb = ortho_ops.source_bbox(smaps)
    sc = ortho_ops.crop_maps(smaps, sb[0], sb[2], sb[1] - sb[0], sb[3] - sb[2])
    assert np.array_equal(
        np.asarray(ortho_ops.project_batch(frames, smaps)),
        np.asarray(
            ortho_ops.project_batch(
                np.ascontiguousarray(frames[:, sb[0] : sb[1], sb[2] : sb[3]]), sc
            )
        ),
    )


def test_upload_crop_chain_parity(frames, vid):
    """The lazy decode -> filters -> project chain with the host-side upload
    crop must match the eager (uncropped, in-memory) path bit for bit —
    including when the frame's (frame - mean) extrema fall OUTSIDE the crop
    box (normalize's global rescale; the 7-frame/samples=4 configuration on
    the geul video has out-of-box extrema), and with stencil filters whose
    halo pads the crop box."""
    from pyorc_tpu.api.video import LazyFrames

    assert isinstance(frames.data, LazyFrames)
    lazy = frames.frames.normalize(samples=4).frames.project()
    # the crop actually engaged: the chain's first op slices the decode
    # batch and carries normalize's full-frame stats alongside
    ops = lazy.data._ops
    assert len(ops) == 3, "expected [crop, normalize, project]"
    probe = np.zeros((1, 1080, 1920), np.uint8)
    cropped, aux = ops[0](probe)
    assert cropped.shape[1:] != (1080, 1920), "crop op did not shrink the frame"
    assert aux is not None

    eager_frames = frames.frames._with_data(np.asarray(frames.data))
    eager = eager_frames.frames.normalize(samples=4).frames.project()
    assert np.array_equal(np.asarray(lazy.values), np.asarray(eager.values))

    lazy2 = frames.frames.normalize(samples=4).frames.edge_detect().frames.project()
    assert len(lazy2.data._ops) == 4, "expected [crop, normalize, edge_detect, project]"
    eager2 = eager_frames.frames.normalize(samples=4).frames.edge_detect().frames.project()
    assert np.array_equal(np.asarray(lazy2.values), np.asarray(eager2.values))


def test_normalize_rebase_uses_full_frame_extrema(frames):
    """The rebased normalize op must rescale with extrema of the FULL frame
    (host-computed before the crop), not of the cropped view — cropped-view
    extrema would change every output pixel."""
    nm = frames.frames.normalize(samples=4)
    op = nm.data._ops[-1]
    assert op._pyorc_host_stats is not None and op._pyorc_rebase is not None

    batch = np.asarray(frames.data[:3])
    H, W = batch.shape[1:]
    r0, r1, c0, c1 = H // 3, 2 * H // 3, W // 3, 2 * W // 3
    aux = op._pyorc_host_stats(batch)

    # precondition: the extrema really lie outside the central box, so
    # full-frame and cropped stats are distinguishable
    ti = round(frames.shape[0] / 4)
    mean_h = np.asarray(frames.data[::ti]).astype(np.float32).mean(axis=0).astype(np.float32)
    red_c = batch.astype(np.float32)[:, r0:r1, c0:c1] - mean_h[r0:r1, c0:c1]
    cmin = red_c.min(axis=(1, 2), keepdims=True)
    cmax = red_c.max(axis=(1, 2), keepdims=True)
    assert (np.asarray(aux[0]) != cmin).any() or (np.asarray(aux[1]) != cmax).any()

    reb = op._pyorc_rebase(r0, r1, c0, c1)
    out_full = np.asarray(op(batch))[:, r0:r1, c0:c1]
    out_crop = np.asarray(reb(np.ascontiguousarray(batch[:, r0:r1, c0:c1]), aux))
    assert np.array_equal(out_full, out_crop)


def test_to_geotiff_roundtrip(frames, tmp_path):
    """Projected frames export to GeoTIFF (single + batch) with correct
    georeferencing tags; unprojected frames refuse (reference
    tests/test_frames.py:169-209)."""
    f_proj = frames.frames.project()
    fn = str(tmp_path / "frame.tif")
    f_proj.frames.to_geotiff(fn, frame=0)
    raw = open(fn, "rb").read()
    assert raw[:2] in (b"II", b"MM") and len(raw) > 1000
    # ModelTiepoint/ModelPixelScale GeoTIFF tags present
    assert raw.find((33922).to_bytes(2, "little")) > 0
    assert raw.find((33550).to_bytes(2, "little")) > 0

    fns = f_proj.frames.to_geotiffs(str(tmp_path / "seq"), end_frame=4, stride=2, progress_bar=False)
    assert len(fns) == 2
    assert all(open(f, "rb").read()[:2] in (b"II", b"MM") for f in fns)

    with pytest.raises(AssertionError, match="projected"):
        frames.frames.to_geotiff(str(tmp_path / "nope.tif"))
