"""STIV: synthetic advected-texture oracle + accessor wiring.

Green-field capability (the reference lists STIV as wished-for,
reference README.md:22, but does not implement it).
"""

import numpy as np
import pytest

from pyorc_tpu.ops import stiv


@pytest.fixture(scope="module")
def advect():
    from scipy.ndimage import gaussian_filter, map_coordinates

    rng = np.random.default_rng(3)
    h, w, t_len = 128, 256, 40
    base = gaussian_filter(rng.normal(size=(h, w * 2)), 2.0)
    yy, xg = np.mgrid[0:h, 0:w].astype(float)

    def make(vpx):
        frames = np.zeros((t_len, h, w), np.float32)
        for t in range(t_len):
            frames[t] = map_coordinates(base, [yy, xg - vpx * t + w / 2], order=1, mode="wrap")
        return frames

    return make


@pytest.mark.parametrize("vpx", [0.8, -1.2, 1.5])
def test_sti_velocity_recovers_advection(advect, vpx):
    frames = advect(vpx)
    centers = np.array([[128.0, 40.0], [128.0, 64.0], [128.0, 90.0]])
    rows, cols = stiv.stiv_lines(centers, angle=0.0, length=200, n_samples=200)
    sti = stiv.build_sti(frames, rows, cols)
    v, coh = stiv.sti_velocity(sti, 200 / 199, dt=1.0)
    assert np.allclose(np.asarray(v), vpx, atol=0.05 * max(abs(vpx), 1))
    assert np.all(np.asarray(coh) > 0.5)


def test_sti_velocity_no_texture(advect):
    frames = advect(0.0)  # static scene: background removal leaves nothing
    rows, cols = stiv.stiv_lines(np.array([[128.0, 64.0]]), 0.0, 200, 200)
    sti = stiv.build_sti(frames, rows, cols)
    v, coh = stiv.sti_velocity(sti, 1.0, 1.0)
    assert np.isnan(np.asarray(v)).all()
    assert np.all(np.asarray(coh) < 0.01)  # fp32 resampling noise, not signal


def test_sti_profile_mode(advect):
    frames = advect(1.2)
    rows, cols = stiv.stiv_lines(np.array([[128.0, 64.0]]), 0.0, 200, 200)
    sti = stiv.build_sti(frames, rows, cols)
    v, coh = stiv.sti_velocity(sti, 200 / 199, 1.0, window=31)
    v = np.asarray(v)
    assert v.shape == (1, 200)
    interior = v[0, 20:-20]
    assert abs(np.nanmedian(interior) - 1.2) < 0.08
    assert np.nanstd(interior) < 0.1


def test_sti_line_geometry():
    rows, cols = stiv.stiv_lines(np.array([[10.0, 20.0]]), np.pi / 2, 8.0, 5)
    # angle pi/2 (toward +row): columns constant, rows span center +-4
    assert np.allclose(cols[0], 10.0, atol=1e-5)
    assert np.allclose(rows[0], [16, 18, 20, 22, 24])


def test_get_stiv_accessor(advect):
    """Accessor path: a synthetic projected frames DataArray with known flow."""
    import json

    from pyorc_tpu import ndx

    frames_np = advect(1.0)  # 1 px/frame toward +x
    t_len, h, w = frames_np.shape
    res = 0.02
    fps = 25.0
    x = (np.arange(w) + 0.5) * res
    y = ((np.arange(h) + 0.5) * res)[::-1]
    time = np.arange(t_len) / fps
    cc = {"height": h, "width": w, "resolution": res, "window_size": 32}
    xs, ys = np.meshgrid(x, y)
    da = ndx.DataArray(
        frames_np,
        dims=("time", "y", "x"),
        coords={"time": time, "y": y, "x": x, "xs": (("y", "x"), xs), "ys": (("y", "x"), ys)},
        attrs={"camera_config": json.dumps(cc), "camera_shape": str([h, w])},
        name="frames",
    )
    centers = np.array([[w * res / 2, h * res / 2]])
    ds = da.frames.get_stiv(centers, angle=0.0, length=3.0)
    v = float(ds["v"].values[0])
    # 1 px/frame = res * fps m/s toward +x
    assert abs(v - res * fps) < 0.05 * res * fps
    assert float(ds["coherence"].values[0]) > 0.5
    # flow reversed when measured along the opposite direction
    ds_rev = da.frames.get_stiv(centers, angle=np.pi, length=3.0)
    assert abs(float(ds_rev["v"].values[0]) + res * fps) < 0.05 * res * fps


def test_get_stiv_min_coherence(advect):
    import json

    from pyorc_tpu import ndx

    frames_np = advect(0.0)  # static: coherence ~0 everywhere
    t_len, h, w = frames_np.shape
    res, fps = 0.02, 25.0
    x = (np.arange(w) + 0.5) * res
    y = ((np.arange(h) + 0.5) * res)[::-1]
    xs, ys = np.meshgrid(x, y)
    da = ndx.DataArray(
        frames_np,
        dims=("time", "y", "x"),
        coords={"time": np.arange(t_len) / fps, "y": y, "x": x, "xs": (("y", "x"), xs), "ys": (("y", "x"), ys)},
        attrs={"camera_config": json.dumps({"height": h, "width": w, "resolution": res, "window_size": 32}),
               "camera_shape": str([h, w])},
        name="frames",
    )
    ds = da.frames.get_stiv(np.array([[w * res / 2, h * res / 2]]), angle=0.0, length=3.0, min_coherence=0.5)
    assert np.isnan(ds["v"].values).all()
