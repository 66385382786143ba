"""Mask chain + transect + discharge, golden-tested against the reference's
own output files (ngwerere_piv.nc -> ngwerere_masked.nc)."""

import numpy as np
import pytest

REF_CSV = "/root/reference/examples/ngwerere/ngwerere_cross_section.csv"


@pytest.fixture(scope="module")
def piv_golden():
    from pyorc_tpu import open_dataset

    return open_dataset("/root/reference/examples/ngwerere/ngwerere_piv.nc")


@pytest.fixture(scope="module")
def masked_ours(piv_golden):
    """Apply the ngwerere recipe's mask chain to the golden PIV output."""
    dsm = piv_golden.copy(deep=True)
    m = dsm.velocimetry.mask
    m.corr(inplace=True)
    m.minmax(inplace=True)
    m.rolling(inplace=True)
    m.outliers(inplace=True)
    m.variance(inplace=True)
    m.count(inplace=True)
    m.window_mean(wdw=2, tolerance=0.5, reduce_time=True, inplace=True)
    return dsm


@pytest.fixture(scope="module")
def cross_section():
    cs = np.genfromtxt(REF_CSV, delimiter=",", names=True)
    return cs["x"], cs["y"], cs["z"]


def test_mask_chain_matches_reference(masked_ours, ngwerere_masked_ref):
    """The full recipe mask chain reproduces the reference's masked output."""
    for var in ("v_x", "v_y"):
        ours = masked_ours[var].values
        ref = ngwerere_masked_ref[var].values
        nan_agree = (np.isnan(ours) == np.isnan(ref)).mean()
        assert nan_agree > 0.9999, f"{var}: NaN pattern agreement {nan_agree}"
        valid = ~np.isnan(ours) & ~np.isnan(ref)
        assert valid.any()
        assert np.nanmax(np.abs(ours[valid] - ref[valid])) < 1e-6


def test_individual_masks(piv_golden):
    m = piv_golden.velocimetry.mask
    corr_mask = m.corr()
    assert corr_mask.dims == ("time", "y", "x")
    assert 0.2 < corr_mask.values.mean() < 1.0
    count_mask = m.count()
    assert count_mask.dims == ("y", "x")
    s2n_mask = m.s2n(tolerance=3)
    assert s2n_mask.values.any()
    wm = m.window_nan()
    assert wm.dims == ("time", "y", "x")


def test_mask_requires_velocimetry(piv_golden):
    ds = piv_golden.drop_vars("v_x")
    with pytest.raises(AssertionError):
        ds.velocimetry.mask.minmax()


def test_get_transect(masked_ours, cross_section):
    x, y, z = cross_section
    tr = masked_ours.velocimetry.get_transect(x, y, z, crs=32735, rolling=4, wdw=2)
    assert tr.sizes["quantile"] == 5
    assert tr.sizes["points"] > 20
    assert "v_eff_nofill" in tr
    # flow direction from local grid geometry (reference golden -4.419 with
    # their slightly different grid spacing)
    assert -5.0 < float(tr["v_dir"].values[0]) < -4.0
    # sensible effective velocities in the wet part
    assert 0 < np.nanmedian(np.abs(tr["v_eff_nofill"].values)) < 1.0


@pytest.mark.parametrize("fill_method", ["zeros", "interpolate", "log_interp", "log_fit"])
def test_get_q_and_river_flow(masked_ours, cross_section, fill_method):
    x, y, z = cross_section
    tr = masked_ours.velocimetry.get_transect(x, y, z, crs=32735, rolling=4, wdw=2)
    kwargs = {}
    if fill_method == "log_fit":
        kwargs = {}
    tq = tr.transect.get_q(fill_method=fill_method, v_corr=0.85)
    assert "q" in tq and "q_nofill" in tq
    tq.transect.get_river_flow()
    Q = tq["river_flow"].values
    assert Q.shape == (5,)
    assert np.all(np.diff(Q) >= -1e-9)  # quantiles are ordered
    # plausible discharge for this small stream
    assert -0.2 < Q[0] < Q[-1] < 2.0


def test_transect_point_distance(masked_ours, cross_section):
    x, y, z = cross_section
    tr_fine = masked_ours.velocimetry.get_transect(x, y, z, crs=32735, distance=0.1)
    tr_coarse = masked_ours.velocimetry.get_transect(x, y, z, crs=32735, distance=0.3)
    assert tr_fine.sizes["points"] > 2.5 * tr_coarse.sizes["points"]
    # reference goldens with the same csv: 50 / 17 points
    assert tr_fine.sizes["points"] == 50
    assert tr_coarse.sizes["points"] == 17


def test_to_ugrid(masked_ours, tmp_path):
    ds_ugrid = masked_ours.velocimetry.to_ugrid()
    assert "mesh2d_ucx" in ds_ugrid
    assert "mesh2d_face_nodes" in ds_ugrid
    n_faces = masked_ours.sizes["y"] * masked_ours.sizes["x"]
    assert ds_ugrid["mesh2d_ucx"].shape == (masked_ours.sizes["time"], n_faces)
    fn = tmp_path / "velocimetry_ugrid.nc"
    ds_ugrid.to_netcdf(fn)
    assert fn.exists()


def test_masked_write_roundtrip(masked_ours, tmp_path):
    fn = tmp_path / "masked.nc"
    masked_ours.velocimetry.set_encoding()
    masked_ours.to_netcdf(fn)
    from pyorc_tpu import open_dataset

    back = open_dataset(fn)
    ours = masked_ours["v_x"].values
    b = back["v_x"].values
    valid = ~np.isnan(ours)
    assert np.allclose(b[valid], ours[valid], atol=0.01)
    assert np.isnan(b[~valid]).all()


def test_plot_get_uv_methods(masked_ours):
    """Reference-parity (u, v, s) accessors on both plot namespaces."""
    import warnings

    import matplotlib

    matplotlib.use("Agg")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for name in ("get_uv_local", "get_uv_geographical", "get_uv_camera"):
            u, v, s = getattr(masked_ours.velocimetry.plot, name)()
            assert np.asarray(u).shape == np.asarray(v).shape
            assert np.isfinite(np.asarray(u)).any(), name
        # transect namespace
        cc = masked_ours.velocimetry.camera_config
        xv, yv = masked_ours["x"].values, masked_ours["y"].values
        x = np.linspace(float(xv.min()) + 1, float(xv.max()) - 1, 10)
        y = np.full(10, float(yv.mean()))
        z = np.full(10, cc.gcps["z_0"] - 0.3)
        tr = masked_ours.velocimetry.get_transect(x, y, z).transect.get_q()
        n_pts = tr.sizes["points"]
        for name in ("get_uv_local", "get_uv_geographical", "get_uv_camera"):
            u, v, s = getattr(tr.transect.plot, name)()
            assert np.asarray(u).shape[-1] == n_pts


def test_plot_methods_render(masked_ours):
    """Every plot method a reference recipe can name renders on all modes
    (VERDICT r2 item 8): velocimetry quiver/scatter/pcolormesh/streamplot,
    transect quiver/scatter with colorbar + discharge text; time-resolved
    input raises the reduce-first error like the reference."""
    import matplotlib

    matplotlib.use("Agg")
    import warnings

    import matplotlib.pyplot as plt
    import pytest as _pytest

    # reference behavior: time-resolved data must be reduced first
    with _pytest.raises(AttributeError, match="Reduce"):
        masked_ours.velocimetry.plot(method="quiver")

    reduced = masked_ours.mean(dim="time")
    reduced.attrs = dict(masked_ours.attrs)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for method in ("quiver", "scatter", "pcolormesh"):
            for mode in ("local", "geographical", "camera"):
                ax = reduced.velocimetry.plot(
                    method=method, mode=mode, add_colorbar=True, colorbar_loc=1
                )
                assert ax is not None
                plt.close("all")
        ax = reduced.velocimetry.plot(method="streamplot", mode="local")
        plt.close("all")

        # transect: quiver + scatter with cross-section overlay and text
        cc = masked_ours.velocimetry.camera_config
        xv, yv = masked_ours["x"].values, masked_ours["y"].values
        x = np.linspace(float(xv.min()) + 1, float(xv.max()) - 1, 10)
        y = np.full(10, float(yv.mean()))
        z = np.full(10, cc.gcps["z_0"] - 0.3)
        tr = masked_ours.velocimetry.get_transect(x, y, z).transect.get_q()
        trq = tr.isel(quantile=2)
        trq.attrs = dict(tr.attrs)
        for method in ("quiver", "scatter"):
            for mode in ("local", "camera"):
                ax = trq.transect.plot(
                    method=method, mode=mode, add_colorbar=True, add_text=True,
                    text_prefix="t: ",
                )
                assert ax is not None
                plt.close("all")


def test_frames_plot_rgb_and_guard(vid_frames_rgb=None):
    """frames_plot: RGB imshow fast path in local mode; unreduced stacks
    raise (reference plot.py:273-277)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pytest as _pytest

    from pyorc_tpu import ndx
    from pyorc_tpu.api.plot import frames_plot

    rgb = np.random.default_rng(0).integers(0, 255, (4, 24, 32, 3), dtype=np.uint8)
    da = ndx.DataArray(
        rgb, dims=("time", "y", "x", "rgb"),
        coords={"time": np.arange(4.0), "y": np.arange(24.0)[::-1], "x": np.arange(32.0),
                "rgb": [0, 1, 2]},
    )
    with _pytest.raises(AttributeError, match="Reduce"):
        frames_plot(da)
    one = da.isel(time=0)
    ax = frames_plot(one, mode="local")
    assert ax is not None
    plt.close("all")


def test_mask_time_dim_requirements(piv_golden):
    """Time-dependent masks refuse reduced data and warn on single timesteps,
    returning an all-pass mask (reference tests/test_mask.py:28-31,72-86)."""
    import pytest as pt

    piv_mean = piv_golden.mean(dim="time", keep_attrs=True)
    with pt.raises(AssertionError, match='requires dimension "time"'):
        piv_mean.velocimetry.mask.variance()

    piv_one = piv_golden.isel(time=slice(0, 1))
    with pt.warns(UserWarning, match="requires multiple timesteps"):
        mask = piv_one.velocimetry.mask.variance()
    assert bool(np.asarray(mask.values).all())
    with pt.warns(UserWarning, match="requires multiple timesteps"):
        piv_one.velocimetry.mask.count(inplace=True, tolerance=0.3)


def test_plot_helpers_module():
    """Standalone shapely-geometry plot helpers (reference plot_helpers.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pyorc_tpu import plot_helpers
    from pyorc_tpu.geom import shapes

    sq = shapes.Polygon([(0, 0, 1.0), (1, 0, 1.2), (1, 1, 1.1), (0, 1, 1.3)])
    multi = shapes.MultiPolygon([sq])
    line = shapes.LineString([(0, 0, 1.0), (1, 1, 2.0)])

    assert plot_helpers.plot_polygon(sq, alpha=0.4) is not None
    assert plot_helpers.plot_polygon(multi, label="aoi") is not None
    fig = plt.figure()
    ax3 = fig.add_subplot(projection="3d")
    assert plot_helpers.plot_3d_polygon(multi, ax=ax3, alpha=0.3) is not None
    assert plot_helpers.plot_3d_line(line, ax=ax3) is not None
    assert plot_helpers.plot_line(line) is not None
    plt.close("all")
