"""Tests for the ndx labeled-array data model."""

import numpy as np
import pytest

from pyorc_tpu import ndx


def make_da():
    data = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    return ndx.DataArray(
        data,
        dims=("time", "y", "x"),
        coords={
            "time": np.array([0.0, 0.5]),
            "y": np.array([10.0, 20.0, 30.0]),
            "x": np.array([1.0, 2.0, 3.0, 4.0]),
        },
        name="v",
        attrs={"units": "m/s"},
    )


def test_basic_props():
    da = make_da()
    assert da.dims == ("time", "y", "x")
    assert da.sizes == {"time": 2, "y": 3, "x": 4}
    assert da.attrs["units"] == "m/s"
    assert np.allclose(da["x"].values, [1, 2, 3, 4])


def test_isel_scalar_and_slice():
    da = make_da()
    sub = da.isel(time=0)
    assert sub.dims == ("y", "x")
    assert sub.shape == (3, 4)
    sub2 = da.isel(y=slice(1, 3), x=[0, 2])
    assert sub2.shape == (2, 2, 2)
    assert np.allclose(sub2["y"].values, [20.0, 30.0])
    assert np.allclose(sub2["x"].values, [1.0, 3.0])


def test_sel_nearest():
    da = make_da()
    sub = da.sel(y=21.0, method="nearest")
    assert sub.dims == ("time", "x")
    assert np.allclose(sub.values, da.isel(y=1).values)


def test_reductions_skipna():
    da = make_da()
    v = da.values.copy()
    v[0, 0, 0] = np.nan
    da2 = ndx.DataArray(v, dims=da.dims, coords=dict(da._coords))
    m = da2.mean(dim="time")
    assert m.dims == ("y", "x")
    assert np.isclose(m.values[0, 0], v[1, 0, 0])  # nan skipped
    s = da2.sum(dim=("y", "x"))
    assert s.dims == ("time",)
    cnt = da2.count(dim="time")
    assert cnt.values[0, 0] == 1
    assert cnt.values[0, 1] == 2


def test_quantile():
    da = make_da()
    q = da.quantile([0.0, 0.5, 1.0], dim="time")
    assert q.dims == ("quantile", "y", "x")
    assert np.allclose(q.isel(quantile=0).values, da.values.min(axis=0))
    qs = da.quantile(0.5, dim="time")
    assert qs.dims == ("y", "x")


def test_broadcast_binary_ops():
    da = make_da()
    tmean = da.mean(dim="time")
    anom = da - tmean
    assert anom.dims == ("time", "y", "x")
    assert np.allclose(anom.values, da.values - da.values.mean(axis=0))
    # scalar ops
    x2 = da * 2 + 1
    assert np.allclose(x2.values, da.values * 2 + 1)
    # broadcasting in the other direction
    anom2 = tmean - da
    assert set(anom2.dims) == {"time", "y", "x"}


def test_where_fillna():
    da = make_da()
    masked = da.where(da > 5)
    assert np.isnan(masked.values[0, 0, 0])
    assert masked.values[1, 2, 3] == 23
    filled = masked.fillna(-1.0)
    assert filled.values[0, 0, 0] == -1.0


def test_shift():
    da = make_da()
    sh = da.shift(time=1)
    assert np.all(np.isnan(sh.values[0]))
    assert np.allclose(sh.values[1], da.values[0])


def test_rolling_mean():
    data = np.array([1.0, 2.0, 3.0, 4.0])
    da = ndx.DataArray(data, dims=("t",))
    r = da.rolling(t=2).mean()
    assert np.isnan(r.values[0])
    assert np.allclose(r.values[1:], [1.5, 2.5, 3.5])
    r2 = da.rolling(t=2, min_periods=1).mean()
    assert np.allclose(r2.values, [1.0, 1.5, 2.5, 3.5])


def test_interp_orthogonal():
    da = make_da()
    out = da.interp(y=[15.0, 25.0])
    assert out.sizes["y"] == 2
    expected = 0.5 * (da.values[:, 0] + da.values[:, 1])
    assert np.allclose(out.values[:, 0], expected)


def test_interp_pointwise():
    da = make_da().isel(time=0)  # dims y, x
    pts_y = ndx.DataArray(np.array([10.0, 30.0]), dims=("points",))
    pts_x = ndx.DataArray(np.array([1.5, 4.0]), dims=("points",))
    out = da.interp(y=pts_y, x=pts_x)
    assert out.dims == ("points",)
    assert np.isclose(out.values[0], 0.5 * (da.values[0, 0] + da.values[0, 1]))
    assert np.isclose(out.values[1], da.values[2, 3])


def test_transpose_expand_squeeze():
    da = make_da()
    t = da.transpose("x", "time", "y")
    assert t.dims == ("x", "time", "y")
    e = da.expand_dims("new")
    assert e.dims == ("new", "time", "y", "x")
    s = e.squeeze("new")
    assert s.dims == ("time", "y", "x")


def test_concat():
    da = make_da()
    both = ndx.concat([da.isel(time=[0]), da.isel(time=[1])], dim="time")
    assert both.sizes["time"] == 2
    assert np.allclose(both.values, da.values)
    assert np.allclose(both["time"].values, da["time"].values)


def test_dataset_basic():
    da = make_da()
    ds = ndx.Dataset({"v_x": da, "v_y": da * 2}, attrs={"src": "test"})
    assert set(ds.data_vars) == {"v_x", "v_y"}
    assert ds.sizes == {"time": 2, "y": 3, "x": 4}
    m = ds.mean(dim="time")
    assert m["v_x"].dims == ("y", "x")
    sub = ds.isel(time=0)
    assert sub["v_y"].shape == (3, 4)
    # coords shared
    assert np.allclose(ds["v_y"]["x"].values, [1, 2, 3, 4])


def test_dataset_setitem_and_where():
    da = make_da()
    ds = ndx.Dataset({"v_x": da})
    ds["mask"] = da > 10
    out = ds[["v_x"]].where(ds["mask"])
    assert np.isnan(out["v_x"].values[0, 0, 0])


def test_jax_backed():
    import jax.numpy as jnp

    da = ndx.DataArray(jnp.arange(12.0).reshape(3, 4), dims=("y", "x"))
    m = da.mean(dim="y")
    assert m.dims == ("x",)
    out = da * 2 - da
    assert np.allclose(out.values, da.values)


def test_netcdf_roundtrip(tmp_path):
    da = make_da()
    ds = ndx.Dataset({"v_x": da, "v_y": da * 2}, attrs={"camera_config": "{}", "h_a": "0.0"})
    ds.encoding = {"v_x": {"scale_factor": 0.01, "dtype": "int16", "zlib": True}}
    p = tmp_path / "test.nc"
    ds.to_netcdf(p)
    back = ndx.open_dataset(p)
    assert set(back.data_vars) == {"v_x", "v_y"}
    assert back.attrs["camera_config"] == "{}"
    assert np.allclose(back["v_x"].values, da.values, atol=0.01)
    assert np.allclose(back["v_y"].values, da.values * 2)
    assert np.allclose(back["x"].values, [1, 2, 3, 4])
    assert back["v_x"].dims == ("time", "y", "x")


def test_read_reference_netcdf(ngwerere_piv_ref):
    ds = ngwerere_piv_ref
    assert set(ds.data_vars) >= {"v_x", "v_y", "corr", "s2n"}
    assert ds["v_x"].dims == ("time", "y", "x")
    assert ds["v_x"].shape == (125, 59, 66)
    # scale factor decoding applied (int16 * 0.01 -> float)
    assert ds["v_x"].values.dtype.kind == "f"
    v = ds["v_x"].values
    assert np.nanmax(np.abs(v)) < 32  # plausible velocities in m/s
    assert "camera_config" in ds.attrs
    # 2D coords present
    assert ds.coords["lon"].dims == ("y", "x")


def test_accessor_registration():
    @ndx.register_dataarray_accessor("testacc")
    class Acc:
        def __init__(self, obj):
            self.obj = obj

        def double(self):
            return self.obj * 2

    da = make_da()
    assert np.allclose(da.testacc.double().values, da.values * 2)
    # cached
    assert da.testacc is da.testacc


def test_reduce_unknown_dim_raises():
    import pytest

    from pyorc_tpu import ndx

    da = ndx.DataArray(np.zeros((2, 3)), dims=("t", "x"), coords={"t": [0, 1], "x": [0, 1, 2]})
    ds = ndx.Dataset({"a": (("t", "x"), np.ones((2, 3)))}, coords={"t": [0, 1], "x": [0, 1, 2]})
    with pytest.raises(ValueError, match="bogus"):
        da.mean(dim="bogus")
    with pytest.raises(ValueError, match="bogus"):
        ds.mean(dim="bogus")
    # variables merely lacking the dim are skipped, not an error
    ds2 = ndx.Dataset(
        {"a": (("t", "x"), np.ones((2, 3))), "b": (("x",), np.ones(3))},
        coords={"t": [0, 1], "x": [0, 1, 2]},
    )
    out = ds2.mean(dim="t")
    assert out["a"].dims == ("x",) and out["b"].dims == ("x",)


def test_sample_data_offline(tmp_path, monkeypatch):
    """Cache hits need no network; misses fail with an actionable error."""
    import pytest

    from pyorc_tpu import sample_data

    monkeypatch.setenv("PYORC_TPU_CACHE", str(tmp_path))
    (tmp_path / "cs1.geojson").write_text("{}")
    (tmp_path / "cam_config_gcps.json").write_text("{}")
    cs, cam = sample_data.get_hommerich_pyorc_files()
    assert cs.endswith("cs1.geojson")
    # video is not cached -> must raise with the manual-placement hint
    monkeypatch.setattr(sample_data, "BASE_URL", "http://127.0.0.1:1/nope")
    with pytest.raises(IOError, match="place the file manually"):
        sample_data.get_hommerich_dataset()


def test_helpers_compat_functions():
    """The reference's public helpers all exist and behave sanely."""
    from pyorc_tpu import helpers as h

    a = np.ones((8, 8))
    a[3:5, 3:5] = np.nan
    a[0, 0] = np.nan
    m = h.get_enclosed_mask(a)
    assert m[4, 4] == 1 and m[0, 0] == 0
    filled = h.mask_fill(a.copy(), m.astype(np.int8))
    assert np.isfinite(filled[4, 4]) and not np.isfinite(filled[0, 0])
    st = h.neighbour_stack(np.arange(9.0).reshape(3, 3))
    assert st.shape == (9, 3, 3)
    assert np.allclose(st[4], np.arange(9.0).reshape(3, 3))
    assert h.round_to_multiple(7.3, 0.5) == 7.5
    assert h.mse([2.0], lambda x, p: p * x, np.array([1.0, 2.0]), np.array([2.0, 4.0])) == 0.0
    mat = np.array([[2.0, 0.0, 1.0], [0.0, 2.0, 2.0], [0.0, 0.0, 1.0]])
    xp, yp = h.xy_to_perspective(np.array([1.0, 2.0]), np.array([1.0, 1.0]), 1.0, mat)
    assert np.allclose(xp, [2.0, 4.0]) and np.allclose(yp, [3.0, 3.0])
    assert h.staggered_index(0, 4) is not None
    assert h.get_rotation_code(None) is None


def test_module_function_parity():
    """AST audit: every public function the reference defines at module level
    exists here (possibly as a compat alias)."""
    import ast

    import pyorc_tpu.helpers
    import pyorc_tpu.io
    import pyorc_tpu.sample_data
    from pyorc_tpu.cli import cli_utils

    ref = "/root/reference/pyorc"
    import os

    if not os.path.isdir(ref):
        import pytest

        pytest.skip("reference mount unavailable")

    def ref_funcs(path):
        tree = ast.parse(open(path).read())
        return {n.name for n in tree.body if isinstance(n, ast.FunctionDef) and not n.name.startswith("_")}

    for fname, mods in {
        "helpers.py": [pyorc_tpu.helpers],
        "io.py": [pyorc_tpu.io],
        "cli/cli_utils.py": [cli_utils],
        "sample_data.py": [pyorc_tpu.sample_data],
    }.items():
        mine = set()
        for m in mods:
            mine |= set(dir(m))
        missing = ref_funcs(f"{ref}/{fname}") - mine
        assert not missing, f"{fname}: missing {sorted(missing)}"
