"""XYZ basemap tiles: mercator math, mosaic composition, offline fallback."""

import numpy as np
import pytest

from pyorc_tpu.io import basemap


def synthetic_fetch(provider, x, y, z):
    """Deterministic tile: solid colour encoding (x, y) parity."""
    t = np.zeros((256, 256, 3), np.uint8)
    t[..., 0] = (x % 2) * 200 + 30
    t[..., 1] = (y % 2) * 200 + 30
    t[..., 2] = z
    return t


def test_tile_math_roundtrip():
    for lon, lat, z in [(5.9135, 50.807, 18), (-122.4, 37.77, 15), (0.0, 0.0, 3)]:
        xt, yt = basemap._lonlat_to_tilef(lon, lat, z)
        lon2, lat2 = basemap._tilef_to_lonlat(xt, yt, z)
        assert abs(lon - lon2) < 1e-9
        assert abs(lat - lat2) < 1e-6


def test_mosaic_composes_and_warps():
    extent = (5.9130, 5.9140, 50.8068, 50.8074)
    out = basemap.tile_mosaic(extent, zoom=18, fetch=synthetic_fetch)
    assert out is not None
    img, ext = out
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 10 and img.shape[1] > 10
    assert ext == extent
    assert (img[..., 2] == 18).all()  # zoom plumbed through


def test_offline_returns_none_and_add_basemap_warns(tmp_path, monkeypatch):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    monkeypatch.setenv("PYORC_TPU_TILE_CACHE", str(tmp_path))

    def no_net(provider, x, y, z):
        return None

    fig, ax = plt.subplots()
    with pytest.warns(UserWarning, match="Basemap tiles unavailable"):
        ok = basemap.add_basemap(ax, (5.913, 5.914, 50.806, 50.807), fetch=no_net)
    assert not ok
    plt.close(fig)


def test_get_geo_axes_with_tiles():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pyorc_tpu import helpers

    # offline: must not raise, warns and returns a working axes
    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        ax = helpers.get_geo_axes(tiles="GoogleTiles", extent=(5.913, 5.914, 50.806, 50.807))
    assert ax is not None
    plt.close("all")


def test_gcp_select_geo_panel_offline():
    """GcpSelect with a CRS grows the geographic side panel (offline: no
    tiles, but points + panel render)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pyorc_tpu.cli.cli_elements import GcpSelect

    img = np.zeros((120, 160), np.uint8)
    dst = [
        [192102.5, 313157.6, 150.8],
        [192101.4, 313160.1, 150.7],
        [192099.8, 313163.3, 150.8],
        [192096.9, 313169.3, 150.6],
    ]
    sel = GcpSelect(img, dst, crs=28992)
    assert getattr(sel, "ax_geo", None) is not None
    plt.close("all")
