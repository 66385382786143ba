"""CRS, affine, and planar-shape tests. The UTM oracle is the reference
netCDF's lon/lat arrays, which were produced by pyproj."""

import numpy as np
import pytest

from pyorc_tpu.geom import affine as aff
from pyorc_tpu.geom import crs as crs_mod
from pyorc_tpu.geom import shapes


def test_utm_vs_pyproj_golden(ngwerere_piv_ref):
    """xs/ys (EPSG:32735) -> lon/lat must match the reference's pyproj output."""
    ds = ngwerere_piv_ref
    xs = ds.coords["xs"].values
    ys = ds.coords["ys"].values
    lon_ref = ds.coords["lon"].values
    lat_ref = ds.coords["lat"].values
    lon, lat = crs_mod.transform_points(32735, 4326, xs, ys)
    # lon/lat stored as float64 by reference; expect ~1e-9 deg (~0.1 mm) accuracy
    assert np.nanmax(np.abs(lon - lon_ref)) < 1e-8
    assert np.nanmax(np.abs(lat - lat_ref)) < 1e-8


def test_utm_roundtrip():
    lon = np.array([27.5, 28.27, 29.9])
    lat = np.array([-15.4, -14.9, -17.2])
    c = crs_mod.CRS.from_epsg(32735)
    E, N = c.from_lonlat(lon, lat)
    lon2, lat2 = c.to_lonlat(E, N)
    assert np.allclose(lon, lon2, atol=1e-11)
    assert np.allclose(lat, lat2, atol=1e-11)


def test_crs_from_wkt(ngwerere_cam_config_json):
    wkt = ngwerere_cam_config_json["crs"]
    c = crs_mod.CRS.from_user_input(wkt)
    assert c.epsg == 32735
    assert c.lon0 == 27
    assert c.false_northing == 10000000.0
    assert not c.is_geographic
    # WKT round-trip keeps the original string
    assert c.to_wkt() == wkt


def test_crs_user_inputs():
    assert crs_mod.CRS.from_user_input("EPSG:4326").is_geographic
    assert crs_mod.CRS.from_user_input(32735) == crs_mod.CRS.from_user_input("EPSG:32735")
    assert crs_mod.CRS.from_user_input("+proj=utm +zone=35 +south").epsg == 32735
    with pytest.raises(NotImplementedError):
        crs_mod.CRS.from_epsg(3857)


def test_affine_roundtrip():
    # rotated equal-resolution grid transform (dy_col == dx_row as the pipeline produces)
    theta = 0.3
    res = 0.01
    t = aff.Affine(
        np.cos(theta) * res,
        np.sin(theta) * res,
        642730.0,
        np.cos(theta + 1.5 * np.pi) * res,
        np.sin(theta + 1.5 * np.pi) * res,
        8304293.0,
    )
    cols = np.array([0.0, 10, 55])
    rows = np.array([0.0, 7, 20])
    x, y = aff.pixel_to_map(cols, rows, t)
    r2, c2 = aff.map_to_pixel(x, y, t)
    assert np.allclose(c2, cols)
    assert np.allclose(r2, rows)
    rf, cf = aff.map_to_pixel_float(x, y, t)
    assert np.allclose(cf, cols, atol=1e-9)
    assert np.allclose(rf, rows, atol=1e-9)


def test_affine_from_grid():
    from pyorc_tpu.geom import aoi, shapes

    bbox = shapes.Polygon([(10.0, 20.0), (14.0, 23.0), (12.0, 25.66), (8.0, 22.66)])
    t = aoi.get_transform(bbox, resolution=0.5)
    cols, rows = np.meshgrid(np.arange(8), np.arange(5))
    x, y = aff.pixel_to_map(cols, rows, t)
    t2 = aff.affine_from_grid(x, y)
    # affine_from_grid uses cell centres as origin; steps must agree
    assert np.allclose(tuple(t)[0:2], tuple(t2)[0:2], atol=1e-9)
    assert np.allclose(tuple(t)[3:5], tuple(t2)[3:5], atol=1e-9)


def test_get_aoi_corners_and_shape():
    from pyorc_tpu.geom import aoi

    corners = np.array([[0.0, 0.0], [10.0, 1.0], [9.5, 6.0], [-0.5, 5.0]])
    bbox = aoi.get_aoi(corners, resolution=0.01)
    assert bbox.area > 0
    cols, rows = aoi.get_shape(bbox, resolution=0.1)
    # aoi spans roughly 10m x 5m
    assert 80 < cols < 120
    assert 35 < rows < 65


def test_polygon_basics():
    p = shapes.Polygon([(0, 0), (4, 0), (4, 3), (0, 3)])
    assert p.area == 12
    c = p.centroid
    assert (c.x, c.y) == (2.0, 1.5)
    assert p.contains(shapes.Point(1, 1))
    assert not p.contains(shapes.Point(5, 1))
    assert len(p.exterior.coords) == 5


def test_polygon_intersection():
    a = shapes.Polygon([(0, 0), (4, 0), (4, 4), (0, 4)])
    b = shapes.Polygon([(2, 2), (6, 2), (6, 6), (2, 6)])
    inter = a.intersection(b)
    assert np.isclose(inter.area, 4.0)


def test_linestring_ops():
    ls = shapes.LineString([(0, 0), (3, 0), (3, 4)])
    assert ls.length == 7
    mid = ls.interpolate(3.5)
    assert np.allclose([mid.x, mid.y], [3, 0.5])
    # project: closest point to (1, 2) is (1, 0) at distance 1 along line
    assert np.isclose(ls.project(shapes.Point(1, 2)), 1.0)
    # intersection with a crossing line
    other = shapes.LineString([(1, -1), (1, 1)])
    pt = ls.intersection(other)
    assert np.allclose([pt.x, pt.y], [1, 0])


def test_line_clip_to_polygon():
    poly = shapes.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    line = shapes.LineString([(-5, 5), (15, 5)])
    clipped = poly.intersection(line)
    assert np.isclose(clipped.length, 10.0)


def test_wkt_roundtrip(ngwerere_cam_config_json):
    bbox_wkt = ngwerere_cam_config_json["bbox"]
    poly = shapes.loads(bbox_wkt)
    assert isinstance(poly, shapes.Polygon)
    assert poly.area > 0
    poly2 = shapes.loads(shapes.dumps(poly))
    assert np.allclose(poly._ring, poly2._ring)


def test_affinity():
    p = shapes.Polygon([(0, 0), (2, 0), (2, 2), (0, 2)])
    r = shapes.rotate(p, 90, origin="center")
    assert np.isclose(r.area, 4.0)
    t = shapes.translate(p, xoff=1, yoff=-1)
    assert np.allclose(t._ring[0], [1, -1])
    s = shapes.scale(p, xfact=2, yfact=1, origin=(0, 0))
    assert np.isclose(s.area, 8.0)


def test_point_in_polygon_vectorized(rng):
    ring = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], dtype=float)
    pts = rng.uniform(-2, 12, size=(500, 2))
    inside = shapes.points_in_polygon(pts, ring)
    expected = (pts[:, 0] >= 0) & (pts[:, 0] <= 10) & (pts[:, 1] >= 0) & (pts[:, 1] <= 10)
    assert (inside == expected).mean() > 0.99  # boundary-grazing points may differ
