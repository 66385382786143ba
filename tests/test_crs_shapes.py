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
        # Albers Equal Area (EPSG method 9822) is genuinely unimplemented;
        # the error must name the method (or 'projinfo' when PROJ is absent)
        crs_mod.CRS.from_epsg(5070)


def test_lcc_2sp_epsg_worked_example():
    """EPSG Guidance Note 7-2 §3.1.1.1 worked example: NAD27 / Texas South
    Central (Clarke 1866, US survey feet). Published: (28°30'N, 96°W) ->
    E=2963503.91, N=254759.80 US ft."""
    lcc = crs_mod._LambertConformal(
        20925832.16, 294.97870, lat0=27 + 50 / 60, lon0=-99.0,
        fe=2000000.0, fn_=0.0, sp1=28 + 23 / 60, sp2=30 + 17 / 60,
    )
    E, N = lcc.forward(-96.0, 28.5)
    assert abs(E - 2963503.91) < 0.01
    assert abs(N - 254759.80) < 0.01
    lon, lat = lcc.reverse(2963503.91, 254759.80)
    assert abs(lon - (-96.0)) < 1e-7
    assert abs(lat - 28.5) < 1e-7


def test_lcc_1sp_epsg_worked_example():
    """EPSG Guidance Note 7-2 §3.1.1.2 worked example: Jamaica 1969 / Jamaica
    National Grid (Clarke 1866, metres). Published: (17°55'55.80"N,
    76°56'37.26"W) -> E=255966.58, N=142493.51."""
    lcc = crs_mod._LambertConformal(
        6378206.400, 294.97870, lat0=18.0, lon0=-77.0, fe=250000.0, fn_=150000.0, k0=1.0,
    )
    E, N = lcc.forward(-(76 + 56 / 60 + 37.26 / 3600), 17 + 55 / 60 + 55.80 / 3600)
    assert abs(E - 255966.58) < 0.01
    assert abs(N - 142493.51) < 0.01


def test_tm_lat0_epsg_worked_example():
    """EPSG Guidance Note 7-2 TM worked example: OSGB36 / British National
    Grid (Airy 1830, lat0=49N). Published: (50°30'N, 0°30'E OSGB36) ->
    E=577274.99, N=69740.50 (GN rounds 1/f; allow 2 cm)."""
    E, N = crs_mod._tm_forward(
        0.5, 50.5, lon0=-2.0, k0=0.9996012717, fe=400000.0, fn_=-100000.0,
        a=6377563.396, f=1 / 299.3249646, lat0=49.0,
    )
    assert abs(E - 577274.99) < 0.02
    assert abs(N - 69740.50) < 0.02


def test_osgb_epsg27700_datum_and_roundtrip():
    c = crs_mod.CRS.from_epsg(27700)
    lon, lat = -0.1276, 51.5072  # London, WGS84
    E, N = c.from_lonlat(lon, lat)
    lon2, lat2 = c.to_lonlat(E, N)
    # 2D datum round-trips drop the ellipsoidal height, which perturbs the
    # Helmert rotation/scale terms at the ~1 mm level (OSGB carries a large
    # -20.5 ppm scale term) — pyproj's 2D towgs84 transforms behave the same
    assert abs(lon - lon2) < 2e-8 and abs(lat - lat2) < 2e-8
    # the OSGB36<->WGS84 datum shift is ~100 m in Britain: projecting WITHOUT
    # the Helmert must land elsewhere by that order
    E0, N0 = crs_mod._tm_forward(lon, lat, lon0=-2.0, k0=0.9996012717, fe=400000.0,
                                 fn_=-100000.0, a=6377563.396, f=1 / 299.3249646, lat0=49.0)
    shift = np.hypot(E - E0, N - N0)
    assert 70 < shift < 140


def test_etrs89_utm_matches_wgs84_utm():
    """ETRS89/UTM (EPSG 258xx): the ETRS89<->WGS84 transformation is the null
    transformation (EPSG:1149) and GRS80 vs WGS84 flattening differs at the
    0.1 mm level, so ETRS89/UTM 32N must agree with WGS84/UTM 32N to <1 mm
    (the latter is golden-tested against pyproj)."""
    lon = np.array([6.5, 9.0, 11.9])
    lat = np.array([47.2, 52.0, 58.8])
    c_etrs = crs_mod.CRS.from_epsg(25832)
    c_wgs = crs_mod.CRS.from_epsg(32632)
    E1, N1 = c_etrs.from_lonlat(lon, lat)
    E2, N2 = c_wgs.from_lonlat(lon, lat)
    assert np.abs(E1 - E2).max() < 1e-3
    assert np.abs(N1 - N2).max() < 1e-3
    lon2, lat2 = c_etrs.to_lonlat(E1, N1)
    assert np.allclose(lon, lon2, atol=1e-11) and np.allclose(lat, lat2, atol=1e-11)
    # full advertised ranges resolve
    for code in (25828, 25838, 26901, 26923, 28348, 28358):
        assert crs_mod.CRS.from_epsg(code).epsg == code


def test_lambert93_origin_and_roundtrip():
    c = crs_mod.CRS.from_epsg(2154)
    E, N = c.from_lonlat(3.0, 46.5)  # natural origin maps to (FE, FN) exactly
    assert abs(E - 700000.0) < 1e-6
    assert abs(N - 6600000.0) < 1e-6
    lon = np.array([2.3522, -1.5536, 7.75])
    lat = np.array([48.8566, 47.2184, 48.58])
    E, N = c.from_lonlat(lon, lat)
    lon2, lat2 = c.to_lonlat(E, N)
    assert np.allclose(lon, lon2, atol=1e-11) and np.allclose(lat, lat2, atol=1e-11)
    assert (E > 0).all() and (N > 6000000).all()  # French territory sanity


def test_belgian_lambert72_roundtrip_and_datum():
    c = crs_mod.CRS.from_epsg(31370)
    lon, lat = 4.3517, 50.8466  # Brussels, WGS84
    E, N = c.from_lonlat(lon, lat)
    assert 145000 < E < 155000 and 165000 < N < 175000
    lon2, lat2 = c.to_lonlat(E, N)
    assert abs(lon - lon2) < 1e-8 and abs(lat - lat2) < 1e-8  # see OSGB note
    # the BD72 Helmert shift is ~100 m over Belgium
    c_nodatum = crs_mod.CRS(lcc=c.lcc, ellipsoid=c.ellipsoid)
    E0, N0 = c_nodatum.from_lonlat(lon, lat)
    shift = np.hypot(E - E0, N - N0)
    assert 50 < shift < 200


def test_new_crs_wkt_roundtrip():
    """to_wkt() output must parse back to an equal CRS for every new family
    (the CameraConfig JSON stores the CRS as this WKT)."""
    for code in (2154, 31370, 27700, 25832, 26910, 28355, 28992):
        c = crs_mod.CRS.from_epsg(code)
        w = c.to_wkt()
        c2 = crs_mod.CRS.from_user_input(w)
        assert c2.epsg == code
        assert c2 == c, f"EPSG:{code} WKT round-trip broke equality"


def test_lcc_wkt_without_authority_parses_parameters():
    """A WKT1 LCC string with no EPSG id must parse from its parameters alone."""
    c = crs_mod.CRS.from_epsg(2154)
    wkt = c.to_wkt().replace(',AUTHORITY["EPSG","2154"]', "")
    c2 = crs_mod.CRS.from_user_input(wkt)
    assert c2.epsg is None and c2.lcc is not None
    E1, N1 = c.from_lonlat(5.0, 45.0)
    E2, N2 = c2.from_lonlat(5.0, 45.0)
    assert abs(E1 - E2) < 1e-6 and abs(N1 - N2) < 1e-6


def test_camera_config_roundtrip_in_etrs89_utm(tmp_path):
    """Geul-style camera config built in ETRS89/UTM 31N (EPSG:25831): GCPs
    reprojected from RD New on ingest, JSON round-trip preserves the CRS, and
    the bbox agrees with the RD-New config's bbox reprojected."""
    import json

    import pyorc_tpu

    with open("/root/reference/examples/geul/dk_cam_config.json") as f:
        ref = json.load(f)
    gcps = {k: ref["gcps"][k] for k in ("src", "dst", "z_0", "h_ref")}
    gcps["crs"] = 28992  # dst is in RD New; constructor reprojects to 25831
    cc = pyorc_tpu.CameraConfig(
        height=ref["height"], width=ref["width"], crs=25831, gcps=gcps,
        camera_matrix=ref["camera_matrix"], dist_coeffs=ref["dist_coeffs"],
        resolution=ref["resolution"], window_size=ref["window_size"],
    )
    dst = np.asarray(cc.gcps["dst"])
    x_rd = np.asarray([p[0] for p in ref["gcps"]["dst"]])
    y_rd = np.asarray([p[1] for p in ref["gcps"]["dst"]])
    x_utm, y_utm = crs_mod.transform_points(28992, 25831, x_rd, y_rd)
    assert np.abs(dst[:, 0] - x_utm).max() < 1e-6
    assert np.abs(dst[:, 1] - y_utm).max() < 1e-6
    cc.set_bbox_from_corners([[540, 520], [700, 420], [1200, 500], [1000, 750]])
    fn = tmp_path / "cam_25831.json"
    cc.to_file(str(fn))
    cc2 = pyorc_tpu.load_camera_config(str(fn))
    assert crs_mod.CRS.from_user_input(cc2.crs).epsg == 25831
    b1 = np.asarray(cc.get_bbox().exterior.coords)
    b2 = np.asarray(cc2.get_bbox().exterior.coords)
    assert np.abs(b1 - b2).max() < 1e-6
    lon, lat = crs_mod.transform_points(25831, 4326, b2[:, 0], b2[:, 1])
    assert np.all((lon > 5.8) & (lon < 6.0))  # Geul valley
    assert np.all((lat > 50.7) & (lat < 50.9))


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


# -- EPSG registry (projinfo-backed) golden tests ------------------------------
# Golden values generated with PROJ 9.1.1 cs2cs from the system EPSG database
# (`echo "<lat> <lon>" | cs2cs -f %.6f EPSG:4326 EPSG:<code>`), i.e. the same
# authority the reference's pyproj consults (reference helpers.py:299-333).
# Each case is a different projection family / unit / datum path.

_EPSG_GOLDEN = [
    # code, lon, lat, easting, northing, family
    (2193, 174.77, -41.28, 1748231.069, 5428648.726, "NZTM2000 (TM, NZGD2000)"),
    (2278, -98.5, 29.4, 2127698.984, 13693318.262, "NAD83 / Texas South Central (LCC 2SP, US survey foot)"),
    (32119, -79.0, 35.5, 609601.220, 194128.325, "NAD83 / North Carolina (LCC 2SP, metre)"),
    (3031, 120.0, -75.0, 1419227.916, -819391.619, "WGS84 / Antarctic Polar Stereographic (variant B, south)"),
    (3413, -30.0, 70.0, 566277.345, -2113375.822, "WGS84 / NSIDC Arctic (polar stereo variant B, north)"),
    (5041, 44.0, 73.0, 3320416.747, 632668.431, "WGS84 / UPS North (polar stereo variant A)"),
    (6677, 141.0, 43.0, 95122.087, 777760.022, "JGD2011 / Japan zone XII (TM)"),
    (3857, 5.92, 51.97, 659011.3855, 6794702.8862, "Web Mercator (pseudo-Mercator sphere)"),
    (3395, 5.92, 51.97, 659011.3855, 6761023.7485, "WGS84 / World Mercator (variant A)"),
    (5641, -45.0, -25.0, 4777495.736960, 7144036.574858, "SIRGAS 2000 / Brazil Mercator (variant B)"),
]


def _projinfo_available():
    from pyorc_tpu.geom.crs import _projinfo_json

    return _projinfo_json(2193) is not None


@pytest.mark.skipif(not _projinfo_available(), reason="system PROJ database unavailable")
@pytest.mark.parametrize("code,lon,lat,e,n,family", _EPSG_GOLDEN, ids=[c[5] for c in _EPSG_GOLDEN])
def test_epsg_registry_golden(code, lon, lat, e, n, family):
    """Any-EPSG resolution: forward/inverse match PROJ to sub-mm (the UPS case
    also matches the IOGP Guidance Note 7-2 worked example: 73N 44E ->
    E 3320416.75, N 632668.43)."""
    from pyorc_tpu.geom.crs import CRS

    crs = CRS.from_epsg(code)
    x, y = crs.from_lonlat(lon, lat)
    # sub-mm in native units (the ftUS golden is quoted in feet)
    assert abs(float(x) - e) < 1e-3, (float(x), e)
    assert abs(float(y) - n) < 1e-3, (float(y), n)
    lon2, lat2 = crs.to_lonlat(x, y)
    assert abs(float(lon2) - lon) < 1e-9 and abs(float(lat2) - lat) < 1e-9


@pytest.mark.skipif(not _projinfo_available(), reason="system PROJ database unavailable")
def test_epsg_registry_survey_foot_unit():
    """US State Plane ftUS: the unit factor is exactly 1200/3937 m, so the
    metre and survey-foot variants of the same zone agree after scaling."""
    from pyorc_tpu.geom.crs import CRS

    ft = CRS.from_epsg(2278)   # Texas South Central ftUS
    m = CRS.from_epsg(32140)   # same zone, metres
    assert ft.unit == pytest.approx(1200.0 / 3937.0, abs=1e-12)
    lon, lat = -98.5, 29.4
    xf, yf = ft.from_lonlat(lon, lat)
    xm, ym = m.from_lonlat(lon, lat)
    # sub-mm: the EPSG registry itself stores the ftUS zone's false northing
    # rounded to 13123333.333 usft (= 3999999.9998984 m vs the metre zone's
    # exact 4000000), so 0.1 mm is authority-data precision, not ours
    assert abs(float(xf) * ft.unit - float(xm)) < 1e-3
    assert abs(float(yf) * ft.unit - float(ym)) < 1e-3


@pytest.mark.skipif(not _projinfo_available(), reason="system PROJ database unavailable")
def test_epsg_registry_unsupported_method_is_explicit():
    """A projection method outside the implemented set raises a clear
    NotImplementedError naming the method, not a silent wrong answer."""
    from pyorc_tpu.geom.crs import CRS

    with pytest.raises(NotImplementedError, match="Hotine|Oblique Mercator|method"):
        CRS.from_epsg(2056)  # Swiss LV95: Hotine Oblique Mercator (variant B)


def test_epsg_registry_offline_fallback(monkeypatch):
    """Without projinfo the built-in registry still covers the shipped
    configs, and unknown codes raise the documented NotImplementedError."""
    from pyorc_tpu.geom import crs as crs_mod

    monkeypatch.setattr(crs_mod, "_projinfo_json", lambda code: None)
    assert crs_mod.CRS.from_epsg(32735).epsg == 32735  # built-in UTM fast path
    with pytest.raises(NotImplementedError, match="projinfo"):
        crs_mod.CRS.from_epsg(2193)


@pytest.mark.skipif(not _projinfo_available(), reason="system PROJ database unavailable")
def test_polar_stereographic_wkt_parses():
    """A WKT2 polar-stereographic CRS (e.g. embedded in a camera config)
    parses into the same projection the EPSG registry path builds."""
    import subprocess

    from pyorc_tpu.geom.crs import CRS

    wkt = subprocess.run(
        ["projinfo", "EPSG:3031", "-o", "WKT2:2019", "-q"],
        capture_output=True, text=True,
    ).stdout
    c_wkt = CRS.from_user_input(wkt)
    c_epsg = CRS.from_epsg(3031)
    assert c_wkt.polar is not None
    e1, n1 = c_wkt.from_lonlat(120.0, -75.0)
    e2, n2 = c_epsg.from_lonlat(120.0, -75.0)
    assert abs(float(e1) - float(e2)) < 1e-9 and abs(float(n1) - float(n2)) < 1e-9


@pytest.mark.skipif(not _projinfo_available(), reason="system PROJ database unavailable")
def test_new_family_wkt_roundtrip():
    """to_wkt() for registry-resolved polar/Mercator/foot-unit CRSs returns
    the authoritative WKT2 (the netCDF/GeoTIFF writers embed it), and it
    parses back to an equal CRS."""
    from pyorc_tpu.geom.crs import CRS

    for code in (3031, 3857, 2278, 5041):
        c = CRS.from_epsg(code)
        w = c.to_wkt()
        assert f'"EPSG",{code}' in w.replace(" ", ""), code
        c2 = CRS.from_user_input(w)
        assert c2 == c, f"EPSG:{code} WKT round-trip broke equality"
