"""Coordinate reference systems without PROJ.

The reference delegates CRS handling to pyproj/rasterio (reference
``pyorc/helpers.py:299-333,916-954``); neither is available here, so we
implement the projection families river cameras actually use:

- UTM / Transverse Mercator on WGS84 — Karney's 6th-order Krüger series
  (sub-millimetre accuracy)
- Oblique Stereographic (EPSG method 9809, e.g. Dutch RD New / EPSG:28992)
  on arbitrary ellipsoids, with 7-parameter Helmert datum shifts to WGS84

plus WKT/EPSG/proj4 string parsing sufficient to read reference camera-config
JSONs unchanged. Unknown projected WKTs still parse (the pipeline runs
entirely in projected coordinates); only lon/lat conversion raises for them.
"""

from __future__ import annotations

import math
import re
from typing import Optional, Tuple, Union

import numpy as np

__all__ = ["CRS", "transform_points", "utm_zone_from_lonlat"]

# WGS84
_A = 6378137.0
_F = 1 / 298.257223563

_KRUGER_CACHE = {}


def _kruger_coeffs(a: float, f: float):
    """A-bar, alpha, beta Krüger series coefficients (6th order in n) for an ellipsoid."""
    key = (a, f)
    if key in _KRUGER_CACHE:
        return _KRUGER_CACHE[key]
    n = f / (2 - f)
    a_bar = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
    alpha = np.array(
        [
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180 - 127 * n**5 / 288 + 7891 * n**6 / 37800,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
            61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880 + 167603 * n**6 / 181440,
            49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
            34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
            212378941 * n**6 / 319334400,
        ]
    )
    beta = np.array(
        [
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360 - 81 * n**5 / 512 + 96199 * n**6 / 604800,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105 - 1118711 * n**6 / 3870720,
            17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480 + 5569 * n**6 / 90720,
            4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
            4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
            20648693 * n**6 / 638668800,
        ]
    )
    _KRUGER_CACHE[key] = (a_bar, alpha, beta)
    return a_bar, alpha, beta


def _tm_forward(lon, lat, lon0, k0, fe, fn_, a=_A, f=_F) -> Tuple[np.ndarray, np.ndarray]:
    a_bar, alpha, _ = _kruger_coeffs(a, f)
    e = math.sqrt(f * (2 - f))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lam = lon - math.radians(lon0)
    s = np.sin(lat)
    # conformal latitude via Gauss-Schreiber tau
    t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    j = np.arange(1, 7)
    xi = xi_p + np.sum(alpha * np.sin(2 * j * xi_p[..., None]) * np.cosh(2 * j * eta_p[..., None]), axis=-1)
    eta = eta_p + np.sum(alpha * np.cos(2 * j * xi_p[..., None]) * np.sinh(2 * j * eta_p[..., None]), axis=-1)
    E = fe + k0 * a_bar * eta
    N = fn_ + k0 * a_bar * xi
    return E, N


def _tm_reverse(E, N, lon0, k0, fe, fn_, a=_A, f=_F) -> Tuple[np.ndarray, np.ndarray]:
    a_bar, _, beta = _kruger_coeffs(a, f)
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    E = np.asarray(E, dtype=np.float64)
    N = np.asarray(N, dtype=np.float64)
    xi = (N - fn_) / (k0 * a_bar)
    eta = (E - fe) / (k0 * a_bar)
    j = np.arange(1, 7)
    xi_p = xi - np.sum(beta * np.sin(2 * j * xi[..., None]) * np.cosh(2 * j * eta[..., None]), axis=-1)
    eta_p = eta - np.sum(beta * np.cos(2 * j * xi[..., None]) * np.sinh(2 * j * eta[..., None]), axis=-1)
    t = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # invert conformal latitude: Newton on phi with tau(phi) = t
    phi = np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        tau = np.sinh(np.arcsinh(np.tan(phi)) - e * np.arctanh(e * s))
        dtau = np.sqrt(1 + tau * tau) * (1 - e2) / ((1 - e2 * s * s) * np.cos(phi))
        phi = phi - (tau - t) / dtau
    lon = np.degrees(lam + math.radians(lon0))
    lat = np.degrees(phi)
    return lon, lat


def utm_zone_from_lonlat(lon: float, lat: float) -> int:
    """EPSG code of the UTM zone containing (lon, lat)."""
    zone = int((lon + 180) // 6) + 1
    return (32600 if lat >= 0 else 32700) + zone


# -- Oblique Stereographic (EPSG 9809) on arbitrary ellipsoid ------------------------
# Formulas per EPSG Guidance Note 7-2 (double stereographic via conformal sphere).


class _ObliqueStereo:
    def __init__(self, a: float, inv_f: float, lat0: float, lon0: float, k0: float, fe: float, fn_: float):
        self.a = a
        self.f = 1.0 / inv_f
        self.e2 = self.f * (2 - self.f)
        self.e = math.sqrt(self.e2)
        self.lat0 = math.radians(lat0)
        self.lon0 = math.radians(lon0)
        self.k0 = k0
        self.fe = fe
        self.fn = fn_
        e, e2 = self.e, self.e2
        sp0 = math.sin(self.lat0)
        rho0 = a * (1 - e2) / (1 - e2 * sp0**2) ** 1.5
        nu0 = a / math.sqrt(1 - e2 * sp0**2)
        self.R = math.sqrt(rho0 * nu0)
        self.n = math.sqrt(1 + (e2 * math.cos(self.lat0) ** 4) / (1 - e2))
        S1 = (1 + sp0) / (1 - sp0)
        S2 = (1 - e * sp0) / (1 + e * sp0)
        w1 = (S1 * S2**e) ** self.n
        sin_chi0 = (w1 - 1) / (w1 + 1)
        self.c = (self.n + sp0) * (1 - sin_chi0) / ((self.n - sp0) * (1 + sin_chi0))
        w2 = self.c * w1
        self.chi0 = math.asin((w2 - 1) / (w2 + 1))
        self.Lam0 = self.lon0

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        e, n, c = self.e, self.n, self.c
        Lam = n * (lon - self.Lam0) + self.Lam0
        sp = np.sin(lat)
        Sa = (1 + sp) / (1 - sp)
        Sb = (1 - e * sp) / (1 + e * sp)
        w = c * (Sa * Sb**e) ** n
        chi = np.arcsin((w - 1) / (w + 1))
        B = 1 + np.sin(chi) * math.sin(self.chi0) + np.cos(chi) * math.cos(self.chi0) * np.cos(Lam - self.Lam0)
        E = self.fe + 2 * self.R * self.k0 * np.cos(chi) * np.sin(Lam - self.Lam0) / B
        N = self.fn + 2 * self.R * self.k0 * (
            np.sin(chi) * math.cos(self.chi0) - np.cos(chi) * math.sin(self.chi0) * np.cos(Lam - self.Lam0)
        ) / B
        return E, N

    def reverse(self, E, N):
        E = np.asarray(E, dtype=np.float64)
        N = np.asarray(N, dtype=np.float64)
        e, n, c = self.e, self.n, self.c
        Rk2 = 2 * self.R * self.k0
        g = Rk2 * math.tan(math.pi / 4 - self.chi0 / 2)
        h = 2 * Rk2 * math.tan(self.chi0) + g
        i = np.arctan2(E - self.fe, h + (N - self.fn))
        j = np.arctan2(E - self.fe, g - (N - self.fn)) - i
        chi = self.chi0 + 2 * np.arctan(((N - self.fn) - (E - self.fe) * np.tan(j / 2)) / Rk2)
        Lam = j + 2 * i + self.Lam0
        lon = (Lam - self.Lam0) / n + self.Lam0
        # isometric latitude from conformal latitude
        psi = 0.5 * np.log((1 + np.sin(chi)) / (c * (1 - np.sin(chi)))) / n
        phi = 2 * np.arctan(np.exp(psi)) - math.pi / 2
        for _ in range(8):
            sp = np.sin(phi)
            psi_i = np.log(np.tan(phi / 2 + math.pi / 4) * ((1 - e * sp) / (1 + e * sp)) ** (e / 2))
            phi = phi - (psi_i - psi) * np.cos(phi) * (1 - e2_of(e) * sp**2) / (1 - e2_of(e))
        return np.degrees(lon), np.degrees(phi)


def e2_of(e):
    return e * e


# -- geocentric conversions + Helmert (position-vector convention) --------------------


def _geodetic_to_geocentric(lon_deg, lat_deg, a, f, h=0.0):
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    e2 = f * (2 - f)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    X = (N + h) * np.cos(lat) * np.cos(lon)
    Y = (N + h) * np.cos(lat) * np.sin(lon)
    Z = (N * (1 - e2) + h) * np.sin(lat)
    return X, Y, Z


def _geocentric_to_geodetic(X, Y, Z, a, f):
    e2 = f * (2 - f)
    lon = np.arctan2(Y, X)
    p = np.sqrt(X**2 + Y**2)
    lat = np.arctan2(Z, p * (1 - e2))
    for _ in range(6):
        N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
        lat = np.arctan2(Z + e2 * N * np.sin(lat), p)
    return np.degrees(lon), np.degrees(lat)


def _helmert(X, Y, Z, p, inverse=False):
    """7-parameter Helmert (position-vector): tx ty tz [m], rx ry rz [arcsec], s [ppm]."""
    tx, ty, tz, rx, ry, rz, s = p
    rx, ry, rz = (np.radians(v / 3600.0) for v in (rx, ry, rz))
    m = 1 + s * 1e-6
    if not inverse:
        X2 = m * (X - rz * Y + ry * Z) + tx
        Y2 = m * (rz * X + Y - rx * Z) + ty
        Z2 = m * (-ry * X + rx * Y + Z) + tz
        return X2, Y2, Z2
    Xs, Ys, Zs = X - tx, Y - ty, Z - tz
    X1 = (Xs + rz * Ys - ry * Zs) / m
    Y1 = (-rz * Xs + Ys + rx * Zs) / m
    Z1 = (ry * Xs - rx * Ys + Zs) / m
    return X1, Y1, Z1


# well-known datum shifts to WGS84 (position-vector towgs84 parameters)
_TOWGS84 = {
    "Amersfoort": (565.2369, 50.0087, 465.658, -0.406857, 0.350733, -1.87035, 4.0812),
}

_ELLIPSOIDS = {
    "Bessel 1841": (6377397.155, 299.1528128),
    "WGS 84": (6378137.0, 298.257223563),
    "GRS 1980": (6378137.0, 298.257222101),
    "International 1924": (6378388.0, 297.0),
    "Clarke 1880 (IGN)": (6378249.2, 293.4660212936269),
}


class CRS:
    """A coordinate reference system: WGS84 geographic or WGS84/UTM (TM) projected."""

    def __init__(
        self,
        epsg: Optional[int] = None,
        wkt: Optional[str] = None,
        lon0: Optional[float] = None,
        k0: float = 0.9996,
        false_easting: float = 500000.0,
        false_northing: float = 0.0,
        geographic: bool = False,
        stereo: Optional["_ObliqueStereo"] = None,
        towgs84: Optional[tuple] = None,
        ellipsoid: tuple = (6378137.0, 298.257223563),
        opaque_projected: bool = False,
    ):
        self.epsg = epsg
        self.wkt = wkt
        self.lon0 = lon0
        self.k0 = k0
        self.false_easting = false_easting
        self.false_northing = false_northing
        self.geographic = geographic
        self.stereo = stereo
        self.towgs84 = towgs84
        self.ellipsoid = ellipsoid
        self.opaque_projected = opaque_projected

    # -- constructors ------------------------------------------------------------

    @classmethod
    def from_user_input(cls, value: Union["CRS", int, str, None]) -> Optional["CRS"]:
        if value is None:
            return None
        if isinstance(value, CRS):
            return value
        if isinstance(value, (int, np.integer)):
            return cls.from_epsg(int(value))
        if isinstance(value, str):
            s = value.strip()
            m = re.match(r"^EPSG:(\d+)$", s, re.I)
            if m:
                return cls.from_epsg(int(m.group(1)))
            if s.isdigit():
                return cls.from_epsg(int(s))
            if s.startswith("+") or "proj=" in s:
                return cls._from_proj4(s)
            if "[" in s:  # WKT
                return cls._from_wkt(s)
        raise ValueError(f"cannot interpret CRS from {value!r}")

    @classmethod
    def from_epsg(cls, code: int) -> "CRS":
        if code == 4326:
            return cls(epsg=4326, geographic=True)
        if 32601 <= code <= 32660:
            zone = code - 32600
            return cls(epsg=code, lon0=zone * 6 - 183, false_northing=0.0)
        if 32701 <= code <= 32760:
            zone = code - 32700
            return cls(epsg=code, lon0=zone * 6 - 183, false_northing=10000000.0)
        if code == 28992:  # Amersfoort / RD New (Dutch national grid)
            a, inv_f = _ELLIPSOIDS["Bessel 1841"]
            stereo = _ObliqueStereo(
                a, inv_f, lat0=52.1561605555556, lon0=5.38763888888889, k0=0.9999079, fe=155000.0, fn_=463000.0
            )
            return cls(epsg=code, stereo=stereo, ellipsoid=(a, inv_f), towgs84=_TOWGS84["Amersfoort"])
        raise NotImplementedError(
            f"EPSG:{code} not supported — supported CRS: EPSG:4326 (WGS84) and WGS84/UTM "
            f"zones (EPSG:326xx/327xx), which cover standard river-camera georeferencing"
        )

    @classmethod
    def _from_proj4(cls, s: str) -> "CRS":
        if "proj=utm" in s:
            zone = int(re.search(r"zone=(\d+)", s).group(1))
            south = "+south" in s
            return cls.from_epsg((32700 if south else 32600) + zone)
        if "proj=longlat" in s or "proj=latlong" in s:
            return cls.from_epsg(4326)
        raise NotImplementedError(f"proj4 string not supported: {s}")

    @classmethod
    def _from_wkt(cls, wkt: str) -> "CRS":
        # the authority ID of the whole CRS is the LAST top-level ID/AUTHORITY entry
        ids = re.findall(r'(?:ID|AUTHORITY)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', wkt)
        if ids:
            try:
                crs = cls.from_epsg(int(ids[-1]))
                crs.wkt = wkt
                return crs
            except NotImplementedError:
                pass
        def param(names, default):
            for name in names:
                m = re.search(rf'PARAMETER\s*\[\s*"{name}"\s*,\s*([-\d.eE+]+)', wkt, re.I)
                if m:
                    return float(m.group(1))
            return default

        def ellipsoid_of():
            m = re.search(r'ELLIPSOID\s*\[\s*"([^"]+)"\s*,\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)', wkt)
            if m:
                return float(m.group(2)), float(m.group(3))
            m = re.search(r'SPHEROID\s*\[\s*"([^"]+)"\s*,\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)', wkt)
            if m:
                return float(m.group(2)), float(m.group(3))
            return 6378137.0, 298.257223563

        def datum_shift():
            m = re.search(r'DATUM\s*\[\s*"([^"]+)"', wkt)
            if m and m.group(1) in _TOWGS84:
                return _TOWGS84[m.group(1)]
            m = re.search(r"TOWGS84\s*\[([^\]]+)\]", wkt)
            if m:
                vals = [float(v) for v in m.group(1).split(",")]
                return tuple(vals + [0.0] * (7 - len(vals)))
            return None

        # generic transverse mercator: parse projection parameters
        if re.search(r"Transverse\s*_?Mercator", wkt, re.I):
            lon0 = param([r"Longitude of natural origin", r"central_meridian"], 0.0)
            k0 = param([r"Scale factor at natural origin", r"scale_factor"], 0.9996)
            fe = param([r"False easting", r"false_easting"], 500000.0)
            fn_ = param([r"False northing", r"false_northing"], 0.0)
            return cls(
                wkt=wkt,
                lon0=lon0,
                k0=k0,
                false_easting=fe,
                false_northing=fn_,
                ellipsoid=ellipsoid_of(),
                towgs84=datum_shift(),
            )
        if re.search(r"Oblique[\s_]*Stereographic", wkt, re.I):
            a, inv_f = ellipsoid_of()
            stereo = _ObliqueStereo(
                a,
                inv_f,
                lat0=param([r"Latitude of natural origin", r"latitude_of_origin"], 0.0),
                lon0=param([r"Longitude of natural origin", r"central_meridian"], 0.0),
                k0=param([r"Scale factor at natural origin", r"scale_factor"], 1.0),
                fe=param([r"False easting", r"false_easting"], 0.0),
                fn_=param([r"False northing", r"false_northing"], 0.0),
            )
            ids = re.findall(r'(?:ID|AUTHORITY)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', wkt)
            return cls(
                epsg=int(ids[-1]) if ids else None,
                wkt=wkt,
                stereo=stereo,
                ellipsoid=(a, inv_f),
                towgs84=datum_shift(),
            )
        if re.search(r"GEOGCR?S", wkt) and not re.search(r"PROJCR?S", wkt):
            crs = cls.from_epsg(4326)
            crs.wkt = wkt
            return crs
        if re.search(r"PROJCR?S", wkt):
            # unknown projection family: the pipeline runs entirely in projected
            # coordinates; only lon/lat conversion is unavailable.
            return cls(wkt=wkt, opaque_projected=True)
        raise NotImplementedError("unsupported WKT CRS")

    # -- properties ------------------------------------------------------------

    @property
    def is_geographic(self) -> bool:
        return self.geographic

    @property
    def is_projected(self) -> bool:
        return not self.geographic

    def to_wkt(self) -> str:
        if self.wkt:
            return self.wkt
        if self.geographic:
            return (
                'GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
                'ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],'
                'PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],'
                "CS[ellipsoidal,2],"
                'AXIS["geodetic latitude (Lat)",north,ORDER[1],ANGLEUNIT["degree",0.0174532925199433]],'
                'AXIS["geodetic longitude (Lon)",east,ORDER[2],ANGLEUNIT["degree",0.0174532925199433]],'
                'ID["EPSG",4326]]'
            )
        name = f"WGS 84 / UTM zone {self._zone_name()}" if self.epsg else "WGS 84 / custom TM"
        idtail = f',ID["EPSG",{self.epsg}]' if self.epsg else ""
        return (
            f'PROJCRS["{name}",BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
            f'ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],'
            f'PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],ID["EPSG",4326]],'
            f'CONVERSION["Transverse Mercator",METHOD["Transverse Mercator",ID["EPSG",9807]],'
            f'PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],'
            f'PARAMETER["Longitude of natural origin",{self.lon0},ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],'
            f'PARAMETER["Scale factor at natural origin",{self.k0},SCALEUNIT["unity",1],ID["EPSG",8805]],'
            f'PARAMETER["False easting",{self.false_easting},LENGTHUNIT["metre",1],ID["EPSG",8806]],'
            f'PARAMETER["False northing",{self.false_northing},LENGTHUNIT["metre",1],ID["EPSG",8807]]],'
            f'CS[Cartesian,2],AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],'
            f'AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]{idtail}]'
        )

    def _zone_name(self) -> str:
        if self.epsg and 32601 <= self.epsg <= 32660:
            return f"{self.epsg - 32600}N"
        if self.epsg and 32701 <= self.epsg <= 32760:
            return f"{self.epsg - 32700}S"
        return "?"

    def __eq__(self, other) -> bool:
        if not isinstance(other, CRS):
            try:
                other = CRS.from_user_input(other)
            except Exception:
                return NotImplemented
        if self.geographic and other.geographic:
            return True
        if self.epsg is not None and other.epsg is not None:
            return self.epsg == other.epsg
        if self.opaque_projected or other.opaque_projected:
            return self.wkt == other.wkt
        if (self.stereo is None) != (other.stereo is None):
            return False
        if self.stereo is not None:
            s, o = self.stereo, other.stereo
            return (s.lat0, s.lon0, s.k0, s.fe, s.fn, s.a, s.f) == (o.lat0, o.lon0, o.k0, o.fe, o.fn, o.a, o.f)
        return (
            self.geographic == other.geographic
            and self.lon0 == other.lon0
            and self.k0 == other.k0
            and self.false_easting == other.false_easting
            and self.false_northing == other.false_northing
            and self.ellipsoid == other.ellipsoid
        )

    def __repr__(self):
        if self.geographic:
            return "CRS(EPSG:4326)"
        return f"CRS(EPSG:{self.epsg or '?'}, TM lon0={self.lon0})"

    # -- transforms ------------------------------------------------------------
    # to_lonlat / from_lonlat speak WGS84 lon/lat; non-WGS84 datums are bridged
    # with a 7-parameter Helmert shift when known.

    def _datum_to_wgs84(self, lon, lat):
        if self.towgs84 is None:
            return lon, lat
        a, inv_f = self.ellipsoid
        X, Y, Z = _geodetic_to_geocentric(lon, lat, a, 1.0 / inv_f)
        X, Y, Z = _helmert(X, Y, Z, self.towgs84)
        return _geocentric_to_geodetic(X, Y, Z, _A, _F)

    def _datum_from_wgs84(self, lon, lat):
        if self.towgs84 is None:
            return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
        X, Y, Z = _geodetic_to_geocentric(lon, lat, _A, _F)
        X, Y, Z = _helmert(X, Y, Z, self.towgs84, inverse=True)
        a, inv_f = self.ellipsoid
        return _geocentric_to_geodetic(X, Y, Z, a, 1.0 / inv_f)

    def to_lonlat(self, x, y) -> Tuple[np.ndarray, np.ndarray]:
        if self.geographic:
            return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        if self.opaque_projected:
            raise NotImplementedError(
                "lon/lat conversion for this projected CRS is not supported (unknown projection "
                "method in WKT); the velocimetry pipeline itself runs fully in projected coordinates"
            )
        if self.stereo is not None:
            lon, lat = self.stereo.reverse(x, y)
        else:
            a, inv_f = self.ellipsoid
            lon, lat = _tm_reverse(
                x, y, self.lon0, self.k0, self.false_easting, self.false_northing, a=a, f=1.0 / inv_f
            )
        return self._datum_to_wgs84(lon, lat)

    def from_lonlat(self, lon, lat) -> Tuple[np.ndarray, np.ndarray]:
        if self.geographic:
            return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
        if self.opaque_projected:
            raise NotImplementedError(
                "lon/lat conversion for this projected CRS is not supported (unknown projection "
                "method in WKT)"
            )
        lon, lat = self._datum_from_wgs84(lon, lat)
        if self.stereo is not None:
            return self.stereo.forward(lon, lat)
        a, inv_f = self.ellipsoid
        return _tm_forward(lon, lat, self.lon0, self.k0, self.false_easting, self.false_northing, a=a, f=1.0 / inv_f)


def transform_points(src: Union[CRS, int, str], dst: Union[CRS, int, str], x, y) -> Tuple[np.ndarray, np.ndarray]:
    """Transform coordinate arrays between two CRSs (always-xy axis order)."""
    src = CRS.from_user_input(src)
    dst = CRS.from_user_input(dst)
    if src == dst:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = src.to_lonlat(x, y)
    return dst.from_lonlat(lon, lat)
