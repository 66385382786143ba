"""Coordinate reference systems without PROJ: WGS84 <-> UTM/Transverse Mercator.

The reference delegates CRS handling to pyproj/rasterio (reference
``pyorc/helpers.py:299-333,916-954``); neither is available here, so we
implement the one projection family river cameras actually use — UTM /
Transverse Mercator on WGS84 — with Karney's 6th-order Krüger series
(sub-millimetre accuracy), plus WKT/EPSG/proj4 string parsing sufficient to
read reference camera-config JSONs unchanged.
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
_E2 = _F * (2 - _F)
_E = math.sqrt(_E2)
_N = _F / (2 - _F)

# Krüger series coefficients (6th order in third flattening n)
_n = _N
_A_BAR = _A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)
_ALPHA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180 - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
        13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
        61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880 + 167603 * _n**6 / 181440,
        49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
        34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
        212378941 * _n**6 / 319334400,
    ]
)
_BETA = np.array(
    [
        _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360 - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
        _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105 - 1118711 * _n**6 / 3870720,
        17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480 + 5569 * _n**6 / 90720,
        4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
        4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
        20648693 * _n**6 / 638668800,
    ]
)


def _tm_forward(lon, lat, lon0, k0, fe, fn_) -> Tuple[np.ndarray, np.ndarray]:
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lam = lon - math.radians(lon0)
    s = np.sin(lat)
    # conformal latitude via Gauss-Schreiber tau
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    j = np.arange(1, 7)
    xi = xi_p + np.sum(_ALPHA * np.sin(2 * j * xi_p[..., None]) * np.cosh(2 * j * eta_p[..., None]), axis=-1)
    eta = eta_p + np.sum(_ALPHA * np.cos(2 * j * xi_p[..., None]) * np.sinh(2 * j * eta_p[..., None]), axis=-1)
    E = fe + k0 * _A_BAR * eta
    N = fn_ + k0 * _A_BAR * xi
    return E, N


def _tm_reverse(E, N, lon0, k0, fe, fn_) -> Tuple[np.ndarray, np.ndarray]:
    E = np.asarray(E, dtype=np.float64)
    N = np.asarray(N, dtype=np.float64)
    xi = (N - fn_) / (k0 * _A_BAR)
    eta = (E - fe) / (k0 * _A_BAR)
    j = np.arange(1, 7)
    xi_p = xi - np.sum(_BETA * np.sin(2 * j * xi[..., None]) * np.cosh(2 * j * eta[..., None]), axis=-1)
    eta_p = eta - np.sum(_BETA * np.cos(2 * j * xi[..., None]) * np.sinh(2 * j * eta[..., None]), axis=-1)
    t = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # invert conformal latitude: Newton on phi with tau(phi) = t
    phi = np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        tau = np.sinh(np.arcsinh(np.tan(phi)) - _E * np.arctanh(_E * s))
        dtau = (
            np.sqrt(1 + tau * tau)
            * (1 - _E2)
            / ((1 - _E2 * s * s) * np.cos(phi))
        )
        phi = phi - (tau - t) / dtau
    lon = np.degrees(lam + math.radians(lon0))
    lat = np.degrees(phi)
    return lon, lat


def utm_zone_from_lonlat(lon: float, lat: float) -> int:
    """EPSG code of the UTM zone containing (lon, lat)."""
    zone = int((lon + 180) // 6) + 1
    return (32600 if lat >= 0 else 32700) + zone


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
    ):
        self.epsg = epsg
        self.wkt = wkt
        self.lon0 = lon0
        self.k0 = k0
        self.false_easting = false_easting
        self.false_northing = false_northing
        self.geographic = geographic

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
        # generic transverse mercator: parse projection parameters
        if re.search(r"Transverse\s*_?Mercator", wkt, re.I):
            def param(names, default):
                for name in names:
                    m = re.search(rf'PARAMETER\s*\[\s*"{name}"\s*,\s*([-\d.eE+]+)', wkt, re.I)
                    if m:
                        return float(m.group(1))
                return default

            lon0 = param([r"Longitude of natural origin", r"central_meridian"], 0.0)
            k0 = param([r"Scale factor at natural origin", r"scale_factor"], 0.9996)
            fe = param([r"False easting", r"false_easting"], 500000.0)
            fn_ = param([r"False northing", r"false_northing"], 0.0)
            return cls(wkt=wkt, lon0=lon0, k0=k0, false_easting=fe, false_northing=fn_)
        if re.search(r"GEOGCR?S", wkt) and not re.search(r"PROJCR?S", wkt):
            crs = cls.from_epsg(4326)
            crs.wkt = wkt
            return crs
        raise NotImplementedError("only WGS84 geographic and Transverse Mercator WKT supported")

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
        return (
            self.geographic == other.geographic
            and self.lon0 == other.lon0
            and self.k0 == other.k0
            and self.false_easting == other.false_easting
            and self.false_northing == other.false_northing
        )

    def __repr__(self):
        if self.geographic:
            return "CRS(EPSG:4326)"
        return f"CRS(EPSG:{self.epsg or '?'}, TM lon0={self.lon0})"

    # -- transforms ------------------------------------------------------------

    def to_lonlat(self, x, y) -> Tuple[np.ndarray, np.ndarray]:
        if self.geographic:
            return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        return _tm_reverse(x, y, self.lon0, self.k0, self.false_easting, self.false_northing)

    def from_lonlat(self, lon, lat) -> Tuple[np.ndarray, np.ndarray]:
        if self.geographic:
            return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
        return _tm_forward(lon, lat, self.lon0, self.k0, self.false_easting, self.false_northing)


def transform_points(src: Union[CRS, int, str], dst: Union[CRS, int, str], x, y) -> Tuple[np.ndarray, np.ndarray]:
    """Transform coordinate arrays between two CRSs (always-xy axis order)."""
    src = CRS.from_user_input(src)
    dst = CRS.from_user_input(dst)
    if src == dst:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = src.to_lonlat(x, y)
    return dst.from_lonlat(lon, lat)
