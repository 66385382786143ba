"""2-D affine transforms for (possibly rotated) raster grids.

Replaces the subset of `rasterio.transform.Affine` the reference relies on
(reference ``pyorc/helpers.py:36-60`` affine_from_grid, ``:365-429`` fast
pixel<->map), in plain numpy. Convention matches rasterio:

    x = a*col + b*row + c
    y = d*col + e*row + f
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["Affine", "affine_from_grid", "pixel_to_map", "map_to_pixel", "affine_to_transform"]


class Affine:
    """Affine transform (a, b, c, d, e, f): pixel (col,row) -> map (x,y)."""

    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a, b, c, d, e, f):
        self.a, self.b, self.c, self.d, self.e, self.f = (float(v) for v in (a, b, c, d, e, f))

    @classmethod
    def translation(cls, tx, ty):
        return cls(1, 0, tx, 0, 1, ty)

    @classmethod
    def scale(cls, sx, sy=None):
        sy = sx if sy is None else sy
        return cls(sx, 0, 0, 0, sy, 0)

    def __mul__(self, other: "Affine") -> "Affine":
        a1, b1, c1, d1, e1, f1 = self
        a2, b2, c2, d2, e2, f2 = other
        return Affine(
            a1 * a2 + b1 * d2,
            a1 * b2 + b1 * e2,
            a1 * c2 + b1 * f2 + c1,
            d1 * a2 + e1 * d2,
            d1 * b2 + e1 * e2,
            d1 * c2 + e1 * f2 + f1,
        )

    def __iter__(self):
        return iter((self.a, self.b, self.c, self.d, self.e, self.f))

    def __invert__(self) -> "Affine":
        det = self.a * self.e - self.b * self.d
        ia, ib = self.e / det, -self.b / det
        id_, ie = -self.d / det, self.a / det
        ic = -(ia * self.c + ib * self.f)
        if_ = -(id_ * self.c + ie * self.f)
        return Affine(ia, ib, ic, id_, ie, if_)

    def __eq__(self, other):
        return isinstance(other, Affine) and tuple(self) == tuple(other)

    def __repr__(self):
        return f"Affine({self.a}, {self.b}, {self.c},\n       {self.d}, {self.e}, {self.f})"

    def to_gdal(self) -> Tuple[float, float, float, float, float, float]:
        return (self.c, self.a, self.b, self.f, self.d, self.e)

    def xy(self, rows, cols, offset: str = "center"):
        return pixel_to_map(cols, rows, self, offset=offset)

    def rowcol(self, xs, ys):
        cols, rows = map_to_pixel(xs, ys, self)
        return rows, cols


def affine_from_grid(xi: np.ndarray, yi: np.ndarray) -> Affine:
    """Affine of a (possibly rotated) regular grid from its 2-D coordinate rasters.

    Mirrors reference ``pyorc/helpers.py:36-60``: derive per-col and per-row
    steps from the first row/column of the coordinate grids; origin is placed
    half a cell before the first cell centre.
    """
    xi = np.asarray(xi, dtype=np.float64)
    yi = np.asarray(yi, dtype=np.float64)
    dx_col = (xi[0, -1] - xi[0, 0]) / (xi.shape[1] - 1)
    dy_col = (yi[0, -1] - yi[0, 0]) / (xi.shape[1] - 1)
    dx_row = (xi[-1, 0] - xi[0, 0]) / (xi.shape[0] - 1)
    dy_row = (yi[-1, 0] - yi[0, 0]) / (xi.shape[0] - 1)
    x0 = xi[0, 0] - 0.5 * dx_col - 0.5 * dx_row
    y0 = yi[0, 0] - 0.5 * dy_col - 0.5 * dy_row
    return Affine(dx_col, dx_row, x0, dy_col, dy_row, y0)


def pixel_to_map(cols, rows, transform: Affine, offset: str = "center"):
    """Fast vectorized pixel (col,row) -> map (x,y). Reference pyorc/helpers.py:365-389."""
    cols = np.asarray(cols, dtype=np.float64)
    rows = np.asarray(rows, dtype=np.float64)
    off = 0.5 if offset == "center" else 0.0
    a, b, c, d, e, f = transform
    x = a * (cols + off) + b * (rows + off) + c
    y = d * (cols + off) + e * (rows + off) + f
    return x, y


def map_to_pixel(xs, ys, transform: Affine):
    """Fast vectorized map (x,y) -> fractional pixel (col,row). Reference pyorc/helpers.py:392-429."""
    inv = ~transform
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    a, b, c, d, e, f = inv
    col = a * xs + b * ys + c
    row = d * xs + e * ys + f
    return col - 0.5, row - 0.5


def affine_to_transform(bbox_corners: np.ndarray, resolution: float) -> Affine:
    """Rotated affine fitting a bbox polygon's first edge direction at given resolution.

    Mirrors reference ``pyorc/cv.py:441-473`` (_get_transform): column axis runs
    along the first bbox edge (upstream-left -> downstream-left), row axis at
    -90 degrees from it.
    """
    corners = np.asarray(bbox_corners, dtype=np.float64)
    p1, p2 = corners[0], corners[1]
    diff = p2 - p1
    angle = np.arctan2(diff[1], diff[0])
    dx_col, dy_col = np.cos(angle) * resolution, np.sin(angle) * resolution
    dx_row = np.cos(angle + 1.5 * np.pi) * resolution
    dy_row = np.sin(angle + 1.5 * np.pi) * resolution
    return Affine(dx_col, dx_row, p1[0], dy_col, dy_row, p1[1])
