"""Plotting for frames, velocimetry fields and transects.

Covers the reference's three plot perspectives (reference ``pyorc/api/plot.py``):
``local`` (ortho metres), ``geographical`` (lon/lat) and ``camera`` (vectors
re-projected into the original camera image by displacing each point by
dt*v and projecting both ends — reference plot.py:552-604).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import helpers

__all__ = ["frames_plot", "_Velocimetry_PlotMethods", "_Transect_PlotMethods"]


def _get_ax(ax=None, figsize=(13, 8)):
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=figsize)
    return ax


def _geo_ax(obj, ax=None, tiles=None, zoom_level=18, tiles_kwargs=None):
    """Axes for geographical mode, with an optional XYZ basemap underneath
    (reference plot.py builds cartopy GeoAxes with image tilers; here the
    self-contained fetcher in io/basemap draws onto a plain lon/lat axes)."""
    ax = _get_ax(ax)
    if tiles is not None and "lon" in obj.coords:
        import warnings

        from ..io import basemap

        lon = obj["lon"].values
        lat = obj["lat"].values
        pad_lon = max((np.nanmax(lon) - np.nanmin(lon)) * 0.25, 1e-4)
        pad_lat = max((np.nanmax(lat) - np.nanmin(lat)) * 0.25, 1e-4)
        extent = (
            float(np.nanmin(lon) - pad_lon),
            float(np.nanmax(lon) + pad_lon),
            float(np.nanmin(lat) - pad_lat),
            float(np.nanmax(lat) + pad_lat),
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # offline fallback stays quiet here
            basemap.add_basemap(ax, extent, tiles=tiles, zoom_level=zoom_level, **(tiles_kwargs or {}))
    return ax


def frames_plot(da, ax=None, mode: str = "local", **kwargs):
    """Plot a single frame in the chosen perspective."""
    ax = _get_ax(ax)
    vals = np.asarray(da.data)
    if mode == "camera":
        x = da["xp"].values if "xp" in da.coords else np.arange(vals.shape[-1])
        y = da["yp"].values if "yp" in da.coords else np.arange(vals.shape[-2])
        ax.pcolormesh(x, y, vals, **({"cmap": "gray"} | kwargs))
    elif mode == "geographical":
        ax.pcolormesh(da["lon"].values, da["lat"].values, vals, **({"cmap": "gray"} | kwargs))
    else:
        ax.pcolormesh(da["xs"].values, da["ys"].values, vals, **({"cmap": "gray"} | kwargs))
    ax.set_aspect("equal")
    return ax


class _BasePlot:
    def __init__(self, ref):
        self.ref = ref
        self._obj = ref._obj

    def _mode_ax(self, mode, ax, kwargs):
        """Pop tile kwargs and build the right axes for the plot mode."""
        tiles = kwargs.pop("tiles", None)
        zoom_level = kwargs.pop("zoom_level", 18)
        tiles_kwargs = kwargs.pop("tiles_kwargs", None)
        if mode == "geographical":
            return _geo_ax(self._obj, ax, tiles=tiles, zoom_level=zoom_level, tiles_kwargs=tiles_kwargs)
        return _get_ax(ax)

    def _coords(self, mode: str):
        obj = self._obj
        if mode == "local":
            return obj["x"].values, obj["y"].values, "1d"
        if mode == "geographical":
            return obj["lon"].values, obj["lat"].values, "2d"
        if mode == "camera":
            return obj["xp"].values, obj["yp"].values, "2d"
        raise ValueError(f"mode {mode} unknown")

    def _uv(self, mode: str):
        u = self._obj["v_x"].values
        v = self._obj["v_y"].values
        if u.ndim == 3:  # reduce time if present
            u = np.nanmean(u, axis=0)
            v = np.nanmean(v, axis=0)
        if mode == "camera":
            # displace each grid point by dt*v in world coords and project both
            # ends to the camera to get image-space vectors
            cc = self.ref.camera_config
            xs = self._obj["xs"].values
            ys = self._obj["ys"].values
            z = cc.get_z_a(self.ref.h_a)
            dt = 0.1
            pts0 = np.column_stack([xs.ravel(), ys.ravel(), np.full(xs.size, z)])
            pts1 = np.column_stack(
                [(xs + u * dt).ravel(), (ys + v * dt).ravel(), np.full(xs.size, z)]
            )
            p0 = cc.project_points(pts0, swap_y_coords=True)
            p1 = cc.project_points(pts1, swap_y_coords=True)
            u_c = ((p1[:, 0] - p0[:, 0]) / dt).reshape(xs.shape)
            v_c = ((p1[:, 1] - p0[:, 1]) / dt).reshape(xs.shape)
            return u_c, v_c
        if mode == "geographical":
            # rotate to east/north components
            aff = helpers.affine_from_grid(self._obj["xs"].values, self._obj["ys"].values)
            theta = np.arctan2(aff[3], aff[0])
            return helpers.rotate_u_v(u, v, theta)
        return u, v


class _Velocimetry_PlotMethods(_BasePlot):
    def __call__(self, method: str = "quiver", mode: str = "local", ax=None, add_colorbar: bool = False, **kwargs):
        return getattr(self, method)(mode=mode, ax=ax, add_colorbar=add_colorbar, **kwargs)

    # (u, v, s) accessors per projection, reference plot.py:426-604
    def get_uv_local(self):
        u, v = self._uv("local")
        return u, v, np.hypot(u, v)

    def get_uv_geographical(self):
        u, v = self._uv("geographical")
        return u, v, np.hypot(u, v)

    def get_uv_camera(self, dt: float = 0.1):
        u_loc, v_loc = self._uv("local")
        u, v = self._uv("camera")
        return u, v, np.hypot(u_loc, v_loc)

    def quiver(self, mode="local", ax=None, add_colorbar=False, **kwargs):
        ax = self._mode_ax(mode, ax, kwargs)
        x, y, kind = self._coords(mode)
        u, v = self._uv(mode)
        s = np.hypot(u, v)
        if kind == "1d":
            x, y = np.meshgrid(x, y)
        p = ax.quiver(x, y, u, v, s, **kwargs)
        if add_colorbar:
            ax.figure.colorbar(p, ax=ax)
        return ax

    def pcolormesh(self, mode="local", ax=None, add_colorbar=False, **kwargs):
        ax = self._mode_ax(mode, ax, kwargs)
        x, y, kind = self._coords(mode)
        u, v = self._uv(mode)
        s = np.hypot(u, v)
        p = ax.pcolormesh(x, y, s, **kwargs)
        if add_colorbar:
            ax.figure.colorbar(p, ax=ax)
        return ax

    def scatter(self, mode="local", ax=None, add_colorbar=False, **kwargs):
        ax = self._mode_ax(mode, ax, kwargs)
        x, y, kind = self._coords(mode)
        u, v = self._uv(mode)
        s = np.hypot(u, v)
        if kind == "1d":
            x, y = np.meshgrid(x, y)
        p = ax.scatter(x.ravel(), y.ravel(), c=s.ravel(), **kwargs)
        if add_colorbar:
            ax.figure.colorbar(p, ax=ax)
        return ax

    def streamplot(self, mode="local", ax=None, add_colorbar=False, **kwargs):
        if mode != "local":
            raise ValueError("streamplot only works in local mode")
        ax = _get_ax(ax)
        x, y, _ = self._coords(mode)
        u, v = self._uv(mode)
        # streamplot requires increasing y
        order = np.argsort(y)
        p = ax.streamplot(x, y[order], u[order], v[order], **kwargs)
        if add_colorbar and hasattr(p, "lines"):
            ax.figure.colorbar(p.lines, ax=ax)
        return ax


class _Transect_PlotMethods(_BasePlot):
    def __call__(self, method: str = "quiver", mode: str = "local", ax=None, **kwargs):
        return getattr(self, method)(mode=mode, ax=ax, **kwargs)

    # (u, v, s) accessors per projection, reference plot.py:363-469:
    # u = v_eff sin(v_dir), v = v_eff cos(v_dir); geographical rotates by the
    # grid transform's angle; camera projects displaced point pairs
    def _uv_eff(self):
        obj = self._obj
        if "v_eff" in obj:
            v_eff = obj["v_eff"].values
        else:
            if "v_eff_nofill" not in obj:
                obj.transect.vector_to_scalar()  # adds v_eff_nofill in place
            v_eff = obj["v_eff_nofill"].values
            if v_eff.ndim == 2:  # (time, points): reduce for plotting
                import warnings as _w

                with _w.catch_warnings():
                    _w.simplefilter("ignore", RuntimeWarning)
                    v_eff = np.nanmedian(v_eff, axis=0)
        u = v_eff * np.sin(obj["v_dir"].values)
        v = v_eff * np.cos(obj["v_dir"].values)
        return u, v, v_eff

    def get_uv_local(self):
        return self._uv_eff()

    def get_uv_geographical(self):
        u, v, s = self._uv_eff()
        aff = self.ref.camera_config.transform
        theta = np.arctan2(aff[1], aff[0])
        u, v = helpers.rotate_u_v(u, v, theta)
        return u, v, s

    def get_uv_camera(self, dt: float = 0.1):
        u, v, s = self._uv_eff()
        if u.ndim == 2:  # quantile dim: median row for displacement geometry
            u = u[u.shape[0] // 2]
            v = v[v.shape[0] // 2]
        cc = self.ref.camera_config
        x = self._obj["x"].values
        y = self._obj["y"].values
        z = cc.h_to_z(self.ref.h_a)
        cols0, rows0 = x / cc.resolution, cc.shape[0] - y / cc.resolution
        cols1, rows1 = (x + u * dt) / cc.resolution, cc.shape[0] - (y + v * dt) / cc.resolution
        xs0, ys0 = helpers.get_xs_ys(cols0, rows0, cc.transform)
        xs1, ys1 = helpers.get_xs_ys(cols1, rows1, cc.transform)
        p0 = cc.project_points(np.column_stack([xs0, ys0, np.full(x.shape, z)]), swap_y_coords=True)
        p1 = cc.project_points(np.column_stack([xs1, ys1, np.full(x.shape, z)]), swap_y_coords=True)
        return (p1[:, 0] - p0[:, 0]) / dt, (p1[:, 1] - p0[:, 1]) / dt, s

    def _points_uv(self, mode):
        obj = self._obj
        u = obj["v_eff" if "v_eff" in obj else "v_x"].values
        v_dir = obj["v_dir"].values
        if u.ndim == 2:  # quantile dim present: take median row
            u = u[u.shape[0] // 2]
        # decompose effective velocity along flow direction
        vx = u * np.sin(v_dir + 0.5 * np.pi)
        vy = u * np.cos(v_dir + 0.5 * np.pi)
        return vx, vy

    def quiver(self, mode="local", ax=None, add_colorbar=False, **kwargs):
        ax = self._mode_ax(mode, ax, kwargs)
        obj = self._obj
        if mode == "camera":
            cc = self.ref.camera_config
            x = obj["xcoords"].values
            y = obj["ycoords"].values
            z = np.full(len(x), cc.get_z_a(self.ref.h_a))
            vx, vy = self._points_uv(mode)
            dt = 0.1
            p0 = cc.project_points(np.column_stack([x, y, z]), swap_y_coords=True)
            p1 = cc.project_points(np.column_stack([x + vx * dt, y + vy * dt, z]), swap_y_coords=True)
            u_c = (p1[:, 0] - p0[:, 0]) / dt
            v_c = (p1[:, 1] - p0[:, 1]) / dt
            p = ax.quiver(p0[:, 0], p0[:, 1], u_c, v_c, np.abs(self._obj["v_eff" if "v_eff" in obj else "v_x"].values[-1]), **kwargs)
        else:
            x = obj["xcoords"].values
            y = obj["ycoords"].values
            vx, vy = self._points_uv(mode)
            p = ax.quiver(x, y, vx, vy, np.hypot(vx, vy), **kwargs)
        if add_colorbar:
            ax.figure.colorbar(p, ax=ax)
        return ax
