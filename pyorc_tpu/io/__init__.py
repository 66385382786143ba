"""IO backends: netCDF-4 (h5py), GeoTIFF, UGRID, video writers."""

from .netcdf import read_netcdf, write_netcdf

__all__ = ["read_netcdf", "write_netcdf", "to_geotiff", "to_ugrid"]


def to_geotiff(fn, data, transform, crs=None, **kwargs):
    """Write a raster as GeoTIFF (reference ``pyorc/io.py:141-163``; pure-Python
    writer here, see :mod:`pyorc_tpu.io.geotiff`)."""
    from .geotiff import write_geotiff

    return write_geotiff(fn, data, transform, crs=crs, **kwargs)


def to_ugrid(*args, **kwargs):
    """Write a velocimetry Dataset as a UGRID-1.0 mesh for QGIS (reference
    ``pyorc/io.py:166-312``; see :mod:`pyorc_tpu.io.ugrid`)."""
    from .ugrid import to_ugrid as _impl

    return _impl(*args, **kwargs)
