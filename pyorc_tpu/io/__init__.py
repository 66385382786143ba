"""IO backends: netCDF-4 (h5py), GeoTIFF, UGRID, video writers."""

from .netcdf import read_netcdf, write_netcdf

__all__ = ["read_netcdf", "write_netcdf"]
