"""Self-contained scientific-format IO (no netCDF4/HDF5/eccodes C deps).

The reference delegates cutout persistence and GRIB decoding to native
libraries (netCDF4/h5netcdf + eccodes/cfgrib — reference cutout.py:151-154,
datasets/era5.py:352-429).  This package implements the formats directly:

- netcdf3:  NetCDF classic / 64-bit-offset reader AND writer
- hdf5:     pure-python HDF5 reader subset (NETCDF4-model files)
- netcdf:   unified front door (magic-byte sniffing) + CF time handling
- grib2:    GRIB2 edition-2 decoder (+ encoder used for fixtures)
"""

from atlite_tpu.io.netcdf import read_netcdf, write_netcdf  # noqa: F401
