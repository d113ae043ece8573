"""IO: netCDF (h5py) reading/writing, CF time utilities."""

from bayesian_ensembling_tpu.io import netcdf, timeutils
from bayesian_ensembling_tpu.io.netcdf import open_dataarray, save_dataarray

__all__ = ["netcdf", "timeutils", "open_dataarray", "save_dataarray"]
