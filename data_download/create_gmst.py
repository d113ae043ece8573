"""Create GMST (global-mean surface temperature) series from gridded tas.

CLI equivalent of ``/root/reference/data_download/create_GMST.py``: an
area-weighted (cos-latitude) mean over latitude/longitude of a gridded
``tas`` field, written back out as a netCDF GMST file per input.

Usage:
    python data_download/create_gmst.py OUT_DIR FILE [FILE ...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.io import netcdf

__all__ = ["area_weighted_mean", "create_gmst_file"]


def area_weighted_mean(da: DimArray) -> DimArray:
    """cos(latitude)-weighted mean over (latitude, longitude).

    Matches the reference's weighting (create_GMST.py:14-49): weights are
    cos(lat) broadcast over longitude, normalised over the spatial dims.
    """
    lat_ax = da.axis_of("latitude")
    lon_ax = da.axis_of("longitude")
    lat = da.get_coord("latitude").astype(np.float64)
    w = np.cos(np.deg2rad(lat))
    shape = [1] * da.ndim
    shape[lat_ax] = len(lat)
    w = w.reshape(shape)
    w = np.broadcast_to(w, da.shape)
    num = np.nansum(da.values * w, axis=(lat_ax, lon_ax))
    den = np.sum(
        np.where(np.isnan(da.values), 0.0, w), axis=(lat_ax, lon_ax)
    )
    out = num / den
    dims = tuple(d for d in da.dims if d not in ("latitude", "longitude"))
    coords = {k: v for k, v in da.coords.items() if k in dims}
    return DimArray(out, dims, coords, name=(da.name or "tas") + "_gmst")


def create_gmst_file(in_path: str, out_dir: str) -> str:
    da = netcdf.open_dataarray(in_path)
    gmst = area_weighted_mean(da)
    base = os.path.basename(in_path).replace(".nc", "_gmst.nc")
    out_path = os.path.join(out_dir, base)
    netcdf.save_dataarray(out_path, gmst, var_name="tas")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("files", nargs="+")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for f in args.files:
        out = create_gmst_file(f, args.out_dir)
        print(out)


if __name__ == "__main__":
    main()
