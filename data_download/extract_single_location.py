"""Extract the nearest-gridpoint series at a target location.

CLI equivalent of ``/root/reference/data_download/extract_single_location.py``
(default 52.5N, 0E there): nearest latitude/longitude gridpoint of a gridded
``tas`` field, written as a single-location netCDF per input.

Usage:
    python data_download/extract_single_location.py OUT_DIR FILE [FILE ...]
        [--lat 52.5] [--lon 0.0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bayesian_ensembling_tpu.coords import DimArray
from bayesian_ensembling_tpu.io import netcdf

__all__ = ["extract_location"]


def extract_location(da: DimArray, lat: float, lon: float) -> DimArray:
    lats = da.get_coord("latitude").astype(np.float64)
    lons = da.get_coord("longitude").astype(np.float64)
    i = int(np.argmin(np.abs(lats - lat)))
    # Handle 0-360 vs -180..180 longitude conventions.
    dl = np.minimum(np.abs(lons - lon), np.abs(lons - lon - 360.0))
    dl = np.minimum(dl, np.abs(lons - lon + 360.0))
    j = int(np.argmin(dl))
    out = da.isel(latitude=i, longitude=j)
    out.name = (da.name or "tas") + "_single_location"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("files", nargs="+")
    ap.add_argument("--lat", type=float, default=52.5)
    ap.add_argument("--lon", type=float, default=0.0)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for f in args.files:
        da = netcdf.open_dataarray(f)
        out = extract_location(da, args.lat, args.lon)
        base = os.path.basename(f).replace(".nc", "_single_location.nc")
        path = os.path.join(args.out_dir, base)
        netcdf.save_dataarray(path, out, var_name="tas")
        print(path)


if __name__ == "__main__":
    main()
