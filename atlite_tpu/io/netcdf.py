"""Unified NetCDF front door: magic-byte sniffing + CF time handling.

``read_netcdf`` accepts both NetCDF-3 classic files (CDF-1/CDF-2) and
NETCDF4 files (HDF5 container, as written by xarray's default engines —
what every existing reference-stack cutout is,
/root/reference/atlite/cutout.py:151-154).  ``write_netcdf`` emits
NetCDF-3 64-bit-offset, readable by every netCDF stack.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from atlite_tpu.io import netcdf3

_EPOCH_UNITS = ("seconds", "minutes", "hours", "days")


def decode_cf_time(values, units, calendar=None):
    """CF 'X since Y' numeric time -> datetime64[ns] (host-side; device
    code never sees datetimes)."""
    if calendar is not None and str(calendar).lower() not in (
            "standard", "gregorian", "proleptic_gregorian"):
        # 360_day/noleap/julian cannot be represented as datetime64;
        # silently decoding them drifts days-to-weeks within a year
        raise NotImplementedError(f"CF calendar {calendar!r}")
    parts = units.split(" since ")
    if len(parts) != 2:
        raise ValueError(f"unsupported time units {units!r}")
    step, epoch = parts[0].strip().lower(), parts[1].strip()
    if step not in _EPOCH_UNITS:
        raise ValueError(f"unsupported time step {step!r}")
    origin = pd.Timestamp(epoch)
    delta = pd.to_timedelta(np.asarray(values, dtype="float64"),
                            unit=step[0] if step != "minutes" else "m")
    return (origin + delta).values


def encode_cf_time(times, units="hours since 1900-01-01"):
    origin = pd.Timestamp(units.split(" since ")[1].strip())
    step = units.split(" since ")[0].strip().lower()
    ns = (pd.DatetimeIndex(times) - origin).values.astype("timedelta64[ns]")
    per = {"seconds": 1e9, "minutes": 6e10, "hours": 3.6e12, "days": 8.64e13}[step]
    return ns.astype("int64") / per


def unpack_cf(arr, vattrs):
    """Apply CF mask-and-scale (the xarray default): values equal to
    _FillValue/missing_value become NaN, then scale_factor/add_offset.
    Returns (array, attrs-with-packing-keys-removed); a no-op (same
    array) when no packing attrs are present.  Classic CDS NetCDF packs
    ERA5 fields as int16 with these attrs — using the raw integers is a
    silent misdecode (r4 review)."""
    vattrs = dict(vattrs or {})
    # mask BOTH codes (xarray masks _FillValue and missing_value; the
    # earlier nested-pop evaluated missing_value unconditionally and
    # masked only one of them, r4 review)
    fills = [v for v in (vattrs.pop("_FillValue", None),
                         vattrs.pop("missing_value", None)) if v is not None]
    scale = vattrs.pop("scale_factor", None)
    offset = vattrs.pop("add_offset", None)
    if not fills and scale is None and offset is None:
        return arr, vattrs
    a = np.asarray(arr)
    out = a.astype(np.float64)
    for fill in fills:
        if a.dtype.kind not in "iuf":
            continue
        try:
            out = np.where(a == a.dtype.type(fill), np.nan, out)
        except (TypeError, ValueError, OverflowError):
            pass  # malformed fill attr: keep values rather than crash
    if scale is not None:
        out = out * float(scale)
    if offset is not None:
        out = out + float(offset)
    return out, vattrs


def read_netcdf(path, decode_times=True):
    """Read any supported NetCDF file.

    Returns (dims, variables, attrs) with ``variables`` mapping name ->
    (dim_names, array, attrs).  With decode_times, a 1-D coordinate
    variable whose units attr matches CF 'X since Y' becomes
    datetime64[ns].
    """
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic[:3] == b"CDF":
        dims, variables, attrs = netcdf3.read(path)
    elif magic == b"\x89HDF\r\n\x1a\n":
        from atlite_tpu.io import hdf5

        dims, variables, attrs = hdf5.read_netcdf4(path)
    else:
        raise ValueError(f"{path}: not a recognized NetCDF file")
    if decode_times:
        out = {}
        for name, (dnames, arr, vattrs) in variables.items():
            units = vattrs.get("units")
            if (isinstance(units, str) and " since " in units
                    and np.asarray(arr).dtype.kind in "if"):
                try:
                    arr = decode_cf_time(arr, units, vattrs.get("calendar"))
                    vattrs = {k: v for k, v in vattrs.items()
                              if k not in ("units", "calendar")}
                except NotImplementedError:
                    # non-representable calendar (e.g. 360_day): keep the
                    # raw numbers + attrs rather than silently decoding
                    # them as proleptic-Gregorian or failing the file
                    pass
            out[name] = (dnames, arr, vattrs)
        variables = out
    return dims, variables, attrs


def write_netcdf(path, dims, variables, attrs=None, record_dim=None,
                 format="NETCDF3_64BIT", **kwargs):
    """Write a NetCDF file.

    format="NETCDF4" emits a compressed netCDF4/HDF5 file (the reference's
    on-disk cutout format, /root/reference/atlite/data.py:245-261, zlib
    complevel 4); "NETCDF3_64BIT" emits CDF-2.  datetime64 arrays are
    CF-encoded as 'hours since 1900-01-01' (int64 for NETCDF4 when
    lossless, float64 otherwise); NetCDF-3 additionally downcasts int64 to
    int32 when lossless (CDF-2 has no 64-bit integer type)."""
    netcdf4 = format.upper().startswith("NETCDF4")
    enc = {}
    for name, (dnames, arr, vattrs) in variables.items():
        arr = np.asarray(arr)
        vattrs = dict(vattrs or {})
        if arr.dtype.kind == "M":
            vattrs["units"] = "hours since 1900-01-01"
            vattrs["calendar"] = "proleptic_gregorian"
            arr = encode_cf_time(arr)
            if netcdf4:
                as64 = arr.astype(np.int64)
                if np.array_equal(as64, arr):
                    arr = as64
        elif arr.dtype.kind == "b":
            arr = arr.astype(np.int8)
        elif netcdf4:
            if arr.dtype == np.float16:
                arr = arr.astype(np.float32)
            # all other integer/float widths stored natively by HDF5
        elif arr.dtype == np.int64 or arr.dtype == np.uint32 \
                or arr.dtype == np.uint64:
            as32 = arr.astype(np.int32)
            arr = as32 if np.array_equal(as32, arr) else arr.astype(np.float64)
        elif arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        elif arr.dtype == np.uint16:
            arr = arr.astype(np.int32)
        elif arr.dtype == np.uint8:
            arr = arr.astype(np.int16)
        enc[name] = (dnames, arr, vattrs)
    if netcdf4:
        from atlite_tpu.io.hdf5_write import write_netcdf4

        write_netcdf4(path, dims, enc, attrs=attrs, **kwargs)
    else:
        netcdf3.write(path, dims, enc, attrs=attrs, record_dim=record_dim)
