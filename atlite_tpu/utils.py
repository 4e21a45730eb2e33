"""Small utilities (reference: /root/reference/atlite/utils.py)."""

from __future__ import annotations

import logging


logger = logging.getLogger(__name__)

from atlite_tpu.resource import arrowdict  # noqa: F401  (re-export, utils.py:104)


class CachedAttribute:
    """Descriptor caching a computed attribute on first access
    (reference utils.py:128-155)."""

    def __init__(self, method, name=None, doc=None):
        self.method = method
        self.name = name or method.__name__
        self.__doc__ = doc or method.__doc__

    def __get__(self, inst, cls):
        if inst is None:
            return self
        result = self.method(inst)
        inst.__dict__[self.name] = result
        return result


def migrate_from_cutout_directory(old_cutout_dir, path):
    """Convert an old-style (pre-v0.2 atlite) cutout directory — one
    NetCDF per month plus a ``meta.nc`` — into a single new-style cutout
    file (reference utils.py:39-101), using the self-contained NetCDF
    decoders in atlite_tpu.io.

    Returns the migrated Cutout (opened from ``path``)."""
    from pathlib import Path

    import numpy as np

    from atlite_tpu.cutout import Cutout, _read_netcdf_cutout
    from atlite_tpu.datasets import modules as datamodules
    from atlite_tpu.io.netcdf import read_netcdf

    old_cutout_dir = Path(old_cutout_dir)
    _, _, meta_attrs = read_netcdf(old_cutout_dir / "meta.nc")
    module = meta_attrs["module"]

    monthly = sorted(p for p in old_cutout_dir.glob("[12]*.nc"))
    if not monthly:
        raise FileNotFoundError(
            f"no monthly [12]*.nc files found in {old_cutout_dir}"
        )
    parts = [_read_netcdf_cutout(p) for p in monthly]
    # combine by coords along time (reference uses open_mfdataset
    # combine='by_coords', utils.py:71-73)
    order = np.argsort([p[0]["time"][0] for p in parts])
    parts = [parts[i] for i in order]
    g0 = parts[0][0]
    for gk, _, _, _ in parts[1:]:
        if not (np.array_equal(gk["x"], g0["x"])
                and np.array_equal(gk["y"], g0["y"])):
            raise ValueError("monthly cutout files have mismatched grids")
    times = np.concatenate([p[0]["time"] for p in parts])
    data, var_attrs = {}, {}
    for name in parts[0][1]:
        dims = tuple(parts[0][3][name].get("dims", ("time", "y", "x")))
        if "time" in dims:
            axis = dims.index("time")
            data[name] = np.concatenate([p[1][name] for p in parts], axis=axis)
        else:
            data[name] = parts[0][1][name]
        var_attrs[name] = dict(parts[0][3][name])

    attrs = {k: v for k, v in meta_attrs.items() if k != "prepared_features"}
    attrs["module"] = module
    attrs["prepared_features"] = list(datamodules[module].features)
    for name in data:
        fd = datamodules[module].features.items()
        features = [k for k, l in fd if name in l]
        var_attrs[name]["module"] = module
        var_attrs[name]["feature"] = features.pop() if features else "undefined"

    path = Path(path).with_suffix(".nc")
    from atlite_tpu.core.grid import Grid

    cutout = Cutout(
        data=data, grid_desc=Grid(x=g0["x"], y=g0["y"], time=times, crs=4326),
        attrs=attrs, var_attrs=var_attrs,
    )
    cutout.to_netcdf(path)
    logger.info("Writing cutout data to %s. When done, load it again using "
                "atlite_tpu.Cutout(%r)", path, str(path))
    return Cutout(path)


def ensure_coords(index):
    """Normalize an index / mapping into a ``{name: pd.Index}`` coords dict
    (reference utils.py:22-36; no xarray here, so the return type is the
    coords mapping our DataArray consumes)."""
    import pandas as pd

    if isinstance(index, pd.MultiIndex):
        name = index.name or "dim_0"
        return {name: index}
    if isinstance(index, pd.Index):
        return {index.name or "dim_0": index}
    if isinstance(index, dict):
        return {k: pd.Index(v) for k, v in index.items()}
    raise ValueError(
        f"index must be a pandas index or a coords mapping, not: {index}"
    )


def timeindex_from_slice(timeslice):
    """Hourly DatetimeIndex spanning a slice of date strings, end month
    inclusive (reference utils.py:99-101)."""
    import pandas as pd

    end = pd.Timestamp(timeslice.stop) + pd.offsets.DateOffset(months=1)
    return pd.date_range(timeslice.start, end, freq="1h", inclusive="left")


def maybe_tqdm(iterable, **kwargs):
    """tqdm progress bar when available and enabled, else passthrough."""
    if not kwargs.pop("enable", True):
        return iterable
    try:
        from tqdm import tqdm

        return tqdm(iterable, **kwargs)
    except ImportError:
        return iterable
