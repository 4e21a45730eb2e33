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
    """Legacy (pre-v0.2 atlite) cutout directories stored one NetCDF per
    month (reference utils.py:39-101).  Reading NetCDF requires a decoder
    outside this build; decode externally and rebuild via
    ``Cutout(data=..., grid_desc=...)`` + ``to_file``."""
    raise NotImplementedError(
        "Legacy atlite cutout directories are NetCDF-based; decode them "
        "with xarray externally and ingest the arrays via "
        "Cutout(data=..., grid_desc=...).to_file(path)."
    )


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
