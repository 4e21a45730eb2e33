"""Static cutout grid descriptor.

TPU-first replacement for the coordinate handling in the reference
(/root/reference/atlite/gis.py:36-75 ``get_coords`` and the geometry
properties of /root/reference/atlite/cutout.py:252-376).  The grid is a plain
host-side dataclass of numpy arrays — everything shipped to the device is
derived from it as static-shape arrays (lon/lat broadcast fields, cell areas),
so jit traces see only concrete shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import NamedTuple

import numpy as np
import pandas as pd


class Affine(NamedTuple):
    """Row-major 2x3 affine transform, rasterio ``Affine`` convention:
    ``x = a*col + b*row + c``; ``y = d*col + e*row + f``."""

    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    def __mul__(self, colrow):
        col, row = colrow
        return (
            self.a * col + self.b * row + self.c,
            self.d * col + self.e * row + self.f,
        )

    @property
    def inverse(self):
        det = self.a * self.e - self.b * self.d
        a, b, c, d, e, f = self
        return Affine(e / det, -b / det, (b * f - e * c) / det,
                      -d / det, a / det, (d * c - a * f) / det)


def coordinate_range(x, y, time, dx=0.25, dy=0.25, dt="h"):
    """Build the (x, y, time) lattice for a new cutout.

    Mirrors the semantics of the reference ``get_coords``
    (/root/reference/atlite/gis.py:36-75): a global lattice
    ``arange(-180, 180, dx)`` / ``arange(-90, 90, dy)`` rounded to 9 decimals,
    then subset by inclusive label slices; time from a pandas date_range.
    """
    if isinstance(x, (tuple, list)):
        x = slice(*x)
    if isinstance(y, (tuple, list)):
        y = slice(*y)
    x0, x1 = sorted((float(x.start), float(x.stop)))
    y0, y1 = sorted((float(y.start), float(y.stop)))

    xs = np.round(np.arange(-180, 180, dx), 9)
    ys = np.round(np.arange(-90, 90, dy), 9)
    xs = xs[(xs >= x0) & (xs <= x1)]
    ys = ys[(ys >= y0) & (ys <= y1)]

    times = pd.date_range(start="1940", end="now", freq=dt)
    if isinstance(time, slice):
        # open endpoints select everything on that side ('times >= NaT'
        # would silently produce an EMPTY axis, pd.Timestamp(None) is NaT)
        lo = (times >= pd.Timestamp(time.start)) if time.start is not None \
            else np.ones(len(times), dtype=bool)
        hi = (times <= _end_of(time.stop)) if time.stop is not None \
            else np.ones(len(times), dtype=bool)
        times = times[lo & hi]
    elif isinstance(time, (list, tuple)) and len(time) == 2:
        times = times[(times >= pd.Timestamp(time[0])) & (times <= _end_of(time[1]))]
    else:
        # a partial string like "2011" or "2011-01-05" selects the whole period
        times = times[(times >= pd.Timestamp(str(time))) & (times <= _end_of(str(time)))]
    return xs.astype(float), ys.astype(float), times.values


def _end_of(label):
    """Inclusive end of a partial ISO label ("2011" -> 2011-12-31
    23:59:59.999..., like pandas label slicing).  Parsed via pd.Period so
    non-zero-padded forms ("2011-1", "2011-1-5") select the whole period
    too — length-based matching silently reduced them to one instant."""
    label = str(label).strip()
    ts = pd.Timestamp(label)
    import re as _re

    m = _re.fullmatch(r"(\d{4})(?:-(\d{1,2}))?(?:-(\d{1,2}))?", label)
    if m is None:
        # anything else ('2011Q1', explicit times, ...) is an instant —
        # treating e.g. a quarter label as its YEAR over-selected months
        return ts
    nparts = sum(1 for g in m.groups() if g is not None)
    freq = {1: "Y", 2: "M", 3: "D"}[nparts]
    per = pd.Period(label, freq=freq)
    if ts != per.start_time:
        return ts
    return per.end_time.floor("ns")


@dataclass(frozen=True, eq=False)
class Grid:
    """Immutable cutout coordinate system (cell centers).

    ``eq=False``: the generated dataclass __eq__ would compare ndarray
    fields ambiguously (ValueError) and make Grid unhashable; identity
    comparison + hashability is what cache keys need, and value equality
    goes through the explicit coords checks (Cutout.equals,
    store.update_store)."""

    x: np.ndarray  # (X,) float64, ascending cell-center longitudes / x
    y: np.ndarray  # (Y,) float64, ascending cell-center latitudes / y
    time: np.ndarray  # (T,) datetime64[ns]
    crs: int = 4326

    @property
    def shape(self):
        """(Y, X) — reference cutout.py:259-263."""
        return len(self.y), len(self.x)

    @property
    def ncells(self):
        return len(self.y) * len(self.x)

    @property
    def dx(self):
        x = self.x
        return round(float(x[-1] - x[0]) / (len(x) - 1), 8) if len(x) > 1 else 0.0

    @property
    def dy(self):
        y = self.y
        return round(float(y[-1] - y[0]) / (len(y) - 1), 8) if len(y) > 1 else 0.0

    @property
    def dt(self):
        idx = pd.DatetimeIndex(self.time)
        if len(idx) < 3:
            # pd.infer_freq needs >=3 stamps; fall back to the step
            if len(idx) == 2:
                return pd.tseries.frequencies.to_offset(
                    idx[1] - idx[0]).freqstr
            return None
        return pd.infer_freq(idx)

    @property
    def extent(self):
        """(xmin, xmax, ymin, ymax) of covered area — cutout.py:266-274."""
        dx, dy = self.dx, self.dy
        return np.array([self.x[0] - dx / 2, self.x[-1] + dx / 2,
                         self.y[0] - dy / 2, self.y[-1] + dy / 2])

    @property
    def bounds(self):
        """(xmin, ymin, xmax, ymax) — cutout.py:277-281."""
        return self.extent[[0, 2, 1, 3]]

    @property
    def transform(self):
        """Affine with positive (northward) dy — cutout.py:284-295."""
        return Affine(self.dx, 0, float(self.x[0]) - self.dx / 2,
                      0, self.dy, float(self.y[0]) - self.dy / 2)

    @property
    def transform_r(self):
        """Affine with negative dy (top-down row order) — cutout.py:297-309."""
        return Affine(self.dx, 0, float(self.x[0]) - self.dx / 2,
                      0, -self.dy, float(self.y[-1]) + self.dy / 2)

    @property
    def time_index(self):
        return pd.DatetimeIndex(self.time)

    # -- derived geometry ----------------------------------------------------
    def meshgrid(self):
        """(lon2d, lat2d) of cell centers, each (Y, X)."""
        return np.meshgrid(self.x, self.y)

    def cell_bounds(self):
        """(ncells, 4) [xmin, ymin, xmax, ymax] per cell, row-major over (y, x).

        Cell ordering matches the reference's ``cutout.grid`` GeoDataFrame
        (cutout.py:355-376): x fastest, y slowest.
        """
        xs, ys = self.meshgrid()
        cx, cy = xs.ravel(), ys.ravel()
        dx2, dy2 = self.dx / 2, self.dy / 2
        return np.column_stack([cx - dx2, cy - dy2, cx + dx2, cy + dy2])

    def cell_coords(self):
        """(ncells, 2) cell-center (x, y), row-major over (y, x)."""
        xs, ys = self.meshgrid()
        return np.column_stack([xs.ravel(), ys.ravel()])

    def sel(self, x=None, y=None, time=None):
        """Subset by inclusive label slices."""
        def _mask(vals, sl):
            if sl is None:
                return slice(None)
            lo, hi = sorted((sl.start, sl.stop)) if sl.start is not None and sl.stop is not None else (sl.start, sl.stop)
            m = np.ones(len(vals), dtype=bool)
            if lo is not None:
                m &= vals >= lo
            if hi is not None:
                m &= vals <= hi
            return m

        g = self
        if x is not None:
            g = replace(g, x=g.x[_mask(g.x, x)])
        if y is not None:
            g = replace(g, y=g.y[_mask(g.y, y)])
        if time is not None:
            ti = pd.DatetimeIndex(g.time)
            if isinstance(time, slice):
                m = np.ones(len(ti), dtype=bool)
                if time.start is not None:
                    m &= ti >= pd.Timestamp(time.start)
                if time.stop is not None:
                    m &= ti <= _end_of(time.stop)
            else:
                m = (ti >= pd.Timestamp(str(time))) & (ti <= _end_of(str(time)))
            g = replace(g, time=g.time[m])
        return g
