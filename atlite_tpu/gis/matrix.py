"""Sparse spatial matrices: indicator and intersection.

Reference: /root/reference/atlite/gis.py:104-183.  There, an STRtree over
all grid-cell polygons feeds shapely polygon intersections.  Here the grid
is exploited directly: a shape's bbox maps to a (row, col) index window in
O(1), and the exact cell∩shape areas come from Sutherland–Hodgman clipping
against the cell boxes (cells ARE boxes) — no tree, no GEOS.

Cell (column) ordering is row-major over (y, x), matching the reference's
``cutout.grid`` stacking (cutout.py:355-376, aggregate.py:21-23).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from atlite_tpu.core.grid import Grid
from atlite_tpu.gis import geometry as G
from atlite_tpu.gis.crs import normalize_crs

# re-export for API parity (reference exposes spdiag from gis)
from atlite_tpu.aggregate import spdiag  # noqa: F401


def _iter_shapes(shapes):
    """Yield (label, Geometry) from a list/dict/pandas Series of geometries."""
    import pandas as pd

    if isinstance(shapes, pd.Series):
        items = shapes.items()
    elif isinstance(shapes, dict):
        items = shapes.items()
    elif isinstance(shapes, (G.Geometry,)) or hasattr(shapes, "__geo_interface__"):
        gi = getattr(shapes, "__geo_interface__", None)
        if isinstance(gi, dict) and gi.get("type") == "FeatureCollection":
            # GeoDataFrame-style input (reference gis.py:128-129 accepts
            # GeoDataFrames): iterate the rows, keep their ids
            items = [(f.get("id", i), f["geometry"])
                     for i, f in enumerate(gi["features"])]
        else:
            items = [(0, shapes)]
    else:
        items = enumerate(shapes)
    for k, v in items:
        yield k, G.parse_geometry(v)


def shapes_index(shapes):
    import pandas as pd

    if isinstance(shapes, pd.Series):
        return shapes.index
    if isinstance(shapes, dict):
        return pd.Index(list(shapes))
    if isinstance(shapes, G.Geometry) or hasattr(shapes, "__geo_interface__"):
        gi = getattr(shapes, "__geo_interface__", None)
        if isinstance(gi, dict) and gi.get("type") == "FeatureCollection":
            # must mirror _iter_shapes' per-feature iteration or the
            # matrix shape/row-index disagree (r4 review)
            return pd.Index([f.get("id", i)
                             for i, f in enumerate(gi["features"])])
        return pd.RangeIndex(1)
    return pd.RangeIndex(len(shapes))


def _grid_window(grid: Grid, bounds, pad=0):
    """Index window of grid cells whose boxes may overlap ``bounds``."""
    xmin, ymin, xmax, ymax = bounds
    dx2, dy2 = grid.dx / 2, grid.dy / 2
    i0 = np.searchsorted(grid.x, xmin - dx2 - pad, side="left")
    i1 = np.searchsorted(grid.x, xmax + dx2 + pad, side="right")
    j0 = np.searchsorted(grid.y, ymin - dy2 - pad, side="left")
    j1 = np.searchsorted(grid.y, ymax + dy2 + pad, side="right")
    return i0, i1, j0, j1


def _shape_window_areas(grid, geom):
    """(window indices, (wy, wx) area array) of |geom ∩ cell| over the
    geometry's grid window.  Uses the C++ engine when built (the
    Sutherland–Hodgman per-cell loop is the indicator-matrix hot path),
    numpy otherwise."""
    from atlite_tpu import native

    i0, i1, j0, j1 = _grid_window(grid, geom.bounds)
    wx, wy = i1 - i0, j1 - j0
    if wx <= 0 or wy <= 0:
        return i0, j0, np.zeros((0, 0))
    x0 = grid.x[i0] - grid.dx / 2
    y0 = grid.y[j0] - grid.dy / 2
    polys = geom.polygons if isinstance(geom, G.MultiPolygon) else [geom]
    if native.get_lib() is not None:
        areas = np.zeros((wy, wx))
        for p in polys:
            native.polygon_cell_areas(p, x0, grid.dx, wx, y0, grid.dy, wy,
                                      out=areas)
        return i0, j0, areas
    areas = np.zeros((wy, wx))
    for j in range(wy):
        ylo = y0 + j * grid.dy
        for i in range(wx):
            xlo = x0 + i * grid.dx
            areas[j, i] = G.polygon_box_area(geom, xlo, ylo, xlo + grid.dx,
                                             ylo + grid.dy)
    return i0, j0, areas


def compute_indicatormatrix(grid, shapes, orig_crs=4326, dest_crs=4326):
    """I[i, j] = |shape_i ∩ cell_j| / |cell_j| (reference gis.py:104-145).

    grid : atlite_tpu.core.grid.Grid (the cells, 'orig' in the reference)
    shapes : collection of polygons ('dest'), reprojected into orig_crs.
    """
    orig_crs, dest_crs = normalize_crs(orig_crs), normalize_crs(dest_crs)
    nx, ny = len(grid.x), len(grid.y)
    cell_area = grid.dx * grid.dy
    if cell_area == 0:
        # Grid.dx/dy are 0.0 for single-column/row grids; dividing the
        # overlap areas by 0 would emit inf entries silently
        raise ValueError(
            "indicator matrix needs a grid with at least 2 columns and "
            f"2 rows (dx={grid.dx}, dy={grid.dy})")
    rows, cols, vals = [], [], []
    for i, (_, geom) in enumerate(_iter_shapes(shapes)):
        if dest_crs != orig_crs:
            geom = G.transform_geometry(geom, dest_crs, orig_crs)
        i0, j0, areas = _shape_window_areas(grid, geom)
        jj, ii = np.nonzero(areas > 0)
        rows.extend([i] * len(jj))
        cols.extend(((jj + j0) * nx + (ii + i0)).tolist())
        vals.extend((areas[jj, ii] / cell_area).tolist())
    n_shapes = len(list(shapes_index(shapes)))
    return sp.coo_matrix(
        (vals, (rows, cols)), shape=(n_shapes, ny * nx), dtype=float
    ).tolil()


def compute_intersectionmatrix(grid, shapes, orig_crs=4326, dest_crs=4326):
    """Boolean shape/cell intersection matrix (reference gis.py:148-183)."""
    orig_crs, dest_crs = normalize_crs(orig_crs), normalize_crs(dest_crs)
    nx, ny = len(grid.x), len(grid.y)
    rows, cols, vals = [], [], []
    for i, (_, geom) in enumerate(_iter_shapes(shapes)):
        if dest_crs != orig_crs:
            geom = G.transform_geometry(geom, dest_crs, orig_crs)
        gb = geom.bounds  # hoisted: the property concatenates every ring
        i0, i1, j0, j1 = _grid_window(grid, gb)
        for j in range(j0, j1):
            ylo, yhi = grid.y[j] - grid.dy / 2, grid.y[j] + grid.dy / 2
            if gb[3] < ylo or gb[1] > yhi:
                continue
            for ii in range(i0, i1):
                xlo, xhi = grid.x[ii] - grid.dx / 2, grid.x[ii] + grid.dx / 2
                if gb[2] < xlo or gb[0] > xhi:
                    continue
                if G.geometry_intersects_box(geom, xlo, ylo, xhi, yhi):
                    rows.append(i)
                    cols.append(j * nx + ii)
                    vals.append(1.0)
    n_shapes = len(list(shapes_index(shapes)))
    return sp.coo_matrix(
        (vals, (rows, cols)), shape=(n_shapes, ny * nx), dtype=float
    ).tolil()
