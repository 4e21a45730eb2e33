"""GIS subsystem — namespace mirroring the reference's flat ``atlite.gis``
module (/root/reference/atlite/gis.py) over this package's submodules."""

from atlite_tpu.gis.exclusion import (
    ExclusionContainer,
    compute_availabilitymatrix,
    shape_availability,
    shape_availability_reprojected,
)
from atlite_tpu.gis.matrix import (
    compute_indicatormatrix,
    compute_intersectionmatrix,
    spdiag,
)
from atlite_tpu.gis.raster import (
    Raster,
    geometry_mask,
    pad_extent,
    padded_transform_and_shape,
    projected_mask,
    reproject_average,
    reproject_nearest,
)
from atlite_tpu.gis.regrid import Resampling, regrid
from atlite_tpu.core.grid import coordinate_range as get_coords  # reference gis.py:36


def maybe_swap_spatial_dims(da, namex="x", namey="y"):
    """Normalize a DataArray to ascending x / ascending y coordinate order
    (reference gis.py:765-779)."""
    swaps = {}
    cx = da.coords[namex]
    cy = da.coords[namey]
    if len(cx) > 1 and cx[0] > cx[-1]:
        swaps[namex] = slice(None, None, -1)
    if len(cy) > 1 and cy[0] > cy[-1]:
        swaps[namey] = slice(None, None, -1)
    return da.isel(**swaps) if swaps else da


def reproject_shapes(shapes, crs1, crs2):
    """Project a collection of shapes between CRSs (reference gis.py:87-101)."""
    from atlite_tpu.gis.geometry import parse_geometry, transform_geometry

    import pandas as pd

    if isinstance(shapes, pd.Series):
        return shapes.map(lambda s: transform_geometry(parse_geometry(s), crs1, crs2))
    if isinstance(shapes, dict):
        return {k: transform_geometry(parse_geometry(v), crs1, crs2)
                for k, v in shapes.items()}
    return [transform_geometry(parse_geometry(s), crs1, crs2) for s in shapes]


__all__ = [
    "ExclusionContainer", "Raster", "Resampling",
    "compute_availabilitymatrix", "compute_indicatormatrix",
    "compute_intersectionmatrix", "geometry_mask", "pad_extent",
    "padded_transform_and_shape", "regrid", "reproject_average",
    "reproject_nearest", "reproject_shapes", "shape_availability",
    "shape_availability_reprojected", "spdiag",
]
