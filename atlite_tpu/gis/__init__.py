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
    reproject_average,
    reproject_nearest,
)
from atlite_tpu.gis.regrid import Resampling, regrid
from atlite_tpu.core.grid import coordinate_range as get_coords  # reference gis.py:36


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
