"""Raster containers, rasterization and resampling primitives.

Replaces the GDAL/rasterio operations the reference delegates to native
libraries (/root/reference/atlite/gis.py:197-373 and SURVEY §2.3):

- ``Raster``: in-memory raster = array + affine transform + CRS + nodata,
  loadable from .npz (``data``/``transform``/``crs``/``nodata`` keys) — the
  framework's raster interchange format,
- ``geometry_mask``: polygon rasterization by pixel-center containment
  (rasterio.features.geometry_mask semantics, all_touched=False),
- ``reproject_nearest``: gather-based nearest resampling onto a target
  grid (rasterio ``Resampling.nearest`` default used by projected_mask),
- ``reproject_average``: area-average downsampling via scatter-mean
  (rasterio ``Resampling.average``; block-exact for integer ratios, the
  conformance case pinned by reference test/test_gis.py:251-292).

The scatter/gather formulations are chosen deliberately: they are the same
segment-sum primitives the TPU executes well, so the device variants in
atlite_tpu.gis.kernels share this exact math.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from atlite_tpu.core.grid import Affine
from atlite_tpu.gis import geometry as G
from atlite_tpu.gis.crs import normalize_crs, transform_points


@dataclass
class Raster:
    data: np.ndarray  # (rows, cols)
    transform: Affine  # pixel (col,row) -> (x,y) of pixel's top-left corner
    crs: object = 4326
    nodata: float = 255

    @property
    def shape(self):
        return self.data.shape

    @property
    def res(self):
        return abs(self.transform.a), abs(self.transform.e)

    @property
    def bounds(self):
        rows, cols = self.data.shape
        x0, y0 = self.transform * (0, 0)
        x1, y1 = self.transform * (cols, rows)
        return (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))

    def pixel_centers(self):
        rows, cols = self.data.shape
        cc, rr = np.meshgrid(np.arange(cols) + 0.5, np.arange(rows) + 0.5)
        x = self.transform.a * cc + self.transform.b * rr + self.transform.c
        y = self.transform.d * cc + self.transform.e * rr + self.transform.f
        return x, y

    @classmethod
    def open(cls, path):
        path = Path(path)
        if path.suffix == ".npz":
            z = np.load(path, allow_pickle=True)
            crs = z["crs"].item() if "crs" in z else 4326
            nodata = float(z["nodata"]) if "nodata" in z else 255
            return cls(z["data"], Affine(*np.asarray(z["transform"]).ravel()[:6]),
                       crs, nodata)
        raise ValueError(
            f"unsupported raster format {path.suffix!r}; use .npz with "
            "data/transform/crs/nodata entries"
        )

    def save(self, path):
        np.savez_compressed(
            path, data=self.data, transform=np.asarray(self.transform),
            crs=np.asarray(normalize_crs(self.crs)), nodata=self.nodata,
        )


def padded_transform_and_shape(bounds, res):
    """Snap bounds outward to the res lattice (reference gis.py:186-194)."""
    left, bottom = (np.floor(b / res) * res for b in bounds[:2])
    right, top = (np.floor(b / res) * res + res for b in bounds[2:])
    shape = int(round((top - bottom) / res)), int(round((right - left) / res))
    return Affine(res, 0, left, 0, -res, top), shape


def geometry_mask(geometries, shape, transform, invert=False):
    """True outside the geometries (rasterio.features.geometry_mask default);
    invert=True -> True inside.  Membership = pixel-center containment."""
    rows, cols = shape
    cc, rr = np.meshgrid(np.arange(cols) + 0.5, np.arange(rows) + 0.5)
    x = (transform.a * cc + transform.b * rr + transform.c).ravel()
    y = (transform.d * cc + transform.e * rr + transform.f).ravel()
    inside = np.zeros(rows * cols, dtype=bool)
    if isinstance(geometries, (G.Geometry,)) or hasattr(geometries, "__geo_interface__"):
        geometries = [geometries]
    for geom in geometries:
        geom = G.parse_geometry(geom)
        inside |= G.points_in_polygon(geom, x, y)
    inside = inside.reshape(rows, cols)
    return inside if invert else ~inside


def _dst_pixel_of_points(x, y, dst_transform, dst_shape):
    """Map point coords to integer dst pixel indices (or -1 outside)."""
    inv = dst_transform.inverse
    col = inv.a * x + inv.b * y + inv.c
    row = inv.d * x + inv.e * y + inv.f
    ci = np.floor(col).astype(np.int64)
    ri = np.floor(row).astype(np.int64)
    ok = (ci >= 0) & (ci < dst_shape[1]) & (ri >= 0) & (ri < dst_shape[0])
    return ri, ci, ok


def reproject_average(src: Raster, dst_transform, dst_crs, dst_shape,
                      nodata=np.nan):
    """Average-resample src onto the destination grid.

    Each source pixel center is projected into the destination CRS and
    contributes equally to the destination pixel containing it; destination
    pixels with no contributors get ``nodata``.  For integer downsampling
    ratios in a common CRS this is the exact block mean (the semantics the
    reference pins in test_gis.py:251-292).
    """
    x, y = src.pixel_centers()
    xd, yd = transform_points(x.ravel(), y.ravel(), src.crs, dst_crs)
    ri, ci, ok = _dst_pixel_of_points(xd, yd, dst_transform, dst_shape)
    vals = np.asarray(src.data, dtype=float).ravel()
    if src.nodata is not None and not np.isnan(src.nodata):
        ok &= vals != src.nodata
    ok &= ~np.isnan(vals)
    flat = ri[ok] * dst_shape[1] + ci[ok]
    sums = np.bincount(flat, weights=vals[ok], minlength=dst_shape[0] * dst_shape[1])
    counts = np.bincount(flat, minlength=dst_shape[0] * dst_shape[1])
    with np.errstate(invalid="ignore"):
        out = sums / counts
    out[counts == 0] = nodata
    return out.reshape(dst_shape)


def reproject_nearest(src: Raster, dst_transform, dst_crs, dst_shape,
                      nodata=None):
    """Nearest-neighbour resampling: destination pixel centers gather the
    enclosing source pixel's value (rasterio Resampling.nearest)."""
    nodata = src.nodata if nodata is None else nodata
    rows, cols = dst_shape
    cc, rr = np.meshgrid(np.arange(cols) + 0.5, np.arange(rows) + 0.5)
    x = dst_transform.a * cc + dst_transform.b * rr + dst_transform.c
    y = dst_transform.d * cc + dst_transform.e * rr + dst_transform.f
    xs, ys = transform_points(x.ravel(), y.ravel(), dst_crs, src.crs)
    inv = src.transform.inverse
    ci = np.floor(inv.a * xs + inv.b * ys + inv.c).astype(np.int64)
    ri = np.floor(inv.d * xs + inv.e * ys + inv.f).astype(np.int64)
    ok = (ci >= 0) & (ci < src.shape[1]) & (ri >= 0) & (ri < src.shape[0])
    out = np.full(rows * cols, nodata, dtype=np.asarray(src.data).dtype)
    out[ok] = np.asarray(src.data)[ri[ok], ci[ok]]
    return out.reshape(dst_shape)


def binary_dilation(mask: np.ndarray, iterations: int) -> np.ndarray:
    """4-connected binary dilation (scipy-compatible; reference gis.py:317)."""
    from scipy.ndimage import binary_dilation as _bd

    return _bd(mask, iterations=iterations)
