"""C++ geometry engine vs numpy fallback parity."""

import numpy as np
import pytest

from atlite_tpu import native
from atlite_tpu.gis import geometry as G

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib not built")


def test_polygon_cell_areas_with_hole():
    poly = G.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                     [[(4, 4), (6, 4), (6, 6), (4, 6)]])
    out = native.polygon_cell_areas(poly, 0.0, 1.0, 10, 0.0, 1.0, 10)
    ref = np.array([[G.polygon_box_area(poly, i, j, i + 1, j + 1)
                     for i in range(10)] for j in range(10)])
    np.testing.assert_allclose(out, ref, atol=1e-12)
    assert np.isclose(out.sum(), poly.area)


def test_polygon_cell_areas_irregular():
    rng = np.random.default_rng(0)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 17))
    rad = rng.uniform(1, 4, 17)
    poly = G.Polygon(np.c_[np.cos(ang) * rad + 5, np.sin(ang) * rad + 5])
    out = native.polygon_cell_areas(poly, 0.0, 0.7, 15, 0.0, 0.7, 15)
    ref = np.array([[G.polygon_box_area(poly, i * 0.7, j * 0.7,
                                        (i + 1) * 0.7, (j + 1) * 0.7)
                     for i in range(15)] for j in range(15)])
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_points_in_polygon_parity():
    poly = G.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                     [[(4, 4), (6, 4), (6, 6), (4, 6)]])
    rng = np.random.default_rng(1)
    xs = rng.uniform(-1, 11, 5000)
    ys = rng.uniform(-1, 11, 5000)
    nat = native.points_in_polygon(poly, xs, ys).astype(bool)
    ref = G.points_in_polygon(poly, xs, ys)
    np.testing.assert_array_equal(nat, ref)


def test_indicatormatrix_native_vs_numpy(cutout, monkeypatch):
    import scipy.sparse as sp

    from atlite_tpu.gis.geometry import box

    shapes = [box(-3.6, 56.3, -0.2, 59.1), box(-1.0, 58.0, 1.2, 61.7)]
    m_native = sp.csr_matrix(cutout.indicatormatrix(shapes))

    import atlite_tpu.native as nat

    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", True)
    m_numpy = sp.csr_matrix(cutout.indicatormatrix(shapes))
    assert (m_native != m_numpy).nnz == 0 or np.allclose(
        m_native.toarray(), m_numpy.toarray(), atol=1e-12
    )


def test_r4_geometry_review_fixes():
    """r4 review: Feature dicts parse, FeatureCollections iterate in
    matrix building, exact ring closure keeps near-duplicate vertices at
    meter scale, hole-edge/point-line box contact, empty hole rings are
    safe, and degenerate grids refuse."""
    import numpy as np
    import pytest

    from atlite_tpu.gis import geometry as G
    from atlite_tpu.gis.matrix import _iter_shapes

    # Feature unwrapping + FeatureCollection refusal with a clear error
    feat = {"type": "Feature", "properties": {},
            "geometry": {"type": "Point", "coordinates": (1.0, 2.0)}}
    p = G.parse_geometry(feat)
    assert isinstance(p, G.Point) and p.x == 1.0
    with pytest.raises(TypeError, match="FeatureCollection"):
        G.parse_geometry({"type": "FeatureCollection", "features": []})

    # GeoDataFrame-style FeatureCollection input iterates per row
    class FakeGDF:
        __geo_interface__ = {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "id": "a",
                 "geometry": {"type": "Point", "coordinates": (0.0, 0.0)}},
                {"type": "Feature", "id": "b",
                 "geometry": {"type": "Point", "coordinates": (1.0, 1.0)}},
            ],
        }

    got = list(_iter_shapes(FakeGDF()))
    assert [k for k, _ in got] == ["a", "b"]

    # exact ring closure: a distinct vertex 36 m from the start at
    # EPSG:3035-meter scale must survive (np.allclose dropped it)
    ring = [(4500000.0, 3000000.0), (4510000.0, 3000000.0),
            (4510000.0, 3010000.0), (4500030.0, 3000020.0)]
    poly = G.Polygon(ring)
    assert len(poly.shell) == 4

    # hole-edge contact: box inside a hole sharing the hole's edge
    holed = G.Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                      holes=[[(2, 2), (8, 2), (8, 8), (2, 8)]])
    assert G.geometry_intersects_box(holed, 2, 4, 3, 5)
    # one-point LineString inside the box
    assert G.geometry_intersects_box(G.LineString([(5, 5)]), 0, 0, 10, 10)

    # empty hole ring must not crash (or OOB-read in the C++ kernel)
    weird = G.Polygon([(0, 0), (4, 0), (4, 4), (0, 4)], holes=[[]])
    from atlite_tpu.gis.raster import geometry_mask
    from atlite_tpu.core.grid import Affine

    mask = geometry_mask([weird], (8, 8), Affine(1, 0, -2, 0, -1, 6),
                         invert=True)
    assert mask.sum() > 0

    # degenerate single-column grid refuses the indicator matrix
    from atlite_tpu.core.grid import Grid
    from atlite_tpu.gis.matrix import compute_indicatormatrix

    g1 = Grid(x=np.array([0.0]), y=np.arange(4.0),
              time=np.array(["2013-01-01"], dtype="datetime64[ns]"))
    with pytest.raises(ValueError, match="at least 2"):
        compute_indicatormatrix(g1, [G.box(-1, 0, 1, 2)])


def test_featurecollection_matrix_shape_and_index():
    """r4 final review: FeatureCollection inputs must give shapes_index
    consistent with _iter_shapes (the mismatch crashed coo_matrix)."""
    import numpy as np

    from atlite_tpu.core.grid import Grid
    from atlite_tpu.gis.matrix import compute_indicatormatrix

    class FakeGDF:
        __geo_interface__ = {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "id": "a",
                 "geometry": {"type": "Polygon", "coordinates":
                              [[(0, 0), (2, 0), (2, 2), (0, 2)]]}},
                {"type": "Feature", "id": "b",
                 "geometry": {"type": "Polygon", "coordinates":
                              [[(2, 0), (4, 0), (4, 2), (2, 2)]]}},
            ],
        }

    g = Grid(x=np.arange(0.5, 4, 1.0), y=np.arange(0.5, 4, 1.0),
             time=np.array(["2013-01-01"], dtype="datetime64[ns]"))
    I = compute_indicatormatrix(g, FakeGDF())
    assert I.shape == (2, 16)
    assert np.isclose(I.sum(), 8.0)  # each feature covers 4 full cells
