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
