"""Hydro: basin graph, runoff routing, inflow (model: reference
hydro.py semantics + test_preparation_and_conversion.py:360-378)."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu.physics.hydro import (
    determine_basins,
    find_upstream_basins,
    travel_hours,
)
from atlite_tpu.gis.geometry import box


@pytest.fixture(scope="module")
def hydrobasins():
    """Three-basin cascade: 30 (upstream) -> 20 -> 10 (downstream)."""
    return pd.DataFrame({
        "HYBAS_ID": [10, 20, 30],
        "NEXT_DOWN": [0, 10, 20],
        "DIST_MAIN": [100.0, 150.0, 230.0],  # km along main river
        "geometry": [
            box(-3.0, 56.5, -1.5, 58.0),
            box(-1.5, 56.5, 0.0, 58.0),
            box(0.0, 56.5, 1.5, 58.0),
        ],
    })


@pytest.fixture(scope="module")
def plants():
    return pd.DataFrame({"lon": [-2.25], "lat": [57.25]}, index=["plant0"])


def test_upstream_bfs(hydrobasins):
    meta = hydrobasins.set_index("HYBAS_ID")
    ups = find_upstream_basins(meta["NEXT_DOWN"], 10)
    assert ups == [10, 20, 30]
    assert find_upstream_basins(meta["NEXT_DOWN"], 30) == [30]


def test_determine_basins(hydrobasins, plants):
    basins = determine_basins(plants, hydrobasins)
    assert basins.plants.loc["plant0", "hid"] == 10
    assert basins.plants.loc["plant0", "upstream"] == [10, 20, 30]
    assert list(basins.shapes.index) == [10, 20, 30]


def test_travel_hours(hydrobasins, plants):
    meta = hydrobasins.set_index("HYBAS_ID")
    n = travel_hours(meta["DIST_MAIN"], 10, [10, 20, 30], flowspeed=1)
    # distances 0, 50, 130 km at 3.6 km/h -> 0, 14, 36 h
    np.testing.assert_array_equal(n, [0, 14, 36])


def test_hydro_inflow(cutout_week, hydrobasins, plants):
    inflow = cutout_week.hydro(plants, hydrobasins, flowspeed=1)
    assert inflow.dims == ("plant", "time")
    vals = np.asarray(inflow.values)
    assert vals.shape == (1, 7 * 24)
    assert np.all(vals >= 0)
    assert vals.max() > 0


def test_hydro_inflow_matches_manual_roll(cutout_week, hydrobasins, plants):
    """Inflow equals the sum of per-basin runoff rolled by travel time."""
    import scipy.sparse as sp

    from atlite_tpu.aggregate import spdiag

    basins = determine_basins(plants, hydrobasins)
    matrix = sp.csr_matrix(cutout_week.indicatormatrix(basins.shapes))
    row_sums = np.asarray(matrix.sum(axis=1)).ravel()
    mn = spdiag(np.where(row_sums != 0, 1 / np.where(row_sums != 0, row_sums, 1), 0)) @ matrix
    runoff = cutout_week.runoff(matrix=mn, index=basins.shapes.index,
                                weight_with_height=False)
    from atlite_tpu.physics.hydro import basin_areas_m2

    areas = basin_areas_m2(basins)
    r = np.asarray(runoff.values) * areas[:, None]
    meta = hydrobasins.set_index("HYBAS_ID")
    n = travel_hours(meta["DIST_MAIN"], 10, [10, 20, 30], flowspeed=1)
    expected = sum(np.roll(r[i], n[i]) for i in range(3))

    inflow = cutout_week.hydro(plants, hydrobasins, flowspeed=1,
                               weight_with_height=False)
    np.testing.assert_allclose(np.asarray(inflow.values)[0], expected, rtol=1e-8)


def test_hydro_basin_areas_plausible(hydrobasins, plants):
    from atlite_tpu.physics.hydro import basin_areas_m2

    basins = determine_basins(plants, hydrobasins)
    areas = basin_areas_m2(basins)
    # 1.5 deg x 1.5 deg at 57N: ~ 1.5*111km * 1.5*60km ~ 1.5e10 m2
    assert np.all(areas > 5e9) and np.all(areas < 5e10)
