"""Pallas megakernel (fused wind+PV+aggregation) vs the modular pipelines."""

import numpy as np
import pytest

import bench
import __graft_entry__ as ge
import jax

from atlite_tpu.ops.megakernel import wind_pv_bus_megakernel

PANEL = dict(k_1=-0.017162, k_2=-0.040289, k_3=-0.004681, k_4=0.000148,
             k_5=0.000169, k_6=0.000005, c_temp_irrad=0.035, c_temp_amb=1.0,
             r_tmod=298.0, r_irradiance=1000.0, inverter_efficiency=0.9)


@pytest.mark.parametrize("shape", [(48, 16, 24, 5), (30, 7, 13, 3)])
def test_megakernel_matches_xla_step(shape):
    T, Y, X, B = shape
    fields_np, eph_np, lon, lat, V, POWn, matrix = bench.build_inputs(T, Y, X, B)
    flat = {k: v.reshape(T, -1) for k, v in fields_np.items() if v.ndim == 3}
    lat_cell = np.repeat(lat, X)
    wb, pb = wind_pv_bus_megakernel(flat, lat_cell, matrix, V, POWn, PANEL,
                                    interpret=True)
    rw, rp = jax.jit(ge._step_fn())(
        {k: np.asarray(v, np.float32) for k, v in fields_np.items()},
        eph_np, lon, lat, V, POWn, matrix,
    )
    np.testing.assert_allclose(np.asarray(wb), np.asarray(rw), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(rp), atol=2e-5)


def test_megakernel_padding_edges():
    # shapes that do not divide the tile sizes exercise the padding path
    T, Y, X, B = 10, 3, 5, 2
    fields_np, eph_np, lon, lat, V, POWn, matrix = bench.build_inputs(T, Y, X, B)
    flat = {k: v.reshape(T, -1) for k, v in fields_np.items() if v.ndim == 3}
    lat_cell = np.repeat(lat, X)
    wb, pb = wind_pv_bus_megakernel(flat, lat_cell, matrix, V, POWn, PANEL,
                                    time_tile=8, cell_tile=8, interpret=True)
    assert wb.shape == (T, B) and pb.shape == (T, B)
    rw, rp = jax.jit(ge._step_fn())(
        {k: np.asarray(v, np.float32) for k, v in fields_np.items()},
        eph_np, lon, lat, V, POWn, matrix,
    )
    np.testing.assert_allclose(np.asarray(wb), np.asarray(rw), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(rp), atol=2e-5)
