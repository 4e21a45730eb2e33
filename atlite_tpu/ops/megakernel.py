"""Pallas megakernel: the full wind+PV capacity-factor pipeline with bus
aggregation in ONE pass over HBM.

XLA compiles the converter chain into several fused loops, but each branch
still materializes its CF field and the whole step runs ~2.7x above the
HBM bandwidth bound (PERF.md).  This kernel streams every weather field
tile-by-tile through VMEM exactly once and computes

    wind:  log-law hub-height extrapolation -> power curve (mask-and-sum)
    pv:    solar-position fast-lane -> latitude-optimal orientation ->
           Reindl decomposition via stored direct/diffuse -> simple
           transposition -> Huld panel
    both:  partial (time_tile, bus) matmuls accumulated across cell tiles

with zero intermediate HBM traffic: the only writes are the two (T, B)
bus series.  Grid = (time_tiles, cell_tiles), cells fastest, so the output
tile is revisited consecutively and accumulates in VMEM.


NOTE: the in-kernel dense bus aggregation spreads a NaN cell to
every bus (NaN * 0-weight); the production aggregate.py paths implement
the reference's sparse NaN semantics (only touching buses) — this
experimental kernel intentionally does not.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

FIELD_ORDER = (
    "wnd100m", "roughness", "solar_altitude", "solar_azimuth",
    "influx_toa", "influx_direct", "influx_diffuse", "albedo", "temperature",
)


def _curve_eval_unrolled(x, V, POWn):
    """Mask-and-sum piecewise-linear power curve, statically unrolled over
    the knots (V/POWn are python-float constants at trace time — Mosaic
    lowers this as pure elementwise VPU math, no vector constants, no
    gathers)."""
    V = [float(v) for v in V]
    POWn = [float(p) for p in POWn]
    out = jnp.zeros_like(x)
    for k in range(len(V) - 1):
        left, right = V[k], V[k + 1]
        if right == left:
            continue
        w = (x - left) / (right - left)
        val = POWn[k] * (1 - w) + POWn[k + 1] * w
        # [left, right) membership like physics/wind.power_curve: at a
        # duplicated cut-in/cut-out knot a query exactly on the knot
        # takes the POST-jump segment (np.interp semantics) — (left,
        # right] returned the pre-jump rated value at the cut-out speed
        out = out + jnp.where((x >= left) & (x < right), val, 0.0)
    out = out + (x < V[0]) * POWn[0] + (x >= V[-1]) * POWn[-1]
    return jnp.where(jnp.isnan(x), jnp.nan, out)  # NaN wind stays NaN


def wind_pv_bus_megakernel(fields, lat_cell, matrix, V, POWn, panel,
                           hub_height=80.0, time_tile=256, cell_tile=128,
                           interpret=False):
    """Fused wind+PV+aggregation.

    fields: dict of (T, C) f32 arrays (FIELD_ORDER keys); lat_cell: (C,)
    latitude per flattened cell [deg]; matrix: (B, C) dense aggregation
    weights.  Returns (wind_bus, pv_bus) each (T, B).
    """
    import jax.experimental.pallas as pl

    T, C = fields["wnd100m"].shape
    B = matrix.shape[0]
    nt = -(-T // time_tile)
    ncells = -(-C // cell_tile)
    T_pad, C_pad = nt * time_tile, ncells * cell_tile
    B_pad = max(128, -(-B // 128) * 128)

    def pad2(a):
        # EDGE padding, not zeros: zero roughness/influx in padded cells
        # produces NaN through the log-law, and NaN * (zero aggregation
        # weight) = NaN would poison the bus matmul now that the curve
        # eval propagates NaN like physics/wind.power_curve
        return jnp.pad(a, ((0, T_pad - T), (0, C_pad - C)), mode="edge")

    args = [pad2(jnp.asarray(fields[k])) for k in FIELD_ORDER]
    lat_p = jnp.pad(jnp.asarray(lat_cell, jnp.float32), (0, C_pad - C))[None, :]
    matT = jnp.pad(jnp.asarray(matrix, jnp.float32).T,
                   ((0, C_pad - C), (0, B_pad - B)))

    Vk = tuple(float(v) for v in np.asarray(V))  # static knots
    Pk = tuple(float(p) for p in np.asarray(POWn))
    k1, k2, k3 = panel["k_1"], panel["k_2"], panel["k_3"]
    k4, k5, k6 = panel["k_4"], panel["k_5"], panel["k_6"]
    c_ti = panel.get("c_temp_irrad", 0.035)
    c_ta = panel.get("c_temp_amb", 1.0)
    r_tmod = panel.get("r_tmod", 298.0)
    r_irr = panel.get("r_irradiance", 1000.0)
    inv_eff = panel.get("inverter_efficiency", 1.0)

    def kernel(wnd_ref, rough_ref, alt_ref, az_ref, toa_ref, dir_ref,
               dif_ref, alb_ref, temp_ref, lat_ref, mat_ref,
               outw_ref, outp_ref):
        c = pl.program_id(1)

        # ---- wind branch
        wnd = wnd_ref[...]
        z0 = rough_ref[...]
        hub = wnd * (jnp.log(hub_height / z0) / jnp.log(100.0 / z0))
        cf_w = _curve_eval_unrolled(hub, Vk, Pk)

        # ---- pv branch (latitude_optimal fixed orientation, simple model)
        alt = alt_ref[...]
        az = az_ref[...]
        latr = lat_ref[...] * (np.pi / 180.0)  # (1, cell_tile)
        a = jnp.abs(latr)
        slope = jnp.where(
            a <= np.radians(25.0), 0.87 * a,
            jnp.where(a <= np.radians(50.0), 0.76 * a + np.radians(0.31),
                      np.radians(40.0)),
        )
        pazim = jnp.where(latr < 0, 0.0, np.pi)
        sin_alt = jnp.sin(alt)
        cosinc = jnp.clip(
            jnp.sin(slope) * jnp.cos(alt) * jnp.cos(pazim - az)
            + jnp.cos(slope) * sin_alt, 0.0, None,
        )
        toa = toa_ref[...]
        direct = jnp.clip(dir_ref[...], 0.0, toa)
        diffuse = jnp.clip(dif_ref[...], 0.0, toa - direct)
        kg = cosinc / sin_alt
        influx = direct + diffuse
        cs = jnp.cos(slope)
        direct_t = kg * direct
        diffuse_t = (1.0 + cs) / 2.0 * diffuse
        ground_t = alb_ref[...] * influx * (1.0 - cs) / 2.0
        total = (jnp.nan_to_num(direct_t) + jnp.nan_to_num(diffuse_t)
                 + jnp.nan_to_num(ground_t))
        cap = (alt < np.radians(1.0)) | (influx <= 0.01)
        irr = jnp.where(cap, 0.0, total)
        T_ = (c_ta * temp_ref[...] + c_ti * irr) - r_tmod
        G_ = irr / r_irr
        logG = jnp.log(jnp.where(G_ > 0, G_, jnp.nan))
        eff = (1 + k1 * logG + k2 * logG * logG
               + T_ * (k3 + k4 * logG + k5 * logG * logG) + k6 * T_ * T_)
        eff = jnp.clip(jnp.nan_to_num(eff), 0.0, None)
        cf_p = G_ * eff * inv_eff

        # ---- bus aggregation partials
        @pl.when(c == 0)
        def _():
            outw_ref[...] = jnp.zeros_like(outw_ref)
            outp_ref[...] = jnp.zeros_like(outp_ref)

        m = mat_ref[...]
        outw_ref[...] += jnp.dot(cf_w, m, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        outp_ref[...] += jnp.dot(cf_p, m, preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

    field_spec = pl.BlockSpec((time_tile, cell_tile), lambda t, c: (t, c))
    outw, outp = pl.pallas_call(
        kernel,
        grid=(nt, ncells),
        in_specs=[field_spec] * 9 + [
            pl.BlockSpec((1, cell_tile), lambda t, c: (0, c)),      # lat
            pl.BlockSpec((cell_tile, B_pad), lambda t, c: (c, 0)),  # matT
        ],
        out_specs=[
            pl.BlockSpec((time_tile, B_pad), lambda t, c: (t, 0)),
            pl.BlockSpec((time_tile, B_pad), lambda t, c: (t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B_pad), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*args, lat_p, matT)
    return outw[:T, :B], outp[:T, :B]
