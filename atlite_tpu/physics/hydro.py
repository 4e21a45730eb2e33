"""Hydro runoff routing — device kernel + host graph logic.

Parity with /root/reference/atlite/hydro.py:23-104: upstream-basin BFS on
the HydroBASINS NEXT_DOWN graph (host), then per-plant inflow as the sum of
time-shifted upstream-basin runoff.

TPU-native restructuring: the reference's python double loop with
``runoff.roll(time=n)`` per (plant, basin) pair (hydro.py:89-102) becomes a
flat (pair,) gather with modular time indices plus one segment-sum over
plants — a single fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


from collections import namedtuple

Basins = namedtuple("Basins", ["plants", "meta", "shapes"])


def find_basin(shapes: pd.Series, lon, lat):
    """Basin containing the point (hydro.py:23-30)."""
    from atlite_tpu.gis.geometry import parse_geometry

    hids = [
        hid for hid, geom in shapes.items()
        if parse_geometry(geom).contains_point(lon, lat)
    ]
    if len(hids) > 1:
        import logging

        logging.getLogger(__name__).warning(
            f"The point ({lon}, {lat}) is in several basins: {hids}. "
            "Assuming the first one."
        )
    if not hids:
        raise ValueError(f"No basin found for point ({lon}, {lat})")
    return hids[0]


def determine_basins(plants: pd.DataFrame, hydrobasins: pd.DataFrame,
                     show_progress=False) -> Basins:
    """Find each plant's basin and its upstream set (hydro.py:42-78).

    hydrobasins: DataFrame with columns HYBAS_ID, DIST_MAIN, NEXT_DOWN and
    'geometry' (engine geometries or __geo_interface__ objects).
    """
    missing = {"HYBAS_ID", "DIST_MAIN", "NEXT_DOWN", "geometry"}.difference(
        hydrobasins.columns
    )
    assert not missing, (
        f"Couldn't find the column(s) {', '.join(missing)} in the "
        "hydrobasins dataset."
    )
    hydrobasins = hydrobasins.set_index("HYBAS_ID")
    meta = hydrobasins[hydrobasins.columns.difference(("geometry",))]
    shapes = hydrobasins["geometry"]

    plant_basins = []
    for p in plants.itertuples():
        hid = find_basin(shapes, p.lon, p.lat)
        plant_basins.append((hid, find_upstream_basins(meta["NEXT_DOWN"], hid)))
    plant_basins = pd.DataFrame(
        plant_basins, columns=["hid", "upstream"], index=plants.index
    )
    unique_basins = pd.Index(plant_basins["upstream"].sum()).unique().rename("hid")
    return Basins(plant_basins, meta.loc[unique_basins], shapes.loc[unique_basins])


def basin_areas_m2(basins: Basins) -> np.ndarray:
    """Basin areas on the equal-area cylindrical projection [m^2]
    (reference: shapes.to_crs(dict(proj='cea')).area, convert.py:1145)."""
    from atlite_tpu.gis.geometry import parse_geometry, transform_geometry

    areas = []
    for geom in basins.shapes.values:
        g = transform_geometry(parse_geometry(geom), 4326, "cea")
        areas.append(g.area)
    return np.asarray(areas)


def inflow_for_plants(basins: Basins, runoff_da, flowspeed=1):
    """Per-plant inflow via the device shift/aggregate kernel
    (hydro.py:81-104)."""
    from atlite_tpu.dataarray import DataArray

    hid_index = pd.Index(basins.shapes.index)
    pair_plant, pair_basin, pair_shift = [], [], []
    for pi, ppl in enumerate(basins.plants.itertuples()):
        nhours = travel_hours(basins.meta["DIST_MAIN"], ppl.hid, ppl.upstream,
                              flowspeed)
        for b, n in zip(ppl.upstream, nhours):
            pair_plant.append(pi)
            pair_basin.append(hid_index.get_loc(b))
            pair_shift.append(int(n))
    inflow = shift_and_aggregate(
        jnp.asarray(np.asarray(runoff_da.values)),
        jnp.asarray(pair_plant, dtype=jnp.int32),
        jnp.asarray(pair_basin, dtype=jnp.int32),
        jnp.asarray(pair_shift, dtype=jnp.int32),
        len(basins.plants),
    )
    return DataArray(
        np.asarray(inflow),
        coords={"plant": basins.plants.index, "time": runoff_da.coords["time"]},
        dims=("plant", "time"),
    )


def shift_and_aggregate_runoff_for_plants(basins: Basins, runoff,
                                          flowspeed=1, show_progress=False):
    """Reference-named wrapper (hydro.py:81-104) around the device
    shift/aggregate kernel; ``show_progress`` is accepted for signature
    parity (the whole shift/sum runs as one jitted kernel here)."""
    del show_progress
    return inflow_for_plants(basins, runoff, flowspeed)


def find_upstream_basins(next_down: pd.Series, hid) -> list:
    """BFS over the NEXT_DOWN graph (hydro.py:33-39)."""
    hids = [hid]
    i = 0
    while i < len(hids):
        hids.extend(next_down.index[next_down == hids[i]])
        i += 1
    return hids


def travel_hours(dist_main: pd.Series, plant_hid, upstream, flowspeed) -> np.ndarray:
    """Water travel time basin->plant in whole hours (hydro.py:95-99)."""
    distances = dist_main.loc[upstream].values - dist_main.at[plant_hid]
    return (distances / (flowspeed * 3.6) + 0.5).astype(int)


def shift_and_aggregate(runoff, pair_plant, pair_basin, pair_shift, n_plants):
    """Per-plant inflow from rolled upstream-basin runoff.

    runoff: (B, T) basin runoff; pair_*: (P,) int arrays with one entry per
    (plant, upstream-basin) pair; returns (n_plants, T).

    ``roll(time=n)`` semantics: inflow value at time t uses runoff at
    (t - n) mod T, identical to np.roll in the reference (hydro.py:101-102).
    """
    T = runoff.shape[1]
    t_idx = jnp.arange(T)[None, :]
    src = (t_idx - pair_shift[:, None]) % T
    gathered = runoff[pair_basin[:, None], src]  # (P, T)
    return jax.ops.segment_sum(gathered, pair_plant, num_segments=n_plants)
