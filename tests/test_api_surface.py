"""Mechanical API-parity check against the reference package.

Walks the reference sources (/root/reference/atlite, AST-parsed — the
reference is not importable here, its dependency stack is absent) and
asserts this package exposes the same public names and call signatures:

- top-level exports (reference __init__.py:28-48),
- the full Cutout method/property surface (cutout.py:653-689 bindings
  plus every public def in the class body),
- every public module-level function of convert/resource/gis/wind/csp/
  hydro/aggregate/utils/data, argument names IN REFERENCE ORDER (so
  positional reference calls keep working) and literal defaults,
- ExclusionContainer's public methods,
- the dataset-module contract: registry names and the feature→variables
  map of every live adapter (datasets/era5.py:47-60 etc.).

Deliberate divergences are pinned in explicit allowlists below — parity
drift shows up as a failing test instead of stale prose in COVERAGE.md
(round-4 verdict item 5).
"""

from __future__ import annotations

import ast
import inspect
from pathlib import Path

import pytest

REF = Path("/root/reference/atlite")

# ---------------------------------------------------------------------------
# pinned deliberate divergences
# ---------------------------------------------------------------------------

# reference module-level functions with no public counterpart here, each with
# the reason (these are internal helpers the reference happens to leave
# unprefixed, or surfaces replaced by a different mechanism)
SKIP_FUNCTIONS = {
    # gis.py plumbing around rasterio/multiprocessing internals; our
    # equivalents are the exclusion/kernels pipeline (different engine)
    "padded_transform_and_shape": "exposed in gis.exclusion with same name",
    # resource.py helper operating on requests' HTTP session
    "download_windturbineconfig": "not in reference v0.6.1 public docs",
}

# our function may APPEND extra keyword(-defaulted) parameters after the
# reference's; these are the pinned additions (name -> set of extra params)
EXTRA_PARAMS = {
    "irradiation": {"trigon_model"},     # explicit instead of via **params
    "pv": {"trigon_model"},              # explicit instead of via **params
    "line_rating": {"_chunk_hours"},     # streaming knob (private-named)
    "shape_availability": {"geometry_crs"},
    "shape_availability_reprojected": {"geometry_crs"},
    "ExclusionContainer.compute_shape_availability": {"geometry_crs"},
    "ExclusionContainer.plot_shape_availability": {"geometry_crs"},
    "compute_availabilitymatrix": {"shapes_crs", "backend"},
    "projected_mask": {"nodata", "geom_crs"},   # ref takes them via **kwargs
    "regrid": {"resampling", "src_crs", "dst_crs"},  # ref: via **kwargs
    "pad_extent": {"mode"},                     # ref: via **kwargs
    "get_coords": set(),
    "aggregate_matrix": {"index_name"},
    # vector layers may carry their own CRS here (ref reprojects beforehand)
    "ExclusionContainer.add_geometry": {"crs"},
    "cutout_prepare": set(),
    "get_windturbineconfig": set(),
}

# reference (name, param) whose literal default deliberately differs here;
# value = (reference default, ours), each with a comment for the why
DEFAULT_DIVERGENCES = {
    # mutable-default hygiene: None sentinel resolving to the reference's
    # value inside the function body
    ("convert_and_aggregate", "dask_kwargs"): ({}, None),
    ("line_rating", "dask_kwargs"): ({}, None),
    ("solar_thermal", "orientation"): ({"slope": 45.0, "azimuth": 180.0}, None),
    ("cutout_prepare", "compression"):
        ({"zlib": True, "complevel": 9, "shuffle": True}, None),
    # one store format here: 'grib' vs None both mean "module default"
    ("cutout_prepare", "data_format"): ("grib", None),
    ("get_features", "data_format"): ("grib", None),
    # array-native csp.calculate_dni: the altitude array is required where
    # the reference lazily derives it from ds when solar_position is None
    ("calculate_dni", "solar_position"): (None, "<missing>"),
    ("ExclusionContainer.plot_shape_availability", "show_kwargs"): ({}, None),
    ("ExclusionContainer.plot_shape_availability", "plot_kwargs"): ({}, None),
}

# first-parameter renames (reference name -> accepted names here): the
# reference calls everything positionally through these, so only the NAME
# differs, never the position
FIRST_ARG_RENAMES = {
    "ds": {"cutout", "fields", "da", "result"},
    "orig": {"grid"},
    "dest": {"shapes"},
    "meta": {"next_down"},
    "da": {"da"},
    "cutout": {"cutout"},
}
SECOND_ARG_RENAMES = {
    "dest": {"shapes"},
    "solar_position": {"altitude"},  # csp.calculate_dni takes the array
}
# full-signature renames where the first arg is not a ds/cutout: csp's
# calculate_dni consumes the two arrays directly instead of an xr.Dataset +
# SolarPosition accessor pair (device kernels take arrays)
FIRST_ARG_EXTRA = {"calculate_dni": {"influx_direct"}}


def _ref_tree(name):
    return ast.parse((REF / name).read_text())


def _func_sigs(tree, *, methods_of=None):
    """{name: (ordered arg names, {arg: literal default or <expr>})}"""
    if methods_of is not None:
        cls = next(n for n in tree.body
                   if isinstance(n, ast.ClassDef) and n.name == methods_of)
        body = cls.body
    else:
        body = tree.body
    out = {}
    for node in body:
        if not isinstance(node, ast.FunctionDef) or node.name.startswith("_"):
            continue
        a = node.args
        args = [x.arg for x in a.posonlyargs + a.args + a.kwonlyargs]
        if a.vararg:
            args.append("*" + a.vararg.arg)
        if a.kwarg:
            args.append("**" + a.kwarg.arg)
        defaults = {}
        pos = a.posonlyargs + a.args
        for arg, d in zip(pos[len(pos) - len(a.defaults):], a.defaults):
            try:
                defaults[arg.arg] = ast.literal_eval(d)
            except ValueError:
                defaults[arg.arg] = Ellipsis  # non-literal: not compared
        for arg, d in zip(a.kwonlyargs, a.kw_defaults):
            if d is not None:
                try:
                    defaults[arg.arg] = ast.literal_eval(d)
                except ValueError:
                    defaults[arg.arg] = Ellipsis
        out[node.name] = (args, defaults)
    return out


def _our_sig(fn):
    args, defaults = [], {}
    for p in inspect.signature(fn).parameters.values():
        if p.kind == p.VAR_POSITIONAL:
            args.append("*" + p.name)
        elif p.kind == p.VAR_KEYWORD:
            args.append("**" + p.name)
        else:
            args.append(p.name)
            if p.default is not p.empty:
                defaults[p.name] = p.default
    return args, defaults


def _resolve(name):
    """Find our public counterpart of a reference symbol."""
    import atlite_tpu
    import atlite_tpu.aggregate
    import atlite_tpu.convert
    import atlite_tpu.data
    import atlite_tpu.gis.exclusion
    import atlite_tpu.gis.matrix
    import atlite_tpu.gis.raster
    import atlite_tpu.gis.regrid
    import atlite_tpu.physics.csp
    import atlite_tpu.physics.hydro
    import atlite_tpu.physics.wind
    import atlite_tpu.resource
    import atlite_tpu.utils

    for mod in (atlite_tpu, atlite_tpu.convert, atlite_tpu.resource,
                atlite_tpu.gis, atlite_tpu.gis.exclusion,
                atlite_tpu.gis.matrix, atlite_tpu.gis.regrid,
                atlite_tpu.gis.raster, atlite_tpu.physics.wind,
                atlite_tpu.physics.csp, atlite_tpu.physics.hydro,
                atlite_tpu.aggregate, atlite_tpu.utils, atlite_tpu.data):
        if hasattr(mod, name):
            return getattr(mod, name)
    return None


def _check_signature(name, ref_args, ref_defaults, fn):
    ours_args, ours_defaults = _our_sig(fn)
    extra_ok = EXTRA_PARAMS.get(name, set())
    # 1. every reference parameter present, in the same position (so
    #    positional reference call sites keep working); the first one (and
    #    'dest'-style second) may be renamed per the pinned table
    oi = 0
    for i, ra in enumerate(ref_args):
        if ra.startswith("*"):
            # the remainder of OUR params (before our own */**) must all be
            # pinned extras — anything else is silent drift
            rest = [a for a in ours_args[oi:] if not a.startswith("*")]
            stray = set(rest) - extra_ok
            assert not stray, (
                f"{name}: unpinned extra parameters {sorted(stray)} (add to "
                f"EXTRA_PARAMS if deliberate)")
            return
        assert oi < len(ours_args), (
            f"{name}: reference parameter {ra!r} missing (ref {ref_args}, "
            f"ours {ours_args})")
        oa = ours_args[oi]
        renames = (FIRST_ARG_RENAMES if i == 0 else SECOND_ARG_RENAMES
                   if i == 1 else {})
        ok = (oa == ra or oa in renames.get(ra, set())
              or (i == 0 and oa in FIRST_ARG_EXTRA.get(name, set())))
        assert ok, (
            f"{name}: parameter {i} is {oa!r}, reference has {ra!r} "
            f"(ref {ref_args}, ours {ours_args})")
        # 2. literal defaults match unless pinned as divergent
        if ra in ref_defaults and ref_defaults[ra] is not Ellipsis:
            pinned = DEFAULT_DIVERGENCES.get((name, ra))
            if pinned is not None:
                refv, ourv = pinned
                assert ref_defaults[ra] == refv and \
                    ours_defaults.get(oa, "<missing>") == ourv, (
                        f"{name}.{ra}: pinned divergence out of date "
                        f"(ref {ref_defaults[ra]!r}, "
                        f"ours {ours_defaults.get(oa, '<missing>')!r})")
            else:
                assert ours_defaults.get(oa, "<missing>") == ref_defaults[ra], (
                    f"{name}.{ra}: default {ours_defaults.get(oa)!r} != "
                    f"reference {ref_defaults[ra]!r}")
        oi += 1
    # reference had no **kwargs: our extra params must be pinned AND have
    # defaults (so reference call sites never need them)
    rest = [a for a in ours_args[oi:] if not a.startswith("*")]
    stray = set(rest) - extra_ok
    assert not stray, (
        f"{name}: unpinned extra parameters {sorted(stray)} "
        f"(add to EXTRA_PARAMS if deliberate)")
    for a in rest:
        assert a in ours_defaults, (
            f"{name}: extra parameter {a!r} has no default — breaks "
            f"reference positional call sites")


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_top_level_exports():
    import atlite_tpu

    tree = _ref_tree("__init__.py")
    names = [a.asname or a.name for node in ast.walk(tree)
             if isinstance(node, ast.ImportFrom)
             and node.module and node.module.startswith("atlite")
             for a in node.names]
    assert names, "reference export scrape came up empty"
    missing = [n for n in names if not hasattr(atlite_tpu, n)]
    assert not missing, f"missing top-level exports: {missing}"


def test_cutout_surface():
    import atlite_tpu

    tree = _ref_tree("cutout.py")
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef) and n.name == "Cutout")
    names = []
    for node in cls.body:
        if isinstance(node, ast.FunctionDef):
            if not node.name.startswith("_"):
                names.append(node.name)
        elif isinstance(node, ast.Assign):
            names += [t.id for t in node.targets
                      if isinstance(t, ast.Name) and not t.id.startswith("_")]
    assert len(names) > 40, f"Cutout surface scrape too small: {names}"
    missing = [n for n in names if not hasattr(atlite_tpu.Cutout, n)]
    assert not missing, f"Cutout surface missing: {missing}"


def test_exclusioncontainer_surface():
    import atlite_tpu

    sigs = _func_sigs(_ref_tree("gis.py"), methods_of="ExclusionContainer")
    assert {"add_raster", "add_geometry", "open_files"} <= set(sigs)
    for name, (args, defaults) in sigs.items():
        fn = getattr(atlite_tpu.ExclusionContainer, name, None)
        assert fn is not None, f"ExclusionContainer.{name} missing"
        if isinstance(fn, property) or not callable(fn):
            continue  # reference property-ized or attribute counterparts
        _check_signature(f"ExclusionContainer.{name}", args, defaults, fn)


REF_MODULES = ["convert.py", "resource.py", "gis.py", "wind.py", "csp.py",
               "hydro.py", "aggregate.py", "utils.py", "data.py"]


@pytest.mark.parametrize("modname", REF_MODULES)
def test_module_functions(modname):
    sigs = _func_sigs(_ref_tree(modname))
    assert sigs, f"no public functions scraped from {modname}"
    for name, (args, defaults) in sigs.items():
        if name in SKIP_FUNCTIONS and _resolve(name) is None:
            continue
        fn = _resolve(name)
        assert fn is not None, f"{modname}:{name} has no counterpart"
        if not callable(fn) or isinstance(fn, type):
            continue
        _check_signature(name, args, defaults, fn)


def test_dataset_module_contract():
    """Registry names + feature→variables map of every live adapter."""
    import atlite_tpu.datasets as ours

    ref_reg = _ref_tree("datasets/__init__.py")
    reg_names = []
    for node in ast.walk(ref_reg):
        if isinstance(node, ast.Dict):
            reg_names = [ast.literal_eval(k) for k in node.keys]
            break
    assert reg_names, "reference dataset registry scrape failed"
    for n in reg_names:
        assert n in ours.modules, f"dataset module {n!r} not registered"

    for n in reg_names:
        tree = _ref_tree(f"datasets/{n}.py")
        feats = None
        for node in tree.body:
            if isinstance(node, ast.Assign) and any(
                    isinstance(t, ast.Name) and t.id == "features"
                    for t in node.targets):
                feats = ast.literal_eval(node.value)
        assert feats is not None, f"no features dict in reference {n}"
        ours_feats = {k: list(v) for k, v in ours.modules[n].features.items()}
        assert ours_feats == {k: list(v) for k, v in feats.items()}, (
            f"{n} feature→variables map diverged")
        assert hasattr(ours.modules[n], "get_data")
        assert hasattr(ours.modules[n], "crs")
        assert hasattr(ours.modules[n], "static_features")


def test_convert_and_aggregate_kwargs():
    """The gateway contract (reference convert.py:59-158) parameter by
    parameter — the single most load-bearing signature."""
    sigs = _func_sigs(_ref_tree("convert.py"))
    args, defaults = sigs["convert_and_aggregate"]
    expect = ["cutout", "convert_func", "matrix", "index", "layout",
              "shapes", "shapes_crs", "per_unit", "return_capacity",
              "aggregate_time", "capacity_factor",
              "capacity_factor_timeseries", "show_progress", "dask_kwargs",
              "**convert_kwds"]
    assert args == expect, f"reference gateway signature changed: {args}"
    import atlite_tpu.convert as conv

    _check_signature("convert_and_aggregate", args, defaults,
                     conv.convert_and_aggregate)
