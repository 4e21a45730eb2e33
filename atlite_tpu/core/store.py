"""On-disk cutout store: checkpoint/resume for prepared weather data.

The reference persists cutouts as a single NetCDF file with atomic
tmp-file + rename rewrites and per-variable module/feature attrs that make
preparation resumable (/root/reference/atlite/data.py:217-272,
cutout.py:343-353).  NetCDF/HDF5 is a native dependency this framework does
not take; instead a cutout is a directory:

    <name>.atc/
      manifest.json        coords, attrs, per-variable metadata
      <var>.npy            one array per variable (np.load mmap-able)

Writes are atomic (write to <name>.atc.tmpXXXX, then os.replace), and the
per-variable ``feature``/``module`` entries in the manifest give the same
diff-and-resume semantics as the reference's prepared_features tracking.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

MANIFEST = "manifest.json"
SUFFIX = ".atc"


def _sanitize_var(name: str) -> str:
    return name.replace(" ", "__sp__").replace("/", "__sl__")


def _file_digest(fn) -> str:
    """Chunked sha256 of a file (no whole-file bytes object in RAM)."""
    with open(fn, "rb") as fh:
        return hashlib.file_digest(fh, "sha256").hexdigest()


def var_path(path, manifest, name) -> Path:
    """Resolve a variable's data file: versioned name from the manifest
    ('file' entry, written by incremental updates) or the plain default."""
    fname = manifest["variables"][name].get(
        "file", f"{_sanitize_var(name)}.npy")
    return Path(path) / fname


def write_store(path, grid, data, attrs, var_attrs):
    """Atomically (re)write the cutout directory."""
    path = Path(path)
    parent = path.parent
    parent.mkdir(parents=True, exist_ok=True)
    # sweep tmp dirs orphaned by a HARD crash (SIGKILL/power loss) of a
    # previous write — the except-handler below only covers Python
    # exceptions, and a continental store's tmp dir is tens of GB.
    # Single-writer contract (as for the store itself).
    for stale in parent.glob(path.name + ".tmp*"):
        if stale.is_dir():
            shutil.rmtree(stale, ignore_errors=True)
    tmp = Path(tempfile.mkdtemp(prefix=path.name + ".tmp", dir=parent))
    try:
        manifest = {
            "coords": {
                "x": [float(v) for v in grid.x],
                "y": [float(v) for v in grid.y],
                "time": [str(t) for t in pd.DatetimeIndex(grid.time)],
            },
            "crs": grid.crs,
            "attrs": _jsonable(attrs),
            "variables": {
                name: {
                    "dims": list(var_attrs.get(name, {}).get("dims", ("time", "y", "x"))),
                    "dtype": str(np.asarray(arr).dtype),
                    **{k: _jsonable(v) for k, v in var_attrs.get(name, {}).items()
                       if k != "dims"},
                }
                for name, arr in data.items()
            },
        }
        for name, arr in data.items():
            fn = tmp / f"{_sanitize_var(name)}.npy"
            np.save(fn, np.asarray(arr))
            # integrity checksum for failure detection on reload
            manifest["variables"][name]["sha256"] = _file_digest(fn)
        (tmp / MANIFEST).write_text(json.dumps(manifest, indent=1))
        old = Path(str(path) + ".old")
        if old.exists():
            # stale backup from a previous interrupted swap — it would
            # make os.replace(path, old) fail with ENOTEMPTY forever
            shutil.rmtree(old)
        if path.exists():
            os.replace(path, old)
            os.replace(tmp, path)
            shutil.rmtree(old)
        else:
            os.replace(tmp, path)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def update_store(path, grid, data, attrs, var_attrs, update_vars):
    """Incrementally add/replace variables in an existing store.

    Only the files of ``update_vars`` are written (O(new bytes), not
    O(store bytes) — the reference writes the whole NetCDF once per
    prepare() call, data.py:254-270; round-1 here rewrote the whole store
    once per *feature*, which was O(features²) I/O).  Crash-safe ordering:
    REPLACED variables are written under content-versioned names
    ('<var>.<sha8>.npy', referenced by the manifest's 'file' entry), so
    the manifest swap is the single commit point — a crash at any moment
    leaves the previous manifest pointing at the previous (still intact)
    file, never new data under an old checksum.  Superseded/orphaned
    files are unlinked after the swap (and swept on the next update).
    """
    path = Path(path)
    if not path.exists():
        write_store(path, grid, data, attrs, var_attrs)
        return
    manifest = json.loads((path / MANIFEST).read_text())
    # the incremental path never rewrites untouched variable files, so
    # the caller's grid must match the stored coords AND crs — otherwise
    # the new .npy shapes / georeferencing and the manifest silently
    # diverge
    stored = manifest["coords"]
    if (len(stored["x"]) != len(grid.x) or len(stored["y"]) != len(grid.y)
            or len(stored["time"]) != len(grid.time)
            or not np.allclose(stored["x"], grid.x)
            or not np.allclose(stored["y"], grid.y)
            or (pd.DatetimeIndex(stored["time"]).values
                != np.asarray(grid.time)).any()
            or manifest.get("crs", 4326) != grid.crs):
        write_store(path, grid, data, attrs, var_attrs)  # full rewrite
        return
    update_vars = set(update_vars)
    known = set(manifest["variables"])
    missing = set(data) - known - update_vars
    if missing:
        # store predates some in-memory variables we were not asked to
        # write — fall back to a full rewrite to avoid losing them
        write_store(path, grid, data, attrs, var_attrs)
        return
    for name in sorted(update_vars):
        arr = np.asarray(data[name])
        fd, tmpname = tempfile.mkstemp(prefix=_sanitize_var(name),
                                       suffix=".tmp", dir=path)
        try:
            with os.fdopen(fd, "wb") as f:
                np.save(f, arr)
                f.flush()
                os.fsync(f.fileno())
            digest = _file_digest(tmpname)
            fname = f"{_sanitize_var(name)}.{digest[:8]}.npy"
            os.replace(tmpname, path / fname)
        except BaseException:
            if os.path.exists(tmpname):
                os.unlink(tmpname)
            raise
        manifest["variables"][name] = {
            "dims": list(var_attrs.get(name, {}).get("dims", ("time", "y", "x"))),
            "dtype": str(arr.dtype),
            **{k: _jsonable(v) for k, v in var_attrs.get(name, {}).items()
               if k != "dims"},
            "sha256": digest,
            "file": fname,
        }
    manifest["attrs"] = _jsonable(attrs)
    fd, tmpname = tempfile.mkstemp(prefix=MANIFEST, suffix=".tmp", dir=path)
    with os.fdopen(fd, "w") as f:
        f.write(json.dumps(manifest, indent=1))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmpname, path / MANIFEST)  # the single commit point
    # sweep files the committed manifest no longer references (superseded
    # versions, or orphans from an earlier crash)
    live = {var_path(path, manifest, n).name for n in manifest["variables"]}
    live.add(MANIFEST)
    for fn in path.iterdir():
        if fn.name not in live and fn.suffix in (".npy", ".tmp"):
            # .tmp: a hard crash between mkstemp and os.replace orphans
            # a full-variable-size temp file
            try:
                fn.unlink()
            except OSError:
                pass


def read_store(path, mmap=True, verify=False):
    """Load a cutout directory; arrays are memory-mapped by default.

    verify=True checks each array file against the manifest's sha256
    (failure detection for partially written / corrupted stores)."""
    path = Path(path)
    old = Path(str(path) + ".old")
    if not path.exists() and old.exists():
        # a write was interrupted between the two directory swaps — the
        # previous (complete) store lives in '.old'; recover it
        os.replace(old, path)
    manifest = json.loads((path / MANIFEST).read_text())
    data, var_attrs = {}, {}
    for name, meta in manifest["variables"].items():
        fn = var_path(path, manifest, name)
        if verify and "sha256" in meta:
            if _file_digest(fn) != meta["sha256"]:
                raise IOError(
                    f"checksum mismatch for variable {name!r} in {path} — "
                    "store is corrupted or was written by an interrupted "
                    "process"
                )
        arr = np.load(fn, mmap_mode="r" if mmap else None)
        data[name] = arr
        var_attrs[name] = {k: v for k, v in meta.items()
                           if k not in ("dtype", "sha256", "file")}
    coords = manifest["coords"]
    grid_kwargs = dict(
        x=np.asarray(coords["x"], dtype=float),
        y=np.asarray(coords["y"], dtype=float),
        time=pd.DatetimeIndex(coords["time"]).values,
        crs=manifest.get("crs", 4326),
    )
    return grid_kwargs, data, manifest.get("attrs", {}), var_attrs


def _jsonable(v):
    if isinstance(v, np.bool_):
        return bool(v)  # checked before np.integer: np.bool_ is neither
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.datetime64, pd.Timestamp)):
        return str(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v
