"""Utility-surface tests (reference utils.py / data.py small helpers)."""

import numpy as np
import pandas as pd
import pytest

from atlite_tpu import utils
from atlite_tpu.data import maybe_remove_tmpdir, non_bool_dict


def test_ensure_coords():
    idx = pd.Index([1, 2, 3], name="bus")
    coords = utils.ensure_coords(idx)
    assert list(coords) == ["bus"] and list(coords["bus"]) == [1, 2, 3]

    unnamed = utils.ensure_coords(pd.Index([1, 2]))
    assert list(unnamed) == ["dim_0"]

    mi = pd.MultiIndex.from_tuples([(1, "a"), (2, "b")])
    mi.name = "cell"
    assert "cell" in utils.ensure_coords(mi)

    coords = utils.ensure_coords({"x": [0.0, 1.0]})
    assert isinstance(coords["x"], pd.Index)

    with pytest.raises(ValueError):
        utils.ensure_coords(42)


def test_timeindex_from_slice():
    idx = utils.timeindex_from_slice(slice("2013-01", "2013-02"))
    assert idx[0] == pd.Timestamp("2013-01-01 00:00")
    assert idx[-1] == pd.Timestamp("2013-02-28 23:00")  # end month inclusive
    assert (idx[1] - idx[0]) == pd.Timedelta("1h")


def test_non_bool_dict():
    out = non_bool_dict({"a": True, "b": False, "c": 1.5, "d": "x"})
    assert out == {"a": 1, "b": 0, "c": 1.5, "d": "x"}
    assert type(out["a"]) is int


def test_maybe_remove_tmpdir(tmp_path):
    from pathlib import Path

    seen = {}

    @maybe_remove_tmpdir
    def fn(tmpdir=None):
        seen["dir"] = tmpdir
        (Path(tmpdir) / "scratch").write_text("x")
        return 7

    assert fn() == 7
    assert not Path(seen["dir"]).exists()  # auto-created dir is cleaned

    keep = tmp_path / "keep"
    keep.mkdir()
    assert fn(tmpdir=str(keep)) == 7
    assert keep.exists()  # caller-provided dir is left alone


def test_cutout_chunks_property(tmp_path):
    import atlite_tpu

    c = atlite_tpu.Cutout(
        tmp_path / "c", module="synthetic", x=slice(0, 2), y=slice(0, 2),
        time="2013-01-01", chunksize_time=100,
    )
    assert c.chunks == {"time": 100}
    c2 = atlite_tpu.Cutout(
        tmp_path / "c2", module="synthetic", x=slice(0, 2), y=slice(0, 2),
        time="2013-01-01",
    )
    assert c2.chunks is None
