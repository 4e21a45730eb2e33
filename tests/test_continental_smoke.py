"""The continental end-to-end harness (bench_continental.py) at toy
scale: CONTINENTAL_SMOKE=1 runs the identical pipeline structure —
prepare → store → indicator matrix → streamed int16 wind+PV with fused
bus aggregation → availability + host cross-check — so a regression in
its stage plumbing fails the suite instead of a multi-hour TPU run."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path


def test_continental_smoke():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["CONTINENTAL_SMOKE"] = "1"
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).parent.parent /
                             "bench_continental.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"continental smoke failed\n--- stdout ---\n{proc.stdout[-2000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}")
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    d = result["detail"]
    assert d["smoke"] is True
    assert result["value"] > 0
    for key in ("prepare_s", "indicatormatrix_s", "wind_s", "pv_s",
                "availability_s", "wind_vs_resident_maxdiff",
                "pv_vs_resident_p999", "availability_dev_vs_host_maxdiff"):
        assert key in d, key
