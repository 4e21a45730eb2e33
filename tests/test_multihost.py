"""Multi-host execution: 2 processes x 4 virtual CPU devices running the
full sharded step + distributed banded aggregation over a process-spanning
("t", "x") mesh, asserted equal to a single-device computation inside each
worker (tests/multihost_worker.py).  This is the DCN analog of the
serial-vs-Pool equality test in the reference (test_gis.py:600) — SURVEY
§5.8's new comm layer has no reference counterpart."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc,local_devices", [(2, 4)])
def test_two_process_mesh_equals_single_device(nproc, local_devices, tmp_path):
    # a store for the IO-scatter stage: X divisible by the x-axis (4),
    # T divisible by the process-spanning t-axis (2)
    from atlite_tpu import Cutout

    c = Cutout(tmp_path / "mh", module="synthetic", x=slice(-4, 1.76),
               y=slice(56, 60), time="2013-01-01")
    c.prepare(features=["wind"])
    store = tmp_path / "mh.atc"
    assert store.exists()

    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon pin out
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env["PYTHONPATH"] = str(WORKER.parent.parent) + os.pathsep + env.get(
        "PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(nproc), str(port),
             str(store)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True, cwd=WORKER.parent.parent,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MULTIHOST OK" in out, f"worker {i} incomplete:\n{out}"
        assert "STEP OK" in out and "AGG OK" in out and "STORE OK" in out
        assert "PIPELINE OK" in out, f"worker {i} skipped streamed stage:\n{out}"
