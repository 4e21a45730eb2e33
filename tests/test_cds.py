"""CDS client (io/cds.py) against a local mock of the processes API:
submit -> poll -> results -> asset download, terminal failure states,
credential parsing, and the download file lock.  The closest offline
stand-in for the live protocol (CONFORMANCE residual risk 4)."""

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from atlite_tpu.io import cds

PAYLOAD = b"GRIB-bytes-stand-in" * 100


class _Handler(BaseHTTPRequestHandler):
    state = {"polls": 0, "fail_as": None}

    def log_message(self, *a):
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        assert self.headers.get("PRIVATE-TOKEN") == "test-key"
        length = int(self.headers.get("Content-Length", 0))
        req = json.loads(self.rfile.read(length))
        assert "inputs" in req and req["inputs"]["variable"] == ["t2m"]
        _Handler.state["polls"] = 0
        self._json({"jobID": "job-1", "status": "accepted"})

    def do_GET(self):
        st = _Handler.state
        if self.path.endswith("/jobs/job-1"):
            st["polls"] += 1
            if st["fail_as"] and st["polls"] >= 2:
                self._json({"status": st["fail_as"], "jobID": "job-1"})
            elif st["polls"] < 2:
                self._json({"status": "running", "jobID": "job-1"})
            else:
                self._json({"status": "successful", "jobID": "job-1"})
        elif self.path.endswith("/jobs/job-1/results"):
            port = self.server.server_address[1]
            self._json({"asset": {"value": {
                "href": f"http://localhost:{port}/download/result.grib"}}})
        elif self.path.startswith("/download/"):
            self.send_response(200)
            self.send_header("Content-Length", str(len(PAYLOAD)))
            self.end_headers()
            self.wfile.write(PAYLOAD)
        else:
            self._json({"error": f"unexpected {self.path}"}, code=404)


@pytest.fixture()
def mock_cds():
    srv = HTTPServer(("localhost", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://localhost:{srv.server_address[1]}"
    srv.shutdown()
    t.join(timeout=5)


def test_retrieve_full_flow(mock_cds, tmp_path):
    _Handler.state["fail_as"] = None
    c = cds.Client(url=mock_cds, key="test-key", sleep=0.01)
    target = tmp_path / "out.grib"
    got = c.retrieve("reanalysis-era5-single-levels",
                     {"variable": ["t2m"]}, target)
    assert got == target
    assert target.read_bytes() == PAYLOAD
    assert not (tmp_path / "out.grib.part").exists()  # atomic rename


@pytest.mark.parametrize("state", ["failed", "dismissed", "rejected"])
def test_retrieve_terminal_failures_raise(mock_cds, tmp_path, state):
    _Handler.state["fail_as"] = state
    c = cds.Client(url=mock_cds, key="test-key", sleep=0.01)
    with pytest.raises(RuntimeError, match=state):
        c.retrieve("reanalysis-era5-single-levels",
                   {"variable": ["t2m"]}, tmp_path / "x.grib")
    assert not (tmp_path / "x.grib").exists()


def test_read_credentials(tmp_path, monkeypatch):
    monkeypatch.delenv("CDSAPI_URL", raising=False)
    monkeypatch.delenv("CDSAPI_KEY", raising=False)
    rc = tmp_path / "cdsapirc"
    rc.write_text("url: https://example.org/api\nkey: abc:123\n")
    monkeypatch.setenv("CDSAPI_RC", str(rc))
    url, key = cds.read_credentials()
    assert url == "https://example.org/api"
    assert key == "abc:123"  # keys may contain ':'
    monkeypatch.setenv("CDSAPI_KEY", "envkey")
    _, key2 = cds.read_credentials()
    assert key2 == "envkey"  # env wins
    monkeypatch.setenv("CDSAPI_RC", str(tmp_path / "missing"))
    monkeypatch.delenv("CDSAPI_KEY")
    with pytest.raises(RuntimeError, match="No CDS credentials"):
        cds.read_credentials()


def test_file_lock_serializes_writers(tmp_path):
    out = tmp_path / "shared.bin"
    errors = []

    def writer(i):
        try:
            with cds.file_lock(out):
                data = bytes([i]) * 4096
                with open(out, "wb") as fh:
                    for k in range(16):
                        fh.write(data)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    content = np.frombuffer(out.read_bytes(), dtype=np.uint8)
    assert len(set(content.tolist())) == 1  # one writer's bytes, unmixed


def test_map_requests_concurrent_order():
    calls = []
    out = cds.map_requests(lambda r: calls.append(r) or r * 2,
                           [1, 2, 3], concurrent=True, max_workers=2)
    assert out == [2, 4, 6]  # results keep request order
    out2 = cds.map_requests(lambda r: r + 1, [5], concurrent=True)
    assert out2 == [6]
