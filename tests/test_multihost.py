"""Multi-host (multi-controller) serving: 2 processes x 4 CPU devices.

Each subprocess initializes jax.distributed, ingests ONLY its own
first-dim row range (per-host DB ingest — no process encodes the full
database), assembles the global row-sharded array, and serves queries
over the 8-device global mesh with a decode check.  SURVEY.md §2.7;
no reference counterpart (src/spiral.cpp:1231 is single-core).
"""
import os
import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_serving():
    worker = pathlib.Path(__file__).parent / "multihost_worker.py"
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-4000:]
        assert "MULTIHOST_OK" in out, out[-4000:]
