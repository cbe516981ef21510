"""Two-process multihost bootstrap test (VERDICT round-1 item 8).

Spawns 2 real processes, each with 4 virtual CPU devices, joined via
jax.distributed into an 8-device global mesh; runs the sharded encode
through initialize()/global_mesh()/host_shard_bounds()/make_global_batch
and verifies the assembled stream against zlib.  This executes the DCN
bootstrap path that single-process tests cannot reach.
"""

import os
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


# (hang protection: the worker communicate() below has timeout=240;
# pytest-timeout is not installed in this image, so no mark here)
def test_two_process_encode_roundtrip():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout={out}\nstderr={err[-2000:]}"
        assert "MULTIHOST_OK" in out
