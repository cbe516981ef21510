"""Bench smoke gate: bench.py at HEAD must emit its JSON line in bounded
time on the real chip.

Rounds 2 and 3 lost their perf record to bench-time failures the CPU
suite cannot catch (a scoped-VMEM OOM at the bench shape; a tunnel
compile-wall timeout).  This gate runs the 1 MiB fast bench end-to-end in
a subprocess and asserts a parseable JSON line appears within the budget,
so a compile-time or shape regression fails CI instead of a round's
BENCH_r{N}.json (the reference's always-completing L6 flow,
/root/reference/Makefile:15-17).
"""

import json
import os
import subprocess
import sys


def test_bench_fast_smoke():
    env = dict(os.environ)
    env.update(BENCH_MB="1", BENCH_FAST="1", BENCH_REPS="1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line on stdout; stderr tail: {proc.stderr[-500:]}"
    result = json.loads(lines[-1])
    assert result.get("value") and result["value"] > 0
    assert result.get("decode_gbps") is not None
