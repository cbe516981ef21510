"""README performance-table freshness: the table is generated from the
newest BENCH_r*.json (scripts/update_readme_perf.py) and must not drift
from it — rounds 3 and 4 both shipped stale hand-edited decode numbers.
"""

from __future__ import annotations

import json
import os
import re

def test_readme_perf_table_fresh():
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    import update_readme_perf as up

    src, parsed = up.latest_bench()
    with open(os.path.join(root, "README.md")) as f:
        text = f.read()
    m = re.search(re.escape(up.BEGIN) + r"(.*?)" + re.escape(up.END), text, re.S)
    assert m, "README BENCH markers missing"
    # the visible table must be exactly what the generator produces for
    # the newest bench record
    assert up.BEGIN + m.group(1) + up.END == up.render(src, parsed), (
        f"README perf table is stale vs {src}; run "
        "python scripts/update_readme_perf.py"
    )
    # and the embedded values must match the bench record
    vm = re.search(r"<!-- BENCH-VALUES (\{.*?\}) ", text)
    assert vm
    vals = json.loads(vm.group(1))
    for k, v in vals.items():
        assert v == parsed.get(k), f"README value {k}={v} != bench {parsed.get(k)}"
