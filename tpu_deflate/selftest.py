"""On-device round-trip self-test — the analog of the reference's
synthesizable LED test bench (`test_deflate_bench`,
/root/reference/test_deflate.py:326-653), which bakes a corpus into ROM,
decompresses + verifies, compresses, feeds the output back, re-decompresses
and byte-compares, and reports via LEDs.

Here: a baked corpus, device encode -> device decode -> compare, a
decode-of-golden check (the golden stream is baked at import time from the
host reference codec, not zlib, so the self-test is hermetic), and exact
compressed-size assertions like the reference's 0x2a/0x10f checks
(test_deflate.py:547-548).
"""

from __future__ import annotations

import numpy as np

from tpu_deflate.config import DeflateConfig


def _bench_corpus(size: int = 2200) -> bytes:
    """Numbered-text corpus in the spirit of the reference's
    test_data(1, 100) bench corpus (test_deflate.py:38-59)."""
    out = bytearray()
    i = 0
    while len(out) < size:
        out.extend(b"Hello world line %d!\n" % i)
        i += 1
    return bytes(out[:size])


def run_selftest(config: DeflateConfig | None = None, verbose: bool = True) -> bool:
    """Full self-test; returns True on pass (the LED equivalent)."""
    from tpu_deflate import api
    from tpu_deflate.ref.deflate import zlib_compress
    from tpu_deflate.ref.inflate import zlib_decompress

    cfg = config or DeflateConfig(window=256, max_match=10, chunk_size=4096)
    data = _bench_corpus()
    ok = True

    def report(name, passed, extra=""):
        nonlocal ok
        ok = ok and passed
        if verbose:
            print(f"  [{'PASS' if passed else 'FAIL'}] {name} {extra}")

    # 1. device compress -> host-reference decode (golden-adjacent)
    comp = api.compress(data, cfg)
    report("device-encode/host-decode", zlib_decompress(comp) == data,
           f"({len(data)} -> {len(comp)} bytes)")

    # 2. feed the compressed output back: device decompress -> compare
    report("device round-trip", api.decompress(comp, cfg) == data)

    # 3. decode a host-reference-produced golden stream on device
    golden = zlib_compress(data, cfg)
    report("device-decode of golden stream", api.decompress(golden, cfg) == data)

    # 4. exact compressed sizes, the reference's 0x2a/0x10f discipline
    #    (test_deflate.py:547-548): the default selftest config and the
    #    dynamic-tree config must produce these byte counts EXACTLY —
    #    any parse/emission change that alters output size fails here.
    if config is None:
        report(
            "exact compressed size (static, win256/m10/4K)",
            len(comp) == 0x234,
            f"({len(comp):#x} == 0x234)",
        )
        dyn_cfg = DeflateConfig(
            window=32768, max_match=258, chunk_size=4096, lazy=True,
            dynamic_encode=True,
        )
        dyn_comp = api.compress(data, dyn_cfg)
        report(
            "exact compressed size (dynamic, win32K/m258/lazy)",
            len(dyn_comp) == 0xFF,
            f"({len(dyn_comp):#x} == 0xff)",
        )
        report(
            "dynamic stream round-trips", zlib_decompress(dyn_comp) == data
        )
        # FAST preset (window=32), the reference's 0x2a config
        # (test_deflate.py:547): pinned exactly for our bench corpus.
        fast_cfg = DeflateConfig(fast=True, window=32, chunk_size=4096)
        fast_comp = api.compress(data, fast_cfg)
        report(
            "exact compressed size (FAST, win32)",
            len(fast_comp) == 0x21B,
            f"({len(fast_comp):#x} == 0x21b)",
        )
        report(
            "FAST stream round-trips", zlib_decompress(fast_comp) == data
        )
        # LOWLUT preset: decompress-only, static-tree, one block
        # (reference deflate.py:21,43-47) — decode a golden one-block
        # static stream and byte-compare the output.  The preset is
        # imported, not restated, so legality-surface changes propagate.
        from tpu_deflate.config import LOWLUT as lowlut_cfg

        golden_1blk = zlib_compress(
            data,
            DeflateConfig(window=256, max_match=10, chunk_size=1 << 20,
                          one_block=True),
        )
        report(
            "host golden one-block stream size pinned (precondition)",
            len(golden_1blk) == 0x234,
            f"({len(golden_1blk):#x} == 0x234)",
        )
        report(
            "LOWLUT decode of one-block static stream",
            api.decompress(golden_1blk, lowlut_cfg) == data,
        )
    else:
        # custom config: fall back to the loose regression bound
        report("compressed-size bound", len(comp) <= len(data) // 3,
               f"({len(comp)} <= {len(data) // 3})")

    if verbose:
        print("SELFTEST", "PASSED" if ok else "FAILED")
    return ok


if __name__ == "__main__":
    import sys

    sys.exit(0 if run_selftest() else 1)
