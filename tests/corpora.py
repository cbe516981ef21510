"""Test corpora, modeled on the reference's ``test_data`` generator
(/root/reference/test_deflate.py:38-85): repetitive text, numbered text,
random-ish text, pure random bytes, binary-char strings, and empty input —
plus seeded determinism (the reference fuzzes unseeded; we keep runs
reproducible)."""

from __future__ import annotations

import numpy as np


def corpus(mode: int, size: int = 2200, seed: int = 1951) -> bytes:
    rng = np.random.default_rng(seed + mode)
    if mode == 0:  # repeated text
        base = b"The quick brown fox jumps over the lazy dog. "
        return (base * (size // len(base) + 1))[:size]
    if mode == 1:  # numbered lines (the reference's LED-bench corpus)
        out = bytearray()
        i = 0
        while len(out) < size:
            out.extend(b"Hello world line %d!\n" % i)
            i += 1
        return bytes(out[:size])
    if mode == 2:  # random-numbered text
        out = bytearray()
        while len(out) < size:
            out.extend(b"value=%d;" % int(rng.integers(0, 1 << 16)))
        return bytes(out[:size])
    if mode == 3:  # pure random bytes (worst case, forces dynamic trees)
        return rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    if mode == 4:  # random '0'/'1' characters
        return rng.choice([48, 49], size).astype(np.uint8).tobytes()
    if mode == 5:  # empty input
        return b""
    if mode == 6:  # long runs (distance-1 overlap stress)
        out = bytearray()
        while len(out) < size:
            out.extend(bytes([int(rng.integers(0, 256))]) * int(rng.integers(1, 50)))
        return bytes(out[:size])
    if mode == 7:  # structured binary (little repetition, some)
        a = np.arange(size, dtype=np.uint32) % 251
        return a.astype(np.uint8).tobytes()
    raise ValueError(mode)


ALL_MODES = list(range(8))
