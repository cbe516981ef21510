"""Parity tests for the gather-native expand kernel (kernels/expand3.py).

Element-equal to the XLA expansion path on random token streams with
literals, overlapping runs (dist < len), and nested matches, in
interpret mode on CPU — the same discipline as the other kernels.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from tpu_deflate.kernels.expand3 import MAXD, expand_fused3


def make_tokens(rng, out_cap, max_dist=MAXD, max_len=258, nlanes=4,
                lit_bias=0.5):
    """Random valid token streams: returns (off, c1, tb, tp, total, ref)."""
    K = out_cap + 16
    off = np.full((nlanes, K), out_cap, np.int32)
    c1 = np.zeros((nlanes, K), np.int32)
    tb = np.zeros((nlanes, K), np.int32)
    tp = np.zeros(nlanes, np.int32)
    total = np.zeros(nlanes, np.int32)
    refs = np.zeros((nlanes, out_cap), np.int32)
    for b in range(nlanes):
        pos = 0
        toks = []
        out = []
        target = int(rng.integers(out_cap // 2, out_cap + 1))
        while pos < target:
            if pos == 0 or rng.random() < lit_bias:
                v = int(rng.integers(0, 256))
                toks.append((pos, 0, v, 0))
                out.append(v)
                pos += 1
            else:
                d = int(rng.integers(1, min(max_dist, pos) + 1))
                ln = int(rng.integers(3, min(max_len, target - pos + 3) + 1))
                ln = min(ln, target - pos) or 1
                toks.append((pos, 1, ln, d))
                for _ in range(ln):
                    out.append(out[len(out) - d])
                pos += ln
        tp[b] = len(toks)
        total[b] = pos
        for k, (o, kind, ta, d) in enumerate(toks):
            off[b, k] = o
            c1[b, k] = (kind << 9) | ta
            tb[b, k] = d
        refs[b, :pos] = np.asarray(out, np.int32)
    return (jnp.asarray(off), jnp.asarray(c1), jnp.asarray(tb),
            jnp.asarray(tp), jnp.asarray(total), refs)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("out_cap", [2048, 65536])
def test_expand3_parity_random(seed, out_cap):
    rng = np.random.default_rng(seed)
    nl = 2 if out_cap > 4096 else 4
    off, c1, tb, tp, total, refs = make_tokens(rng, out_cap, nlanes=nl)
    got = np.asarray(
        expand_fused3(off, c1, tb, tp, total, out_cap=out_cap,
                      interpret=True)
    )
    for b in range(refs.shape[0]):
        n = int(total[b])
        np.testing.assert_array_equal(got[b, :n], refs[b, :n])
        assert (got[b, n:] == 0).all()


def test_expand3_overlap_runs():
    """dist < len runs (the off1/off2 cases) and deep nesting."""
    rng = np.random.default_rng(7)
    off, c1, tb, tp, total, refs = make_tokens(
        rng, 4096, max_dist=4, max_len=258, nlanes=4, lit_bias=0.15)
    got = np.asarray(
        expand_fused3(off, c1, tb, tp, total, out_cap=4096, interpret=True)
    )
    for b in range(4):
        n = int(total[b])
        np.testing.assert_array_equal(got[b, :n], refs[b, :n])


def test_expand3_empty_and_all_literal():
    out_cap = 2048
    K = out_cap + 16
    off = np.full((2, K), out_cap, np.int32)
    c1 = np.zeros((2, K), np.int32)
    tb = np.zeros((2, K), np.int32)
    # lane 0: empty; lane 1: 300 literals
    for k in range(300):
        off[1, k] = k
        c1[1, k] = k & 0xFF
    tp = jnp.asarray(np.array([0, 300], np.int32))
    total = jnp.asarray(np.array([0, 300], np.int32))
    got = np.asarray(expand_fused3(
        jnp.asarray(off), jnp.asarray(c1), jnp.asarray(tb), tp, total,
        out_cap=out_cap, interpret=True))
    assert (got[0] == 0).all()
    np.testing.assert_array_equal(got[1, :300], np.arange(300) & 0xFF)


def test_expand3_long_runs():
    """Multi-KB constant-distance runs (the far-pull path): a 40 KB d=1
    zero-run and a 20 KB d=7 pattern run, plus nested structure after."""
    out_cap = 65536
    K = out_cap + 16
    off = np.full((1, K), out_cap, np.int32)
    c1 = np.zeros((1, K), np.int32)
    tb = np.zeros((1, K), np.int32)
    toks = [(0, 0, 0, 0)]  # one zero literal
    out = [0]
    pos = 1
    while pos < 40961:  # d=1 run, ~40 KB
        ln = min(258, 40961 - pos)
        toks.append((pos, 1, ln, 1))
        out.extend([out[-1]] * ln)
        pos += ln
    for v in (1, 2, 3, 4, 5, 6, 7):
        toks.append((pos, 0, v, 0))
        out.append(v)
        pos += 1
    end = pos + 20000
    while pos < end:  # d=7 run, ~20 KB
        ln = min(258, end - pos)
        toks.append((pos, 1, ln, 7))
        for _ in range(ln):
            out.append(out[len(out) - 7])
        pos += ln
    toks.append((pos, 1, 258, 256))  # far flat copy
    for _ in range(258):
        out.append(out[len(out) - 256])
    pos += 258
    for k, (o, kind, ta, d) in enumerate(toks):
        off[0, k] = o
        c1[0, k] = (kind << 9) | ta
        tb[0, k] = d
    tp = jnp.asarray(np.array([len(toks)], np.int32))
    total = jnp.asarray(np.array([pos], np.int32))
    got = np.asarray(expand_fused3(
        jnp.asarray(off), jnp.asarray(c1), jnp.asarray(tb), tp, total,
        out_cap=out_cap, interpret=True))
    np.testing.assert_array_equal(got[0, :pos], np.asarray(out, np.int32))


def test_expand3_matches_decode_pipeline():
    """End-to-end vs zlib through the real tokenizer (CPU XLA path)."""
    import zlib

    from tpu_deflate.ops.decode import decode_rows_batch
    from tpu_deflate.ops.encode import encode_blocks_batch
    from tpu_deflate.config import DeflateConfig

    rng = np.random.default_rng(3)
    chunk = 4096
    base = bytes(rng.integers(65, 91, 512).astype(np.uint8))
    data = (base * 20)[:chunk] + bytes(rng.integers(0, 256, chunk).astype(np.uint8))
    n = len(data)
    cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk)
    arr = jnp.asarray(np.frombuffer(data, np.uint8).reshape(2, chunk))
    lens = jnp.asarray(np.full(2, chunk, np.int32))
    finals = jnp.asarray(np.array([False, True]))
    out, sizes, _ = encode_blocks_batch(arr, lens, finals, config=cfg)
    body = b"".join(
        np.asarray(out)[i, : int(sizes[i])].tobytes() for i in range(2))
    assert zlib.decompress(
        b"\x78\x9c" + body + zlib.adler32(data).to_bytes(4, "big")) == data
    outs, totals, errs = decode_rows_batch(
        out, (8 * sizes).astype(jnp.int32), out_cap=chunk,
        tok_cap=chunk + 16, static_only=True)
    assert (np.asarray(errs) == 0).all()
    got = np.asarray(outs).reshape(-1)[:n].tobytes()
    assert got == data
