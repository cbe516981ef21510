"""Benchmark: TPU encode/decode throughput vs the reference FPGA core.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference compresses ~1 byte / 3 cycles at 100 MHz on an
Arty A7-100 => ~0.033 GB/s (BASELINE.md, README.md:52-56,184-187).  Its
decompress is 1-4 cycles/byte => ~0.025-0.1 GB/s.  We measure GB/s on a
synthetic mixed corpus (Silesia is unreachable offline; composition chosen
to mimic text/binary/repetitive mix).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_COMPRESS_GBPS = 0.033


def make_corpus(size: int) -> bytes:
    """Mixed corpus: text, structured binary, repetitive, some noise."""
    rng = np.random.default_rng(20260816)
    parts = []
    n = 0
    i = 0
    while n < size:
        kind = i % 4
        if kind == 0:
            seg = (b"The quick brown fox jumps over the lazy dog %d.\n" % i) * 200
        elif kind == 1:
            seg = np.arange(4096, dtype=np.uint32).tobytes()
        elif kind == 2:
            seg = bytes([i & 0xFF]) * 8192
        else:
            seg = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        parts.append(seg)
        n += len(seg)
        i += 1
    return b"".join(parts)[:size]


def main():
    import jax
    import jax.numpy as jnp

    from tpu_deflate.config import DeflateConfig
    from tpu_deflate.ops.checksum import adler32_state
    from tpu_deflate.ops.encode import encode_blocks_batch
    from tpu_deflate.ops.decode import expand, tokenize

    size = 1 << 24  # 16 MiB
    chunk = 1 << 16
    cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk)
    data = make_corpus(size)

    nchunks = size // chunk
    arr = np.frombuffer(data, np.uint8).reshape(nchunks, chunk)
    lens = np.full(nchunks, chunk, np.int32)
    finals = np.zeros(nchunks, bool)
    finals[-1] = True
    darr = jnp.asarray(arr)
    dlens = jnp.asarray(lens)
    dfinals = jnp.asarray(finals)

    # --- encode ---
    def enc():
        out, sizes, _ = encode_blocks_batch(darr, dlens, dfinals, cfg)
        return out, sizes

    out, sizes = enc()  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out, sizes = enc()
    jax.block_until_ready(out)
    enc_s = (time.perf_counter() - t0) / reps
    enc_gbps = size / enc_s / 1e9

    out_h = np.asarray(out)
    sizes_h = np.asarray(sizes)
    body = b"".join(out_h[i, : sizes_h[i]].tobytes() for i in range(nchunks))
    import zlib

    assert zlib.decompress(b"\x78\x9c" + body + zlib.adler32(data).to_bytes(4, "big")) == data
    ratio = len(body) / size

    # --- decode (chunk-parallel, indexed) ---
    offsets = np.concatenate([[0], np.cumsum(sizes_h)]).astype(np.int64)
    m_pad = 1 << int(np.ceil(np.log2(max(len(body), 2))))
    buf = np.zeros(m_pad, np.uint8)
    buf[: len(body)] = np.frombuffer(body, np.uint8)
    dbuf = jnp.asarray(buf)
    dstarts = jnp.asarray(8 * offsets[:-1], jnp.int32)
    dends = jnp.asarray(8 * offsets[1:], jnp.int32)
    tok_cap = chunk + 16

    def one(s, e):
        tk, ta, tb, tp, out_total, _pos, err = tokenize(
            dbuf, s, tok_cap=tok_cap, end_bit=e
        )
        o, total = expand(dbuf, tk, ta, tb, tp, out_cap=chunk)
        return o, total, err

    dec = jax.jit(jax.vmap(one))

    outs, totals, errs = dec(dstarts, dends)  # compile
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(reps):
        outs, totals, errs = dec(dstarts, dends)
    jax.block_until_ready(outs)
    dec_s = (time.perf_counter() - t0) / reps
    dec_gbps = size / dec_s / 1e9

    assert (np.asarray(errs) == 0).all()
    got = np.asarray(outs).reshape(-1)[: size]
    assert got.tobytes() == data, "decode mismatch"

    print(
        json.dumps(
            {
                "metric": "encode_throughput_64KiB_chunks_win256_m10",
                "value": round(enc_gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(enc_gbps / BASELINE_COMPRESS_GBPS, 2),
                "decode_gbps": round(dec_gbps, 4),
                "compression_ratio": round(ratio, 4),
                "corpus_bytes": size,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
