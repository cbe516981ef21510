"""Benchmark: TPU encode/decode throughput vs the reference FPGA core.

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline",
...}.  Progress/diagnostics go to stderr.

Baseline: the reference compresses ~1 byte / 3 cycles at 100 MHz on an
Arty A7-100 => ~0.033 GB/s (BASELINE.md, README.md:52-56,184-187); its
decompress is 1-4 cycles/byte => ~0.025-0.1 GB/s.  We measure GB/s on a
synthetic mixed corpus (Silesia is unreachable offline; composition chosen
to mimic a text/binary/repetitive mix).

Env overrides: BENCH_MB (default 8), BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_COMPRESS_GBPS = 0.033


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_corpus(size: int) -> bytes:
    """Mixed corpus: text, structured binary, repetitive runs, noise."""
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
    from tpu_deflate.ops.encode import encode_blocks_batch
    from tpu_deflate.ops.decode import expand_batch, tokenize

    size = int(os.environ.get("BENCH_MB", "8")) << 20
    reps = int(os.environ.get("BENCH_REPS", "3"))
    chunk = 1 << 16
    cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk)
    log(f"bench: {size >> 20} MiB, chunk {chunk}, device {jax.devices()[0]}")
    data = make_corpus(size)

    nchunks = size // chunk
    arr = np.frombuffer(data, np.uint8).reshape(nchunks, chunk)
    lens = np.full(nchunks, chunk, np.int32)
    finals = np.zeros(nchunks, bool)
    finals[-1] = True
    darr = jnp.asarray(arr)
    dlens = jnp.asarray(lens)
    dfinals = jnp.asarray(finals)
    log("corpus on device")

    # --- encode ---
    def enc():
        out, sizes, _ = encode_blocks_batch(darr, dlens, dfinals, cfg)
        return out, sizes

    t0 = time.perf_counter()
    out, sizes = enc()  # compile
    np.asarray(sizes)  # host fetch = honest sync (block_until_ready can
    # return early for some programs on this platform)
    log(f"encode compiled+ran in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(reps):
        out, sizes = enc()
    np.asarray(sizes)
    enc_s = (time.perf_counter() - t0) / reps
    enc_gbps = size / enc_s / 1e9
    log(f"encode: {enc_s * 1e3:.1f} ms -> {enc_gbps:.3f} GB/s")

    out_h = np.asarray(out)
    sizes_h = np.asarray(sizes)
    body = b"".join(out_h[i, : sizes_h[i]].tobytes() for i in range(nchunks))
    import zlib

    assert (
        zlib.decompress(b"\x78\x9c" + body + zlib.adler32(data).to_bytes(4, "big"))
        == data
    ), "encode output invalid"
    ratio = len(body) / size
    log(f"ratio {ratio:.4f}, verified vs zlib")

    result = {
        "metric": "encode_throughput_64KiB_chunks_win256_m10",
        "value": round(enc_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(enc_gbps / BASELINE_COMPRESS_GBPS, 2),
        "compression_ratio": round(ratio, 4),
        "corpus_bytes": size,
        "device": str(jax.devices()[0]),
    }

    # --- decode (chunk-parallel, straight from the encoder's rows) -----
    try:
        dends = (8 * sizes).astype(jnp.int32)
        tok_cap = chunk + 16
        from tpu_deflate.ops.decode import decode_rows_batch

        dec = jax.jit(
            lambda rows, ee: decode_rows_batch(
                rows, ee, out_cap=chunk, tok_cap=tok_cap, static_only=True
            )
        )
        t0 = time.perf_counter()
        outs, totals, errs = dec(out, dends)
        np.asarray(totals)  # honest sync
        log(f"decode compiled+ran in {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(reps):
            outs, totals, errs = dec(out, dends)
        np.asarray(totals)
        dec_s = (time.perf_counter() - t0) / reps
        dec_gbps = size / dec_s / 1e9
        log(f"decode: {dec_s * 1e3:.1f} ms -> {dec_gbps:.3f} GB/s")

        assert (np.asarray(errs) == 0).all(), "decode error codes"
        got = np.asarray(outs).reshape(-1)[:size]
        assert got.tobytes() == data, "decode mismatch"
        result["decode_gbps"] = round(dec_gbps, 4)
    except Exception as e:  # keep the encode metric even if decode fails
        log(f"decode stage failed: {type(e).__name__}: {e}")
        result["decode_gbps"] = None

    print(json.dumps(result))


if __name__ == "__main__":
    main()
