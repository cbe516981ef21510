"""Benchmark: TPU encode/decode throughput vs the reference FPGA core.

Prints ONE JSON line to stdout.  Progress/diagnostics go to stderr.

Corpus: 8 MiB of REAL data vendored at tests/data/corpus.bin.gz (Python
stdlib sources + a shared object + distribution docs — a Silesia-like
text/code/binary mix; sha256-pinned).  Fields:

  value                 encode GB/s, 64 KiB chunks, win256/m10 (headline;
                        vs_baseline = vs the reference FPGA's ~0.033)
  decode_gbps           chunk-parallel decode of the own container
  encode_fullwindow_gbps  32 KB window / max_match 258 / lazy encode
  decode_dynamic_gbps   decode of the own dynamic-Huffman container
  decode_foreign_gbps   single zlib -6 stream (the reference's workload,
                        /root/reference/deflate.py:1084-1517)
  ratio / ratio_vs_zlib6  compressed/raw; best-config size vs zlib -6
  roofline_frac         decode_gbps / ~819 GB/s v5e HBM bandwidth

Env: BENCH_MB (default 8), BENCH_REPS (default 3), BENCH_FAST=1 skips
the slower secondary metrics, BENCH_BUDGET_S (default 480) is a wall
clock budget — secondary stages are skipped once exceeded (default
raised r5: the foreign + dynamic stages add compile time; the staged
re-print below keeps partial results safe under any external timeout).

The driver contract is "ONE JSON line", but driver runs have died to
tunnel-compile stalls (BENCH_r03: rc=124 before any output).  Defense in
depth: the current result JSON is RE-printed after every completed stage,
so a timeout kill still leaves the most recent complete line on stdout;
the last line printed is always the most complete (the reference's L6
equivalent always completes, /root/reference/Makefile:15-17).
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import sys
import time

import numpy as np

BASELINE_COMPRESS_GBPS = 0.033
HBM_GBPS = 819.0  # v5e peak HBM bandwidth
CORPUS_SHA = "849e6293c67ab78bf5854ce09a7b27168557ca47b4e2603a50ef6c129f363d41"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_corpus(size: int) -> bytes:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "data", "corpus.bin.gz")
    with open(path, "rb") as f:
        data = gzip.decompress(f.read())
    assert hashlib.sha256(data).hexdigest() == CORPUS_SHA, "corpus corrupt"
    while len(data) < size:
        data += data
    return data[:size]


def _sync(x):
    np.asarray(x.reshape(-1)[:1])


def timed(fn, *args, reps=3):
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    return out, (time.perf_counter() - t0) / reps


def main():
    import functools
    import zlib

    import jax
    import jax.numpy as jnp

    from tpu_deflate.config import DeflateConfig
    from tpu_deflate.ops.decode import decode_rows_batch
    from tpu_deflate.ops.encode import encode_blocks_batch

    from tpu_deflate.utils.profiling import Profiler

    prof = Profiler()
    wall0 = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", "1800"))  # staged
    # re-print keeps the last complete line on stdout even if killed

    def over_budget(stage):
        spent = time.perf_counter() - wall0
        if spent > budget:
            log(f"budget: skipping {stage} ({spent:.0f}s > {budget:.0f}s)")
            return True
        return False

    size = int(os.environ.get("BENCH_MB", "8")) << 20
    # one host sync through the tunnel costs ~27 ms; reps amortize it so
    # the reported steady-state is compute, not tunnel round-trip
    reps = int(os.environ.get("BENCH_REPS", "10"))
    fast = bool(os.environ.get("BENCH_FAST"))
    chunk = 1 << 16
    cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk)
    log(f"bench: {size >> 20} MiB real corpus, chunk {chunk}, "
        f"device {jax.devices()[0]}")
    data = load_corpus(size)

    nchunks = size // chunk
    darr = jnp.asarray(np.frombuffer(data, np.uint8).reshape(nchunks, chunk))
    dlens = jnp.asarray(np.full(nchunks, chunk, np.int32))
    finals = np.zeros(nchunks, bool)
    finals[-1] = True
    dfinals = jnp.asarray(finals)

    # ---------------- encode (headline) --------------------------------
    enc = jax.jit(functools.partial(encode_blocks_batch, config=cfg))
    t0 = time.perf_counter()
    with prof.stage("encode_wall_incl_compile", nbytes=size * reps):
        (out, sizes, _), enc_s = timed(enc, darr, dlens, dfinals, reps=reps)
    log(f"encode compiled+ran, steady {enc_s * 1e3:.1f} ms "
        f"-> {size / enc_s / 1e9:.3f} GB/s "
        f"(total wall {time.perf_counter() - t0:.0f}s)")
    enc_gbps = size / enc_s / 1e9

    out_h = np.asarray(out)
    sizes_h = np.asarray(sizes)
    body = b"".join(out_h[i, : sizes_h[i]].tobytes() for i in range(nchunks))
    stream = b"\x78\x9c" + body + zlib.adler32(data).to_bytes(4, "big")
    assert zlib.decompress(stream) == data, "encode output invalid"
    ratio = len(body) / size
    log(f"ratio {ratio:.4f}, verified vs zlib")

    result = {
        "metric": "encode_throughput_64KiB_chunks_win256_m10",
        "value": round(enc_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(enc_gbps / BASELINE_COMPRESS_GBPS, 2),
        "compression_ratio": round(ratio, 4),
        "corpus_bytes": size,
        "corpus": "real (stdlib sources + shared object + docs)",
        "device": str(jax.devices()[0]),
    }

    # ---------------- decode (own static container) --------------------
    try:
        dends = (8 * sizes).astype(jnp.int32)
        dec = jax.jit(lambda rows, ee: decode_rows_batch(
            rows, ee, out_cap=chunk, tok_cap=chunk + 16, static_only=True))
        with prof.stage("decode_wall_incl_compile", nbytes=size * reps):
            (outs, totals, errs), dec_s = timed(dec, out, dends, reps=reps)
        assert (np.asarray(errs) == 0).all(), "decode error codes"
        got = np.asarray(outs).reshape(-1)[:size]
        assert got.tobytes() == data, "decode mismatch"
        dec_gbps = size / dec_s / 1e9
        log(f"decode: {dec_s * 1e3:.1f} ms -> {dec_gbps:.3f} GB/s")
        result["decode_gbps"] = round(dec_gbps, 4)
        result["roofline_frac"] = round(dec_gbps / HBM_GBPS, 6)
    except Exception as e:
        log(f"decode stage failed: {type(e).__name__}: {e}")
        result["decode_gbps"] = None

    print(json.dumps(result), flush=True)  # headline lands even if a
    if fast:                               # later stage stalls the process
        return

    # ---------------- dynamic-tree encode + decode ---------------------
    try:
        if over_budget("dynamic stage"):
            raise TimeoutError("budget")
        dyn_cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk,
                                dynamic_encode=True)
        encd = jax.jit(functools.partial(encode_blocks_batch, config=dyn_cfg))
        (outd, sizesd, _), _ = timed(encd, darr, dlens, dfinals, reps=1)
        sizesd_h = np.asarray(sizesd)
        bodyd = b"".join(
            np.asarray(outd)[i, : sizesd_h[i]].tobytes() for i in range(nchunks)
        )
        assert zlib.decompress(
            b"\x78\x9c" + bodyd + zlib.adler32(data).to_bytes(4, "big")
        ) == data
        result["ratio_dynamic"] = round(len(bodyd) / size, 4)
        dendsd = (8 * sizesd).astype(jnp.int32)
        decd = jax.jit(lambda rows, ee: decode_rows_batch(
            rows, ee, out_cap=chunk, tok_cap=chunk + 16, static_only=False))
        (outs, totals, errs), dyn_s = timed(decd, outd, dendsd, reps=reps)
        assert (np.asarray(errs) == 0).all()
        assert np.asarray(outs).reshape(-1)[:size].tobytes() == data
        result["decode_dynamic_gbps"] = round(size / dyn_s / 1e9, 4)
        log(f"decode dynamic: {dyn_s * 1e3:.1f} ms -> "
            f"{result['decode_dynamic_gbps']} GB/s, ratio {result['ratio_dynamic']}")
    except Exception as e:
        log(f"dynamic stage failed: {type(e).__name__}: {e}")
        result["decode_dynamic_gbps"] = None
    print(json.dumps(result), flush=True)

    # ---------------- foreign single zlib stream -----------------------
    try:
        if over_budget("foreign stage"):
            raise TimeoutError("budget")
        from tpu_deflate.ops.decode import inflate_device

        # full-corpus stream (>= 8 MiB): zlib -6 emits a block per ~16 K
        # symbols, so the multi-block per-block fixed costs are visible
        fsize = size
        fraw = data[:fsize]
        fstream = zlib.compress(fraw, 6)
        t0 = time.perf_counter()
        o, total, _pos = inflate_device(fstream, start_bit=16)
        assert o[:total].tobytes() == fraw
        # steady-state: repeat (device work dominates; host loop is part
        # of the honest cost of the sequential foreign path)
        t0 = time.perf_counter()
        o, total, _pos = inflate_device(fstream, start_bit=16)
        f_s = time.perf_counter() - t0
        result["decode_foreign_gbps"] = round(fsize / f_s / 1e9, 4)
        result["foreign_bytes"] = fsize
        log(f"foreign zlib-6 stream: {f_s * 1e3:.1f} ms -> "
            f"{result['decode_foreign_gbps']} GB/s on {fsize >> 20} MiB")
    except Exception as e:
        log(f"foreign stage failed: {type(e).__name__}: {e}")
        result["decode_foreign_gbps"] = None

    # ---------------- foreign gzip (device member walk) ----------------
    try:
        if over_budget("foreign gzip stage"):
            raise TimeoutError("budget")
        import gzip as _gz

        from tpu_deflate.api import decompress_gzip

        gsize = min(size, 1 << 20)
        graw = data[:gsize]
        gstream = _gz.compress(graw, 6)
        assert decompress_gzip(gstream) == graw  # compile + verify
        t0 = time.perf_counter()
        assert decompress_gzip(gstream) == graw
        g_s = time.perf_counter() - t0
        result["decode_foreign_gzip_gbps"] = round(gsize / g_s / 1e9, 4)
        log(f"foreign gzip stream: {g_s * 1e3:.1f} ms -> "
            f"{result['decode_foreign_gzip_gbps']} GB/s on {gsize >> 20} MiB")
    except Exception as e:
        log(f"foreign gzip stage failed: {type(e).__name__}: {e}")
        result["decode_foreign_gzip_gbps"] = None

    # ---------------- full-window encode (static, speed) ---------------
    try:
        if over_budget("full-window stage"):
            raise TimeoutError("budget")
        fw_mb = min(size, 2 << 20)  # the sort matcher is O(N log N)-heavy
        raw = data[:fw_mb]
        nfw = fw_mb // chunk
        finf = np.zeros(nfw, bool)
        finf[-1] = True
        # speed end of the far-matcher knob; the best-ratio stage below
        # keeps the exact matcher (ratio_vs_zlib6 is its bar)
        fw_cfg = DeflateConfig(window=32768, max_match=258, lazy=True,
                               chunk_size=chunk, far_matcher="fast")
        encf = jax.jit(functools.partial(encode_blocks_batch, config=fw_cfg))
        (outf, sizesf, _), fw_s = timed(
            encf, darr[:nfw], dlens[:nfw], jnp.asarray(finf), reps=1)
        sizesf_h = np.asarray(sizesf)
        bodyf = b"".join(
            np.asarray(outf)[i, : sizesf_h[i]].tobytes() for i in range(nfw)
        )
        assert zlib.decompress(
            b"\x78\x9c" + bodyf + zlib.adler32(raw).to_bytes(4, "big")
        ) == raw
        result["encode_fullwindow_gbps"] = round(fw_mb / fw_s / 1e9, 4)
        result["ratio_fullwindow"] = round(len(bodyf) / fw_mb, 4)
        log(f"full-window encode: {fw_s * 1e3:.1f} ms -> "
            f"{result['encode_fullwindow_gbps']} GB/s, "
            f"ratio {result['ratio_fullwindow']}")
    except Exception as e:
        log(f"full-window stage failed: {type(e).__name__}: {e}")
        result["encode_fullwindow_gbps"] = None
    print(json.dumps(result), flush=True)

    # ---------------- best-ratio config vs zlib -6 ----------------------
    try:
        if over_budget("best-ratio stage"):
            raise TimeoutError("budget")
        # best-ratio config: full window + dynamic trees + lazy, 256 KiB
        # chunks (fewer window resets / tree headers; measured 1.062x
        # zlib-6 size on this corpus vs 1.095x at 64 KiB chunks)
        fw_chunk = 1 << 18
        br_cfg = DeflateConfig(window=32768, max_match=258, lazy=True,
                               dynamic_encode=True, chunk_size=fw_chunk)
        nbr = fw_mb // fw_chunk
        finb = np.zeros(nbr, bool)
        finb[-1] = True
        bdarr = jnp.asarray(
            np.frombuffer(raw, np.uint8).reshape(nbr, fw_chunk))
        bdlens = jnp.full(nbr, fw_chunk, jnp.int32)
        encb = jax.jit(functools.partial(encode_blocks_batch, config=br_cfg))
        (outb, sizesb, _), br_s = timed(
            encb, bdarr, bdlens, jnp.asarray(finb), reps=1)
        sizesb_h = np.asarray(sizesb)
        bodyb = b"".join(
            np.asarray(outb)[i, : sizesb_h[i]].tobytes() for i in range(nbr)
        )
        assert zlib.decompress(
            b"\x78\x9c" + bodyb + zlib.adler32(raw).to_bytes(4, "big")
        ) == raw
        z6 = len(zlib.compress(raw, 6))
        result["ratio_best"] = round(len(bodyb) / fw_mb, 4)
        result["ratio_vs_zlib6"] = round(len(bodyb) / z6, 4)
        result["encode_best_ratio_gbps"] = round(fw_mb / br_s / 1e9, 4)
        log(f"best-ratio encode: {br_s * 1e3:.1f} ms, "
            f"ratio {result['ratio_best']} "
            f"({result['ratio_vs_zlib6']}x zlib-6 size)")
    except Exception as e:
        log(f"best-ratio stage failed: {type(e).__name__}: {e}")
        result["ratio_vs_zlib6"] = None
    print(json.dumps(result), flush=True)

    log("stage profile:", prof.report())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
