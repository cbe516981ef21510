"""Stage-level encode profiling on the real chip (honest tiny-output sync)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_deflate.config import DeflateConfig
from tpu_deflate.ops import encode as E


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / reps


def make_corpus(size: int) -> bytes:
    rng = np.random.default_rng(20260816)
    parts, n, i = [], 0, 0
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
    size = int(os.environ.get("BENCH_MB", "8")) << 20
    chunk = 1 << 16
    window, max_match = 256, 10
    data = make_corpus(size)
    nchunks = size // chunk
    arr = np.frombuffer(data, np.uint8).reshape(nchunks, chunk)
    darr = jnp.asarray(arr)
    dlens = jnp.full(nchunks, chunk, jnp.int32)
    dfinals = jnp.zeros(nchunks, bool).at[-1].set(True)
    N = chunk
    idx = jnp.arange(N, dtype=jnp.int32)

    def key3_of(row, n):
        b = row.astype(jnp.int32)
        b1 = jnp.concatenate([b[1:], jnp.zeros((1,), jnp.int32)])
        b2 = jnp.concatenate([b[2:], jnp.zeros((2,), jnp.int32)])
        k = b | (b1 << 8) | (b2 << 16)
        return jnp.where(idx + 3 <= n, k, (1 << 24) + idx)

    # stage 1: match sweep
    def s1(rows, ns):
        keys = jax.vmap(key3_of)(rows, ns)
        d = jax.vmap(lambda k: E._match_candidates_window(k, window))(keys)
        return jnp.sum(d[:, ::257]), d

    s1j = jax.jit(lambda rows, ns: s1(rows, ns)[0])
    t1 = timeit(s1j, darr, dlens)
    log(f"stage1 match sweep: {t1*1e3:.1f} ms")

    dists = jax.block_until_ready(jax.jit(lambda r, n: s1(r, n)[1])(darr, dlens))

    # stage 2: extension (select)
    def s2(rows, dists, ns):
        b = rows.astype(jnp.int32)
        ln = jax.vmap(
            lambda bb, dd, nn: E._extend_matches_select(bb, dd, nn, max_match, window)
        )(b, dists, ns)
        return jnp.sum(ln[:, ::257])

    t2 = timeit(jax.jit(s2), darr, dists, dlens)
    log(f"stage2 extend select: {t2*1e3:.1f} ms")

    # stage 3: parse chase
    lens = jax.block_until_ready(
        jax.jit(
            lambda rows, dd, ns: jax.vmap(
                lambda bb, d2, nn: E._extend_matches_select(
                    bb.astype(jnp.int32), d2, nn, max_match, window
                )
            )(rows, dd, ns)
        )(darr, dists, dlens)
    )

    def s3(lens, ns):
        st = jax.vmap(E._greedy_parse_chase)(lens, ns)
        return jnp.sum(st[:, ::257].astype(jnp.int32))

    t3 = timeit(jax.jit(s3), lens, dlens)
    log(f"stage3 parse chase: {t3*1e3:.1f} ms")

    # full emissions (stages 1-4 values)
    f = functools.partial(
        E._encode_emissions,
        window=window,
        max_match=max_match,
        use_sort_matcher=False,
        lazy=False,
        dynamic_encode=False,
    )

    def s4(rows, ns, fins):
        vals, nbs, offs, total_bits, ntok = jax.vmap(f)(rows, ns, fins)
        return jnp.sum(total_bits)

    t4 = timeit(jax.jit(s4), darr, dlens, dfinals)
    log(f"emissions total (s1-4): {t4*1e3:.1f} ms")

    # full batch encode
    cfg = DeflateConfig(window=window, max_match=max_match, chunk_size=chunk)
    enc = jax.jit(
        lambda rows, ns, fins: jnp.sum(
            E.encode_blocks_batch(rows, ns, fins, cfg)[1]
        )
    )
    t5 = timeit(enc, darr, dlens, dfinals)
    log(f"full encode_blocks_batch: {t5*1e3:.1f} ms ({size/t5/1e9:.4f} GB/s)")

    log("done")


if __name__ == "__main__":
    main()
