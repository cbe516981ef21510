"""Stage-level decode profiling on the real chip.

Each stage is wrapped so the jitted program returns only a tiny reduction
— fetching it is an honest sync without host-transfer pollution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_deflate.config import DeflateConfig
from tpu_deflate.ops.encode import encode_blocks_batch
from tpu_deflate.ops import decode as D


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3):
    """fn must return a small array; np.asarray of it is the sync."""
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
    cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk)
    data = make_corpus(size)
    nchunks = size // chunk
    arr = np.frombuffer(data, np.uint8).reshape(nchunks, chunk)
    darr = jnp.asarray(arr)
    dlens = jnp.full(nchunks, chunk, jnp.int32)
    dfinals = jnp.zeros(nchunks, bool).at[-1].set(True)

    log("encoding corpus once...")
    out, sizes, _ = encode_blocks_batch(darr, dlens, dfinals, cfg)
    out = jax.block_until_ready(out)
    dends = (8 * sizes).astype(jnp.int32)
    tok_cap = chunk + 16
    pwin = 1 << 18

    def tok_core(rows, ee):
        return jax.vmap(
            lambda row, e: D.tokenize(
                row, 0, tok_cap=tok_cap, end_bit=e, pwin=pwin, stop_at_eob=True
            )
        )(rows, ee)

    tok_sum = jax.jit(lambda rows, ee: jnp.sum(tok_core(rows, ee)[3]))
    t = timeit(tok_sum, out, dends)
    log(f"tokenize: {t*1e3:.1f} ms  ({size/t/1e9:.4f} GB/s)")

    tk, ta, tb, tp, tot, pos, err = jax.jit(tok_core)(out, dends)
    tk, ta, tb, tp = map(jax.block_until_ready, (tk, ta, tb, tp))

    exp_sum = jax.jit(
        lambda rows, tk, ta, tb, tp: jnp.sum(
            D.expand_batch(rows, tk, ta, tb, tp, out_cap=chunk)[0][:, ::257].astype(jnp.int32)
        )
    )
    t2 = timeit(exp_sum, out, tk, ta, tb, tp)
    log(f"expand:   {t2*1e3:.1f} ms  ({size/t2/1e9:.4f} GB/s)")

    lit_lim = jnp.asarray(D._S_LIT_LIM)
    lit_rd = jnp.asarray(D._S_LIT_RD)
    lit_meta = jnp.asarray(D._S_LIT_META)
    dist_lim = jnp.asarray(D._S_DIST_LIM)
    dist_rd = jnp.asarray(D._S_DIST_RD)
    dist_meta = jnp.asarray(D._S_DIST_META)

    def plane_core(rows, ee):
        def one(row, e):
            d = jnp.pad(row, (0, pwin // 8 + 16))
            return D._candidate_plane(
                d, jnp.int32(0), pwin, e,
                lit_lim, lit_rd, lit_meta, dist_lim, dist_rd, dist_meta,
            )
        return jax.vmap(one)(rows, ee)

    plane_sum = jax.jit(lambda rows, ee: jnp.sum(plane_core(rows, ee)[:, ::511]))
    t3 = timeit(plane_sum, out, dends)
    log(f"plane (1 pass/lane): {t3*1e3:.1f} ms")

    planes = jax.block_until_ready(jax.jit(plane_core)(out, dends))
    chase_sum = jax.jit(
        lambda planes: jnp.sum(
            jax.vmap(lambda p: D._chase(p, pwin))(planes).astype(jnp.int32)[:, ::509]
        )
    )
    t4 = timeit(chase_sum, planes)
    log(f"chase (1 pass/lane): {t4*1e3:.1f} ms")

    import functools
    from tpu_deflate.kernels.resolve import resolve_roots

    def fields_core(rows, tk, ta, tb, tp):
        any_stored = jnp.any(
            (tk == D.TK_STORED) & (jnp.arange(tk.shape[-1]) < tp[..., None])
        )
        return jax.vmap(
            functools.partial(D._expand_fields, out_cap=chunk),
            in_axes=(0, 0, 0, 0, 0, None),
        )(rows, tk, ta, tb, tp, any_stored)

    fields_sum = jax.jit(
        lambda *a: jnp.sum(fields_core(*a)[1][:, ::257])
    )
    t5 = timeit(fields_sum, out, tk, ta, tb, tp)
    log(f"expand fields: {t5*1e3:.1f} ms")

    val, parent, in_range, total = jax.jit(fields_core)(out, tk, ta, tb, tp)
    val, parent = map(jax.block_until_ready, (val, parent))
    res_sum = jax.jit(lambda p, v: jnp.sum(resolve_roots(p, v)[:, ::257]))
    t6 = timeit(res_sum, parent, val)
    log(f"resolve_roots: {t6*1e3:.1f} ms")

    log("done")


if __name__ == "__main__":
    main()
