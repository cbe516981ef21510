"""Per-stage timing of the codec hot path on the real TPU.

Diagnostics only (stderr); not part of the bench contract.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, reps=3, name=""):
    import jax

    try:
        out = fn(*args)
    except Exception as e:
        log(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None, float("nan")
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out,
    )
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    log(f"{name:42s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from tpu_deflate.config import DeflateConfig
    from tpu_deflate.ops.decode import chunk_pwin, expand_batch, tokenize, _candidate_plane_static, _chase
    from tpu_deflate.ops.encode import encode_blocks_batch, _encode_emissions
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_corpus

    size = int(os.environ.get("BENCH_MB", "8")) << 20
    chunk = 1 << 16
    cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk)
    data = make_corpus(size)
    nchunks = size // chunk
    arr = np.frombuffer(data, np.uint8).reshape(nchunks, chunk)
    darr = jnp.asarray(arr)
    dlens = jnp.asarray(np.full(nchunks, chunk, np.int32))
    dfinals = jnp.asarray(np.zeros(nchunks, bool))
    log(f"device {jax.devices()[0]}, {size >> 20} MiB, {nchunks} chunks")

    # ---------------- encode stages ----------------
    from tpu_deflate.kernels.match2 import match_bitplane_batch

    r, t_match = timeit(
        jax.jit(lambda d, n: match_bitplane_batch(d, n, 256, 10)),
        darr, dlens, name="enc match kernel",
    )
    if r is None:  # standalone VMEM OOM: run at half batch, scale
        h = nchunks // 2
        r, t_match = timeit(
            jax.jit(lambda d, n: match_bitplane_batch(d, n, 256, 10)),
            darr[:h], dlens[:h], name="enc match kernel (B/2 x2)",
        )
        dists, lens2 = (jnp.tile(x, (2, 1)) for x in r)
        t_match *= 2
    else:
        dists, lens2 = r

    @jax.jit
    def emis(d, n, f, pd, pl_):
        fn = functools.partial(
            _encode_emissions, window=256, max_match=10,
            use_sort_matcher=False, use_pallas=False, lazy=False,
            dynamic_encode=False,
        )
        return jax.vmap(lambda a, b, c, x, y: fn(a, b, c, pre_dist=x, pre_length=y))(
            d, n, f, pd, pl_
        )

    (vals, nbs, offs, total_bits, ntok), t_emis = timeit(
        emis, darr, dlens, dfinals, dists, lens2, name="enc parse+emissions (XLA)"
    )
    log(f"  tokens/lane mean {np.asarray(ntok).mean():.0f}")

    from tpu_deflate.kernels.monotone import SLAB, mono_scatter_add
    from tpu_deflate.ops.encode import max_output_bytes

    M = max_output_bytes(chunk)

    @jax.jit
    def pack(vals, nbs, offs):
        live = nbs > 0
        s = offs & 7
        byte_idx = offs >> 3
        K = vals.shape[1]
        Kp = -(-K // SLAB) * SLAB
        pad = Kp - K
        byte_idx = jnp.pad(byte_idx, ((0, 0), (0, pad)), constant_values=M)
        c0 = ((vals & 0xFFFF) << s) & 0xFFFF
        c1 = (vals >> (16 - s)) & 0xFFFF
        c2 = (vals >> 16) >> (16 - s)
        ch = jnp.stack([jnp.where(live, c, 0) for c in (c0, c1, c2)], axis=1)
        ch = jnp.pad(ch, ((0, 0), (0, 0), (0, pad)))
        return mono_scatter_add(byte_idx, ch, M + 8)

    _, t_pack = timeit(pack, vals, nbs, offs, name="enc bit-pack mono_scatter")

    (out, sizes, _), t_enc = timeit(
        jax.jit(functools.partial(encode_blocks_batch, config=cfg)),
        darr, dlens, dfinals, name="enc TOTAL encode_blocks_batch",
    )
    log(f"encode: {size / t_enc / 1e9:.3f} GB/s")

    # ---------------- decode stages ----------------
    dends = (8 * sizes).astype(jnp.int32)
    tok_cap = chunk + 16
    pwin = chunk_pwin(chunk)
    log(f"pwin {pwin}")

    @jax.jit
    def tok(rows, ee):
        return jax.vmap(
            lambda row, e: tokenize(
                row, 0, tok_cap=tok_cap, end_bit=e, pwin=pwin,
                stop_at_eob=True, static_only=True,
            )
        )(rows, ee)

    (tk, ta, tb, tp, _tot, _pos, err), t_tok = timeit(
        tok, out, dends, name="dec tokenize (plane+chase+compact)"
    )

    # sub-stage: plane only
    @jax.jit
    def plane_only(rows, ee):
        def one(row, e):
            data_ext = jnp.pad(row, (0, max(pwin // 8, 1024) + 16))
            return _candidate_plane_static(data_ext, jnp.int32(3), pwin, e)
        return jax.vmap(one)(rows, ee)

    pl_, t_plane = timeit(plane_only, out, dends, name="dec plane only")

    @jax.jit
    def chase_only(planes):
        return jax.vmap(lambda p: _chase(p, pwin))(planes)

    _, t_chase = timeit(chase_only, pl_, name="dec chase only")

    _, t_exp = timeit(
        jax.jit(functools.partial(expand_batch, out_cap=chunk)),
        out, tk, ta, tb, tp, name="dec expand_batch (fused kernel)",
    )

    log(
        f"decode total ~ {(t_tok + t_exp) * 1e3:.1f} ms "
        f"-> {size / (t_tok + t_exp) / 1e9:.3f} GB/s"
    )


if __name__ == "__main__":
    main()
