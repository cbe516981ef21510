"""Phase profile of the CURRENT batched encode at the bench shape.

Phases: match2 kernel | emissions (vmapped stage 3-4 values) | pack
(channel split + mono_scatter_add + byte reassembly + finalize).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_deflate.config import DeflateConfig
from tpu_deflate.ops import encode as E


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    np.asarray(x.reshape(-1)[:1])  # 1-element fetch, not a full transfer


def timeit(fn, *args, reps=3):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / reps


def main():
    import gzip
    import hashlib

    size = int(os.environ.get("BENCH_MB", "8")) << 20
    chunk = 1 << 16
    window, max_match = 256, 10
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "corpus.bin.gz")
    data = gzip.decompress(open(path, "rb").read())
    while len(data) < size:
        data += data
    data = data[:size]
    B = size // chunk
    darr = jnp.asarray(np.frombuffer(data, np.uint8).reshape(B, chunk))
    dlens = jnp.full(B, chunk, jnp.int32)
    dfinals = jnp.zeros(B, bool).at[-1].set(True)
    log(f"B={B} chunk={chunk}")

    from tpu_deflate.kernels.match2 import match_bitplane_batch

    m2 = jax.jit(lambda d, n: match_bitplane_batch(d, n, window, max_match))
    t = timeit(m2, darr, dlens)
    log(f"match2 kernel:  {t*1e3:6.1f} ms")
    dists, lens2 = jax.block_until_ready(m2(darr, dlens))

    f = functools.partial(
        E._encode_emissions, window=window, max_match=max_match,
        use_sort_matcher=False,
    )

    def f2(d, n_, fin, pd, pl_):
        return f(d, n_, fin, pre_dist=pd, pre_length=pl_)

    emis = jax.jit(lambda *a: jax.vmap(f2)(*a))
    t = timeit(emis, darr, dlens, dfinals, dists, lens2)
    log(f"emissions:      {t*1e3:6.1f} ms")
    vals, nbs, offs, total_bits, ntok = jax.block_until_ready(
        emis(darr, dlens, dfinals, dists, lens2))

    from tpu_deflate.kernels.monotone import SLAB, mono_scatter_add

    M = E.max_output_bytes(chunk)

    @jax.jit
    def pack(vals, nbs, offs, total_bits):
        live = nbs > 0
        emax = 20
        nch = 2
        s = offs & 7
        byte_idx = offs >> 3
        K = vals.shape[1]
        Kp = -(-K // SLAB) * SLAB
        pad = Kp - K
        byte_idx = jnp.pad(byte_idx, ((0, 0), (0, pad)), constant_values=M)
        c0 = ((vals & 0xFFFF) << s) & 0xFFFF
        c1 = (vals >> (16 - s)) & 0xFFFF
        ch = jnp.stack([jnp.where(live, c, 0) for c in (c0, c1)], axis=1)
        ch = jnp.pad(ch, ((0, 0), (0, 0), (0, pad)))
        packed = mono_scatter_add(byte_idx, ch, M + 8, emax_bits=emax)
        out = (packed[:, 0, :M] & 0xFF) + jnp.pad(
            (packed[:, 0, : M - 1] >> 8) & 0xFF, ((0, 0), (1, 0)))
        out = out + jnp.pad(packed[:, 1, : M - 2] & 0xFF, ((0, 0), (2, 0)))
        out = out + jnp.pad(
            (packed[:, 1, : M - 3] >> 8) & 0xFF, ((0, 0), (3, 0)))
        outs, out_lens = jax.vmap(
            functools.partial(E._finalize_block, M=M)
        )(darr, dlens, dfinals, out, total_bits)
        return outs, out_lens

    t = timeit(pack, vals, nbs, offs, total_bits)
    log(f"pack+finalize:  {t*1e3:6.1f} ms")

    enc = jax.jit(functools.partial(
        E.encode_blocks_batch,
        config=DeflateConfig(window=256, max_match=10, chunk_size=chunk)))
    t = timeit(enc, darr, dlens, dfinals)
    log(f"full encode:    {t*1e3:6.1f} ms  ({size/t/1e9:.3f} GB/s)")


if __name__ == "__main__":
    main()
