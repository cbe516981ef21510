"""Debug probe: dump packed-matcher intermediates (pg, seed) per group
and diff them against a numpy recomputation.  Small shapes, window=64.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PCPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
B, N = int(os.environ.get("PB", 8)), int(os.environ.get("PN", 65536))
seg = N // LANES
segW = seg // 4
window, max_match = int(os.environ.get("PW", 64)), 10
E = -(-(seg + max_match) // 512) * 512
EW = E // 4
L = -(-(window + E) // 512) * 512
PV = L // 4
halo = window
HW = halo // 4
NG = window // 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def kern_dbg(n_ref, w_ref, pg_ref, seed_ref, pgn_ref, s1_ref, s2_ref):
    M7 = jnp.uint32(0x7F7F7F7F)
    H8 = jnp.uint32(0x80808080)
    W = [w_ref[0, s] for s in range(4)]
    X = W[0][:, HW : HW + EW]
    for g in range(NG):
        pg = jnp.zeros((LANES, EW), jnp.uint32)
        for t in range(8):
            d = 8 * g + 1 + t
            q, s = divmod(d, 4)
            Y = W[s][:, HW - q : HW - q + EW]
            z = X ^ Y
            u = H8 - (z & M7)
            zb = u & ~z & H8
            pg = pg | ((zb >> 7) << t)
        pgn = jnp.concatenate(
            [pg[:, 1:], jnp.zeros((LANES, 1), jnp.uint32)], axis=1)
        s1 = (pg >> 8) | (pgn << 24)
        s2 = (pg >> 16) | (pgn * jnp.uint32(1 << 16))
        seed = pg & s1 & s2
        pg_ref[0, g] = pg
        seed_ref[0, g] = seed
        pgn_ref[0, g] = pgn
        s1_ref[0, g] = s1
        s2_ref[0, g] = s2


def pack_streams(ext):
    b8 = (ext & 0xFF).astype(jnp.uint32)
    v0 = (b8[..., 0::4] | (b8[..., 1::4] << 8) | (b8[..., 2::4] << 16)
          | (b8[..., 3::4] << 24))
    prev = jnp.pad(v0[..., :-1], ((0, 0), (0, 0), (1, 0)))
    streams = [v0]
    for s in (1, 2, 3):
        streams.append((prev >> (32 - 8 * s)) | (v0 << (8 * s)))
    return jnp.stack(streams, axis=1)


def main():
    log("device:", jax.devices()[0], "B", B, "N", N, "window", window)
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(1)
    ext_np = rng.integers(0, 8, (B, LANES, L), dtype=np.int32)
    ext_np[:, 0, :halo] = -1
    ext = jnp.asarray(ext_np)
    nn = jnp.full((B,), N, jnp.int32)

    def run(nv, e):
        Wst = pack_streams(e)
        return pl.pallas_call(
            kern_dbg, grid=(B,), interpret=interp,
            out_shape=tuple(
                jax.ShapeDtypeStruct((B, NG, LANES, EW), jnp.uint32)
                for _ in range(5)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 4, LANES, PV), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=tuple(
                pl.BlockSpec((1, NG, LANES, EW), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM) for _ in range(5)),
        )(nv, Wst)

    pg, seed, pgn_k, s1_k, s2_k = map(np.asarray, jax.jit(run)(nn, ext))

    # numpy recompute: eq[b, l, p] for each d; pack to pg layout
    bext = ext_np  # (B, LANES, L) int byte values, -1 pads
    pg_ref = np.zeros((B, NG, LANES, EW), np.uint32)
    base = bext[:, :, halo : halo + E]          # bytes at positions p
    for g in range(NG):
        for t in range(8):
            d = 8 * g + 1 + t
            lag = bext[:, :, halo - d : halo - d + E]
            eq = base == lag                     # (B, LANES, E)
            eqw = eq.reshape(B, LANES, EW, 4)
            for c in range(4):
                pg_ref[:, g] |= (eqw[..., c].astype(np.uint32) << (8 * c + t))
    bad = pg != pg_ref
    log("pg mismatches:", bad.sum(), "of", pg.size)
    if bad.any():
        idx = tuple(x[0] for x in np.nonzero(bad))
        b_, g_, l_, w_ = idx
        log("first at", idx, f"got {pg[idx]:08x} want {pg_ref[idx]:08x}")
        xor = pg[idx] ^ pg_ref[idx]
        log("xor bits:", [(i // 8, i % 8) for i in range(32) if (xor >> i) & 1],
            "(c, t) pairs; d = 8g+1+t, g =", g_)
        # which (c, t) pairs break overall
        import collections
        cnt = collections.Counter()
        xr = pg ^ pg_ref
        for c in range(4):
            for t in range(8):
                nbad = ((xr >> (8 * c + t)) & 1).sum()
                if nbad:
                    cnt[(c, t)] = int(nbad)
        log("bad (c,t) counts:", cnt.most_common(12))
    # seed check from pg_ref
    pgn = np.concatenate(
        [pg_ref[..., 1:], np.zeros((B, NG, LANES, 1), np.uint32)], axis=-1)
    s1 = (pg_ref >> 8) | (pgn << 24)
    s2 = (pg_ref >> 16) | (pgn << 16)
    seed_ref = pg_ref & s1 & s2
    log("pgn mismatches:", (pgn_k != pgn).sum())
    log("s1 mismatches:", (s1_k != s1).sum())
    log("s2 mismatches:", (s2_k != s2).sum())
    if (s2_k != s2).any():
        idx = tuple(x[0] for x in np.nonzero(s2_k != s2))
        log("s2 first at", idx, f"got {s2_k[idx]:08x} want {s2[idx]:08x}",
            f"pg {pg[idx]:08x} pgn {pgn[idx]:08x}")
    bads = seed != seed_ref
    log("seed mismatches:", bads.sum(), "of", seed.size)
    if bads.any() and not bad.any():
        idx = tuple(x[0] for x in np.nonzero(bads))
        log("first seed-only mismatch at", idx,
            f"got {seed[idx]:08x} want {seed_ref[idx]:08x}")


if __name__ == "__main__":
    main()
