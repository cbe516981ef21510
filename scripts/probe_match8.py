"""Packed-u32 matcher, fori_loop-over-groups form (compilable size).

Same semantics as probe_match7 (EQ vs v0) but the 32-group sweep runs as
a fori_loop whose body handles ONE 8-distance group: dynamic-ds loads
from the 4 byte-offset streams, selection + extension on 4 interleaved
byte-planes, accumulators in VMEM scratch.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
B, N = 128, 65536
seg = N // LANES          # 512
segW = seg // 4           # 128
window, max_match = 256, 10
E = -(-(seg + max_match) // 128) * 128    # 640
EW = E // 4                               # 160
L = -(-(window + E) // 128) * 128         # 896
PV = L // 4                               # 224
halo = window
HW = halo // 4
NG = window // 8

M7 = jnp.uint32(0x7F7F7F7F)
H8 = jnp.uint32(0x80808080)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(x.reshape(-1)[:1])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def kern_v0(n_ref, ext_ref, dl_ref, ch_ref):
    b = pl.program_id(0)
    n = n_ref[b]
    ext = ext_ref[0]
    key = ext[:, halo : halo + E]
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, seg), 0) * seg
        + jax.lax.broadcasted_iota(jnp.int32, (LANES, seg), 1)
    )
    posok = pos + 3 <= n
    best_d = jnp.zeros((LANES, seg), jnp.int32)
    found = jnp.zeros((LANES, seg), bool)
    length = jnp.zeros((LANES, seg), jnp.int32)
    for c in range(8):
        def body(t, ch):
            d = 32 * c + 1 + t
            rolled = pltpu.roll(ext, d, 1)[:, halo : halo + E]
            eqb = (key == rolled).astype(jnp.uint32)
            return ch | (eqb << t)

        ch_ref[...] = jax.lax.fori_loop(
            0, 32, body, jnp.zeros((LANES, E), jnp.uint32))
        chc = ch_ref[...]
        mc = chc[:, :seg] & chc[:, 1 : seg + 1] & chc[:, 2 : seg + 2]
        lsb = mc & (~mc + jnp.uint32(1))
        k = (31 - jax.lax.clz(lsb)).astype(jnp.int32)
        has_c = mc != 0
        new = ~found & has_c
        d_c = 32 * c + k + 1
        best_d = jnp.where(new, d_c, best_d)
        found = found | has_c
        bit = jnp.where(new, k, 0).astype(jnp.uint32)
        alive = new & posok & (d_c <= pos)
        len_c = jnp.zeros((LANES, seg), jnp.int32)
        for kk in range(3, max_match):
            alive = alive & (((chc[:, kk : seg + kk] >> bit) & 1) == 1)
            len_c = len_c + alive.astype(jnp.int32)
        length = length + len_c

    has = found & posok & (best_d <= pos)
    length = jnp.where(has, 3 + length, 0)
    length = jnp.minimum(length, jnp.maximum(n - pos, 0))
    dl_ref[0] = (jnp.where(has, best_d, 0) << 9) | length


def kern_v8(n_ref, w_ref, dl_ref, st_ref):
    """st_ref: (3, 4, LANES, EW) int32 scratch — best_d / found / length
    per byte-plane c."""
    b = pl.program_id(0)
    n = n_ref[b]
    M7 = jnp.uint32(0x7F7F7F7F)
    H8 = jnp.uint32(0x80808080)
    X = w_ref[0, 0, :, HW : HW + EW].astype(jnp.uint32)

    posW = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, EW), 0) * seg
        + 4 * jax.lax.broadcasted_iota(jnp.int32, (LANES, EW), 1)
    )
    st_ref[...] = jnp.zeros((3, 4, LANES, EW), jnp.int32)

    def group(g, _):
        # one 8-distance group: d = 8g+1 .. 8g+8
        # q-slices needed: base words HW - (2g) - j for j in 0..2
        pg = jnp.zeros((LANES, EW), jnp.uint32)
        for t in range(8):
            d_lo = 1 + t  # d = 8g + d_lo
            q_off, s = divmod(d_lo, 4)  # q = 2g + q_off
            start = HW - q_off - 2 * g
            Y = w_ref[0, s, :, pl.ds(start, EW)].astype(jnp.uint32)
            z = X ^ Y
            u = H8 - (z & M7)
            zb = u & ~z & H8
            pg = pg | ((zb >> 7) << t)

        pgn = jnp.concatenate(
            [pg[:, 1:], jnp.zeros((LANES, 1), jnp.uint32)], axis=1)
        # (a>>16)|(b<<16) miscompiles on Mosaic (half-word funnel idiom
        # drops the b term, see probe_match9); multiply breaks the pattern
        seed = (pg & ((pg >> 8) | (pgn * jnp.uint32(1 << 24)))
                & ((pg >> 16) | (pgn * jnp.uint32(1 << 16))))

        eqB = [(pg >> (8 * j)) & jnp.uint32(0xFF) for j in range(4)]
        eqBs = {}
        for j in range(4):
            for wsh in range(4):
                if any(((c + kk) & 3) == j and ((c + kk) >> 2) == wsh
                       for c in range(4) for kk in range(3, max_match)):
                    if wsh == 0:
                        eqBs[(j, 0)] = eqB[j]
                    else:
                        eqBs[(j, wsh)] = jnp.concatenate(
                            [eqB[j][:, wsh:],
                             jnp.zeros((LANES, wsh), jnp.uint32)], axis=1)

        for c in range(4):
            pos_c = posW + c
            posok = pos_c + 3 <= n
            found = st_ref[1, c] != 0
            sb = (seed >> (8 * c)) & jnp.uint32(0xFF)
            lsb = sb & (~sb + jnp.uint32(1))
            t_c = (31 - jax.lax.clz(lsb)).astype(jnp.int32)
            has_c = sb != 0
            new = ~found & has_c
            d_c = 8 * g + 1 + t_c
            st_ref[0, c] = jnp.where(new, d_c, st_ref[0, c])
            st_ref[1, c] = (found | has_c).astype(jnp.int32)
            alive = jnp.where(
                new & posok & (d_c <= pos_c), lsb, jnp.uint32(0))
            len_c = jnp.zeros((LANES, EW), jnp.int32)
            for kk in range(3, max_match):
                alive = alive & eqBs[((c + kk) & 3, (c + kk) >> 2)]
                len_c = len_c + (alive != 0).astype(jnp.int32)
            st_ref[2, c] = st_ref[2, c] + len_c
        return 0

    jax.lax.fori_loop(0, NG, group, 0)

    for c in range(4):
        pos_c = posW + c
        posok = pos_c + 3 <= n
        best_d = st_ref[0, c]
        has = (st_ref[1, c] != 0) & posok & (best_d <= pos_c)
        ln = jnp.where(has, 3 + st_ref[2, c], 0)
        ln = jnp.minimum(ln, jnp.maximum(n - pos_c, 0))
        dl_ref[0, c] = ((jnp.where(has, best_d, 0) << 9) | ln)[:, :segW]


def pack_streams(ext):
    b8 = (ext & 0xFF).astype(jnp.uint32)
    v0 = (b8[..., 0::4] | (b8[..., 1::4] << 8) | (b8[..., 2::4] << 16)
          | (b8[..., 3::4] << 24))
    prev = jnp.pad(v0[..., :-1], ((0, 0), (0, 0), (1, 0)))
    streams = [v0]
    for s in (1, 2, 3):
        streams.append((prev >> (32 - 8 * s)) | (v0 << (8 * s)))
    return jnp.stack(streams, axis=1).astype(jnp.int32)


def main():
    log("device:", jax.devices()[0])
    rng = np.random.default_rng(1)
    ext_np = rng.integers(0, 8, (B, LANES, L), dtype=np.int32)
    ext_np[:, 0, :halo] = -1
    ext = jnp.asarray(ext_np)
    nn = jnp.full((B,), N, jnp.int32)

    f0 = jax.jit(lambda nv, e: pl.pallas_call(
        kern_v0, grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, LANES, seg), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, LANES, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, LANES, seg), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((LANES, E), jnp.uint32)],
    )(nv, e))
    t0 = timeit(f0, nn, ext)
    ref = np.asarray(f0(nn, ext))
    log(f"{'v0 current':34s} {t0*1e3:7.2f} ms  ({B*N/t0/1e9:.3f} GB/s)")

    def run8(nv, e):
        Wst = pack_streams(e)
        dl4 = pl.pallas_call(
            kern_v8, grid=(B,),
            out_shape=jax.ShapeDtypeStruct((B, 4, LANES, segW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 4, LANES, PV), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 4, LANES, segW), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((3, 4, LANES, EW), jnp.int32)],
        )(nv, Wst)
        return dl4.transpose(0, 2, 3, 1).reshape(B, LANES, seg)

    f8 = jax.jit(run8)
    try:
        t8 = timeit(f8, nn, ext)
        out = np.asarray(f8(nn, ext))
        eq = (out == ref).all()
        log(f"{'v8 packed fori-groups':34s} {t8*1e3:7.2f} ms  "
            f"({B*N/t8/1e9:.3f} GB/s) {'EQ' if eq else '** MISMATCH **'}")
        if not eq:
            neq = np.nonzero(out != ref)
            i = tuple(x[0] for x in neq)
            log("first mismatch at", i, "got", out[i], "want", ref[i],
                f"({(out != ref).sum()} total)")
    except Exception as e:
        log(f"v8 FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
