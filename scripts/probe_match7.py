"""Full packed-u32 bitplane matcher at production shape, EQ-checked vs v0.

Layout: bytes packed 4-per-u32.  Streams W_s[i] = bytes 4i-s..4i-s+3
(s = d & 3), so the compare for distance d = 4q+s is ONE static word
slice + XOR.  Exact per-byte zero detect without SWAR borrow bugs:
    u = 0x80808080 - (z & 0x7F7F7F7F)   (no cross-byte borrows)
    zero_c  <=>  (u & ~z) bit 8c+7
Group plane pg packs bit (8c + t) = equality at byte 4w+c for distance
8g+1+t.  Seeds = pg & byteshift1(pg) & byteshift2(pg).  Selection and the
extension ladder run on 4 interleaved byte-planes (position p = 4w + c).
Output (4, LANES, segW) interleaved; XLA de-interleaves.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PCPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
B, N = int(os.environ.get("PB", 128)), int(os.environ.get("PN", 65536))
seg = N // LANES          # 512
segW = seg // 4           # 128
window, max_match = int(os.environ.get("PW", 256)), 10
E = -(-(seg + max_match) // 512) * 512    # word planes lane-aligned
EW = E // 4                               # 160
L = -(-(window + E) // 512) * 512         # word rows lane-aligned
PV = L // 4                               # 224
halo = window
HW = halo // 4                            # 64
NG = window // 8                          # 32 groups of 8 distances


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


# ---------------------------------------------------------------------------
# v0 reference kernel (current match2 semantics)
# ---------------------------------------------------------------------------

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
    for c in range(window // 32 if window >= 32 else 1):
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


# ---------------------------------------------------------------------------
# v7 packed kernel
# ---------------------------------------------------------------------------

M7 = jnp.uint32(0x7F7F7F7F)
H8 = jnp.uint32(0x80808080)
LOW1 = jnp.uint32(0x01010101)


def kern_v7(n_ref, w_ref, dl_ref):
    M7 = jnp.uint32(0x7F7F7F7F)
    H8 = jnp.uint32(0x80808080)
    b = pl.program_id(0)
    n = n_ref[b]
    W = [w_ref[0, s] for s in range(4)]  # each (LANES, PV) u32
    X = W[0][:, HW : HW + EW]

    # per-byte-plane position arrays: pos_c[l, w] = l*seg + 4w + c
    posW = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, EW), 0) * seg
        + 4 * jax.lax.broadcasted_iota(jnp.int32, (LANES, EW), 1)
    )
    pos_c = [posW + c for c in range(4)]
    posok_c = [p + 3 <= n for p in pos_c]

    best_d = [jnp.zeros((LANES, EW), jnp.int32) for _ in range(4)]
    found = [jnp.zeros((LANES, EW), bool) for _ in range(4)]
    length = [jnp.zeros((LANES, EW), jnp.int32) for _ in range(4)]

    lanei0 = jax.lax.broadcasted_iota(jnp.int32, (LANES, EW), 1)

    def shift_words(x, k):
        if k == 0:
            return x
        return jnp.where(lanei0 < EW - k, pltpu.roll(x, EW - k, 1), jnp.uint32(0))

    for g in range(NG):
        pg = jnp.zeros((LANES, EW), jnp.uint32)
        for t in range(8):
            d = 8 * g + 1 + t
            q, s = divmod(d, 4)
            if s == 0:
                Y = W[0][:, HW - q : HW - q + EW]
            else:
                Y = W[s][:, HW - q : HW - q + EW]
            z = X ^ Y
            u = H8 - (z & M7)
            zb = u & ~z & H8  # bit 8c+7 = byte c equal
            pg = pg | ((zb >> 7) << t)

        lanei = jax.lax.broadcasted_iota(jnp.int32, (LANES, EW), 1)
        pgn = jnp.where(lanei < EW - 1, pltpu.roll(pg, EW - 1, 1), jnp.uint32(0))
        s1 = (pg >> 8) | (pgn << 24)
        # (a>>16)|(b<<16) miscompiles on Mosaic (half-word pack
        # idiom drops the b term); multiply breaks the pattern
        s2 = (pg >> 16) | (pgn * jnp.uint32(1 << 16))
        seed = pg & s1 & s2

        # shifted eq planes for the extension ladder: byte j, word shift w
        eqB = [(pg >> (8 * j)) & jnp.uint32(0xFF) for j in range(4)]
        eqBs = {}
        nsh = (3 + max_match - 1) // 4 + 1  # max word shift of c+kk
        for j in range(4):
            for wsh in range(nsh + 1):
                if any(((c + kk) & 3) == j and ((c + kk) >> 2) == wsh
                       for c in range(4) for kk in range(3, max_match)):
                    eqBs[(j, wsh)] = shift_words(eqB[j], wsh)

        for c in range(4):
            sb = (seed >> (8 * c)) & jnp.uint32(0xFF)
            lsb = sb & (~sb + jnp.uint32(1))
            t_c = (31 - jax.lax.clz(lsb)).astype(jnp.int32)
            has_c = sb != 0
            new = ~found[c] & has_c
            d_c = 8 * g + 1 + t_c
            best_d[c] = jnp.where(new, d_c, best_d[c])
            found[c] = found[c] | has_c
            alive = jnp.where(
                new & posok_c[c] & (d_c <= pos_c[c]), lsb, jnp.uint32(0))
            len_c = jnp.zeros((LANES, EW), jnp.int32)
            for kk in range(3, max_match):
                j, wsh = (c + kk) & 3, (c + kk) >> 2
                alive = alive & eqBs[(j, wsh)]
                len_c = len_c + (alive != 0).astype(jnp.int32)
            length[c] = length[c] + len_c

    for c in range(4):
        has = found[c] & posok_c[c] & (best_d[c] <= pos_c[c])
        ln = jnp.where(has, 3 + length[c], 0)
        ln = jnp.minimum(ln, jnp.maximum(n - pos_c[c], 0))
        dl_ref[0, c] = (
            (jnp.where(has, best_d[c], 0) << 9) | ln
        )[:, :segW]


def pack_streams(ext):
    """ext (B, LANES, L) int32 byte values (-1 pads) -> (B, 4, LANES, PV)."""
    b8 = (ext & 0xFF).astype(jnp.uint32)
    v0 = (b8[..., 0::4] | (b8[..., 1::4] << 8) | (b8[..., 2::4] << 16)
          | (b8[..., 3::4] << 24))
    prev = jnp.pad(v0[..., :-1], ((0, 0), (0, 0), (1, 0)))
    streams = [v0]
    for s in (1, 2, 3):
        streams.append((prev >> (32 - 8 * s)) | (v0 << (8 * s)))
    return jnp.stack(streams, axis=1)


def main():
    global INTERP
    INTERP = jax.default_backend() != "tpu"
    log("device:", jax.devices()[0])
    rng = np.random.default_rng(1)
    ext_np = rng.integers(0, 8, (B, LANES, L), dtype=np.int32)
    # make it haloed-realistic: row r's halo = row r-1's tail would be the
    # real layout; for EQ purposes any content works, but include -1 pads
    # at the very start like _halo_bytes does
    ext_np[:, 0, :halo] = -1
    ext = jnp.asarray(ext_np)
    nn = jnp.full((B,), N, jnp.int32)

    f0 = jax.jit(lambda nv, e: pl.pallas_call(
        kern_v0, grid=(B,), interpret=INTERP,
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

    def run7(nv, e):
        Wst = pack_streams(e)
        dl4 = pl.pallas_call(
            kern_v7, grid=(B,), interpret=INTERP,
            out_shape=jax.ShapeDtypeStruct((B, 4, LANES, segW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 4, LANES, PV), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 4, LANES, segW), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(nv, Wst)
        # de-interleave: out[l, 4w+c] = dl4[c, l, w]
        return dl4.transpose(0, 2, 3, 1).reshape(B, LANES, seg)

    f7 = jax.jit(run7)
    try:
        t7 = timeit(f7, nn, ext)
        out = np.asarray(f7(nn, ext))
        eq = (out == ref).all()
        log(f"{'v7 packed-u32 full':34s} {t7*1e3:7.2f} ms  "
            f"({B*N/t7/1e9:.3f} GB/s) {'EQ' if eq else '** MISMATCH **'}")
        if not eq:
            neq = np.nonzero(out != ref)
            i = tuple(x[0] for x in neq)
            log("first mismatch at", i, "got", out[i], "want", ref[i],
                f"({(out != ref).sum()} total)")
            m = out != ref
            wd, gd = ref[m] >> 9, out[m] >> 9
            wl, gl = ref[m] & 511, out[m] & 511
            import collections
            log("want-d:", collections.Counter(wd.tolist()).most_common(8))
            log("got-d:", collections.Counter(gd.tolist()).most_common(8))
            log("pos%4:", collections.Counter((np.nonzero(m)[2] % 4).tolist()))
            log("want-l:", collections.Counter(wl.tolist()).most_common(6))
            log("got-l:", collections.Counter(gl.tolist()).most_common(6))
    except Exception as e:
        log(f"v7 FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
