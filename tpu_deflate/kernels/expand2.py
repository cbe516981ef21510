"""Pallas TPU kernel: fused token expansion, v2 (full-utilization MXU).

Supersedes kernels/expand.py's formulation.  Three structural changes,
each removing an order of constant factor:

  1. PAINT by per-source-row one-hot scatter.  v1 flattened token tiles
     to (W, 1) columns with (W, 17)@(17, 128) matmuls — K=17 leaves the
     MXU ~13% utilized.  Here each 128-token source row scatters with
     (OROWS, 128) @ (128, 128) matmuls: the 128-entry row IS the
     contraction dim, so K=128 runs at full rate, and rows with no
     in-tile tokens skip entirely (@pl.when).

  2. COLLAPSE bounds the pull window by max_dist.  v1 collapsed
     constant-distance runs to their origin (S - d + (p - S + d) mod d),
     which can point arbitrarily far back, forcing the resolved-byte
     pull to address the WHOLE output (a (2048, out_cap/128) one-hot —
     the dominant cost).  The unified form used here,

         q = p - d * ceil((p - max(S, tile_start) + 1) / d),

     lands each match byte's parent on the same chain but within
     [tile_start - d, tile_start) when its run began earlier, and
     within [S - d, S) (>= tile_start - d) when it began in-tile — so
     EVERY post-collapse parent lies within max_dist of the tile, and
     the pull table is mdr = max_dist/128 rows instead of out_cap/128.
     This is the windowed generalization of the reference's off1/off2
     overlap shortcuts (/root/reference/deflate.py:1630-1652).

  3. RESOLVE gathers use the transposed-table trick: the LANE one-hot
     (128x128) goes into the matmul (K=128, full rate) against the
     table TRANSPOSED to (128, rows), and the row one-hot becomes a
     cheap mask-reduce over `rows` lanes — instead of v1's K=16 picks.
     Pointer doubling runs under a convergence while_loop (post-collapse
     chain depth = match-nesting depth, typically 1-3, never > 11).

Output scratch is (mdr + out_cap/128) rows of int8, so out_cap up to
2^20 fits VMEM — 1 MB chunks run on the kernel, not the XLA fallback.
Element-equal to the XLA formulation in ops/decode._expand_fields +
kernels/resolve.py (the CPU path); parity-tested in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OTILE = 2048
OROWS = OTILE // 128  # 16
TW = OROWS + 1  # token-window rows (2049 owners + alignment slack)

NEG = -(1 << 30)

C_KEY1 = 0  # fill carry: kind<<9 | ta of the last owner
C_KEY2 = 1  # fill carry: dist of the last owner
C_PREV = 2  # last element's is_m<<17 | dist (run-boundary detection)


def _bdot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _flat_cummax(x, carry):
    """Inclusive cummax of (OROWS, 128) int32 in flat row-major order,
    seeded with scalar `carry`."""
    for k in (1, 2, 4, 8, 16, 32, 64):
        sh = jnp.concatenate(
            [jnp.full((OROWS, k), NEG, jnp.int32), x[:, : 128 - k]], axis=1
        )
        x = jnp.maximum(x, sh)
    p = jnp.broadcast_to(jnp.max(x, axis=1, keepdims=True), (OROWS, 128))
    k = 1
    while k < OROWS:
        sh = jnp.concatenate(
            [jnp.full((k, 128), NEG, jnp.int32), p[: OROWS - k, :]], axis=0
        )
        p = jnp.maximum(p, sh)
        k *= 2
    excl = jnp.concatenate(
        [jnp.full((1, 128), NEG, jnp.int32), p[: OROWS - 1, :]], axis=0
    )
    x = jnp.maximum(x, excl)
    x = jnp.maximum(x, carry)
    return x, jnp.max(x)


def _exp2_kernel(
    tok_lo_ref, tp_ref, tot_ref,  # SMEM
    off_ref, c1_ref, tb_ref,  # VMEM (1, KR, 128)
    out_ref,  # (1, T*OROWS, 128)
    res_ref,  # scratch
    *, KR: int, out_cap: int, mdr: int, ntiles: int,
):
    b = pl.program_id(0)
    tp = tp_ref[b]
    total = tot_ref[b]
    bias = mdr * 128
    res_ref[0 : mdr + OROWS, :] = jnp.zeros((mdr + OROWS, 128), jnp.int8)

    wrow = jax.lax.broadcasted_iota(jnp.int32, (OROWS, 128), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    riota = jax.lax.broadcasted_iota(jnp.int32, (OROWS, 128), 0)
    wt16 = jax.lax.broadcasted_iota(jnp.int32, (128, OROWS), 1)
    wtP = jax.lax.broadcasted_iota(jnp.int32, (128, mdr + OROWS), 1)
    prel = riota * 128 + jax.lax.broadcasted_iota(jnp.int32, (OROWS, 128), 1)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (OROWS, 128), 1) == 0

    def tile_body(t, carry):
        key1c, key2c, prevc = carry
        ts = t * OTILE

        # ---- token window -----------------------------------------------
        lo_row = tok_lo_ref[b, t] >> 7
        woff = off_ref[0, pl.ds(lo_row, TW), :]
        wc1 = c1_ref[0, pl.ds(lo_row, TW), :]
        wtb = tb_ref[0, pl.ds(lo_row, TW), :]
        eidx = (
            lo_row * 128
            + jax.lax.broadcasted_iota(jnp.int32, (TW, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (TW, 128), 1)
        )
        rel = woff - ts
        inw = (eidx < tp) & (rel >= 0) & (rel < OTILE)

        # ---- paint: per-source-row one-hot scatter (K=128 matmuls),
        # functional accumulation so the matmuls pipeline ------------------
        a1 = jnp.zeros((OROWS, 128), jnp.float32)
        a2lo = jnp.zeros((OROWS, 128), jnp.float32)
        a2hi = jnp.zeros((OROWS, 128), jnp.float32)
        for s in range(TW):
            ok = inw[s]
            rs = jnp.where(ok, rel[s], OTILE)
            k1 = ((rs + 1) << 11) | wc1[s]  # 23 bits
            k2 = ((rs + 1) << 16) | wtb[s]  # 28 bits
            ohr = ((rs[None, :] >> 7) == wrow).astype(jnp.bfloat16) * ok[
                None, :
            ].astype(jnp.bfloat16)
            ohl = ((rs & 127)[:, None] == li).astype(jnp.bfloat16)

            def pb(v):  # one byte plane
                return _bdot(ohr, ohl * v[:, None].astype(jnp.bfloat16))

            a1 = a1 + (pb(k1 & 0xFF) + pb((k1 >> 8) & 0xFF) * 256.0
                       + pb(k1 >> 16) * 65536.0)
            a2lo = a2lo + pb(k2 & 0xFF) + pb((k2 >> 8) & 0xFF) * 256.0
            a2hi = a2hi + pb((k2 >> 16) & 0xFF) + pb(k2 >> 24) * 256.0

        key1 = a1.astype(jnp.int32)
        key2 = a2lo.astype(jnp.int32) | (a2hi.astype(jnp.int32) << 16)
        painted = key1 > 0
        key1 = jnp.where(painted, key1, NEG)
        key2 = jnp.where(painted, key2, NEG)

        # ---- forward fill -------------------------------------------------
        f1, _ = _flat_cummax(key1, key1c)
        f2, _ = _flat_cummax(key2, key2c)
        key1c_n = f1[OROWS - 1, 127] & 0x7FF
        key2c_n = f2[OROWS - 1, 127] & 0xFFFF

        filled = f1 >= 0
        c1v = f1 & 0x7FF
        kind = c1v >> 9
        ta = c1v & 0x1FF
        dist = jnp.where(filled, f2 & 0xFFFF, 0)

        p = ts + prel
        in_range = filled & (p < total)
        is_m = in_range & (kind == 1)

        # ---- run boundaries + windowed collapse ---------------------------
        mb = jnp.where(is_m, (1 << 17) | dist, 0)
        lane_sh = jnp.concatenate(
            [jnp.zeros((OROWS, 1), jnp.int32), mb[:, :127]], axis=1
        )
        row_last = jnp.broadcast_to(mb[:, 127:128], (OROWS, 128))
        carry_row = jnp.broadcast_to(prevc, (1, 128))
        prev_row_last = jnp.concatenate(
            [carry_row, row_last[: OROWS - 1, :]], axis=0
        )
        prev_mb = jnp.where(col0, prev_row_last, lane_sh)
        prevc_n = mb[OROWS - 1, 127]

        prev_m = (prev_mb >> 17) & 1
        prev_b = prev_mb & 0x1FFFF
        run_start = is_m & ((prev_m == 0) | (prev_b != dist))
        S, _ = _flat_cummax(jnp.where(run_start, p, NEG), NEG)
        t0 = jnp.maximum(S, ts)
        d = jnp.maximum(dist, 1)
        kq = (p - t0 + d) // d  # ceil((p - t0 + 1)/d), >= 1
        q = p - kq * d  # in [t0 - d, t0): within max_dist of the tile
        selfrel = prel
        z = jnp.where(is_m, jnp.clip(q - ts, -bias, OTILE - 1), selfrel)

        # ---- pointer doubling (transposed-table picks) --------------------
        def pick16(plane_b, zq):
            """newz[i] = plane[zq[i]] for zq in [0, OTILE); plane biased."""
            out = jnp.zeros((OROWS, 128), jnp.int32)
            pT = plane_b.T  # (128, OROWS) int32
            plo = (pT & 0xFF).astype(jnp.bfloat16)
            phi = (pT >> 8).astype(jnp.bfloat16)
            for i in range(OROWS):
                zr = zq[i]
                okr = zr >= 0
                zc = jnp.where(okr, zr, 0)
                ohl = ((zc & 127)[:, None] == li).astype(jnp.bfloat16)
                g = _bdot(ohl, plo) + _bdot(ohl, phi) * 256.0
                sel = jnp.sum(
                    jnp.where((zc >> 7)[:, None] == wt16, g, 0.0), axis=1
                ).astype(jnp.int32)
                v = jnp.where(okr, sel - bias, zr)
                out = jnp.where(riota == i, v[None, :], out)
            return out

        has_local = jnp.any((z >= 0) & (z != selfrel))

        def dcond(c):
            _, changed, r = c
            return changed & (r < 11)

        def dbody(c):
            zc, _, r = c
            znew = pick16(zc + bias, zc)
            return znew, jnp.any(znew != zc), r + 1

        z, _, _ = jax.lax.while_loop(dcond, dbody, (z, has_local, jnp.int32(0)))

        # ---- pull: resolved window (mdr rows) ++ in-tile value plane -----
        val = jnp.where(in_range & (kind == 0), ta, 0)
        resw = res_ref[pl.ds(t * OROWS, mdr), :]  # rows [ts - mdr*128, ts)
        tbl = jnp.concatenate(
            [resw.astype(jnp.int32).T + 128, val.astype(jnp.int32).T], axis=1
        ).astype(jnp.bfloat16)  # (128, mdr + OROWS), values <= 255 exact
        zg = jnp.clip(z + bias, 0, (mdr + OROWS) * 128 - 1)
        vt = jnp.zeros((OROWS, 128), jnp.int32)
        for i in range(OROWS):
            zr = zg[i]
            ohl = ((zr & 127)[:, None] == li).astype(jnp.bfloat16)
            g = _bdot(ohl, tbl)  # (128, mdr + OROWS)
            v = jnp.sum(
                jnp.where((zr >> 7)[:, None] == wtP, g, 0.0), axis=1
            ).astype(jnp.int32)
            vt = jnp.where(riota == i, v[None, :], vt)

        out_ref[0, pl.ds(t * OROWS, OROWS), :] = jnp.where(in_range, vt, 0)
        res_ref[pl.ds(mdr + t * OROWS, OROWS), :] = (vt - 128).astype(jnp.int8)
        return key1c_n, key2c_n, prevc_n

    jax.lax.fori_loop(
        0, ntiles, tile_body, (jnp.int32(NEG), jnp.int32(NEG), jnp.int32(0))
    )


@functools.partial(
    jax.jit, static_argnames=("out_cap", "max_dist", "interpret")
)
def expand_fused2(
    off: jax.Array,  # int32[B, K] per-token exclusive output offsets
    c1: jax.Array,  # int32[B, K] kind<<9 | ta  (kind 0 lit, 1 match)
    tb: jax.Array,  # int32[B, K] match distance (0 for literals)
    tp: jax.Array,  # int32[B]
    total: jax.Array,  # int32[B]
    out_cap: int,
    max_dist: int = 2048,
    interpret: bool = False,
):
    """Fused paint+fill+collapse+resolve v2.  Returns int32[B, out_cap].

    Requires every match distance <= max_dist (callers route larger
    distances to a wider-window variant or the XLA path)."""
    B, K = off.shape
    T = out_cap // OTILE
    mdr = -(-max_dist // 128)
    KR = -(-K // 128)
    pad = KR * 128 - K
    if pad:
        off = jnp.pad(off, ((0, 0), (0, pad)), constant_values=out_cap)
        c1 = jnp.pad(c1, ((0, 0), (0, pad)))
        tb = jnp.pad(tb, ((0, 0), (0, pad)))
    extra = TW * 128
    off = jnp.pad(off, ((0, 0), (0, extra)), constant_values=out_cap)
    c1 = jnp.pad(c1, ((0, 0), (0, extra)))
    tb = jnp.pad(tb, ((0, 0), (0, extra)))
    KR += TW

    tile_firsts = jnp.arange(T, dtype=jnp.int32) * OTILE
    owner = (
        jax.vmap(lambda o: jnp.searchsorted(o, tile_firsts, side="right"))(
            off
        ).astype(jnp.int32)
        - 1
    )
    tok_lo = jnp.clip(owner, 0, KR * 128 - TW * 128)

    kern = functools.partial(
        _exp2_kernel, KR=KR, out_cap=out_cap, mdr=mdr, ntiles=T
    )
    tok3 = lambda x: x.reshape(B, KR, 128)
    vspec = pl.BlockSpec((1, KR, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, T * OROWS, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vspec, vspec, vspec,
        ],
        out_specs=pl.BlockSpec(
            (1, T * OROWS, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((mdr + out_cap // 128, 128), jnp.int8),
        ],
        interpret=interpret,
    )(tok_lo, tp.astype(jnp.int32), total.astype(jnp.int32),
      tok3(off), tok3(c1), tok3(tb))
    return out.reshape(B, out_cap)
