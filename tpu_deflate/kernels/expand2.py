"""Pallas TPU kernel: fused token expansion, v2.

Supersedes kernels/expand.py's formulation.  Changes, each driven by
measured per-op costs on v5e (tiny vector ops ~44 ns; a 128-lane-wide
masked reduce ~1-2 us; f32-HIGHEST matmuls ~6x bf16 rate; default-
precision "f32" matmuls silently demote to bf16 under
--xla_allow_excess_precision and round 23-bit payloads):

  1. PAINT by per-source-row one-hot scatter with dead-row skip.  Each
     128-token source row scatters with (OROWS,128)@(128,128) bf16
     matmuls over 8-bit byte planes (exact: one-hots are 0/1, planes
     <= 255) — the 128-entry row is the contraction dim (full K=128 MXU
     rate) — and rows with no in-tile tokens skip entirely (@pl.when).

  2. ONE forward fill.  v1 filled three key channels; here only
     key1 = (start+1)<<10 | kind<<9 | ta is cummax-filled, and the
     owner's 16-bit distance is PICKED from the painted (unfilled)
     distance plane at the filled start — one gather replaces two more
     fills.

  3. COLLAPSE bounds the pull window by max_dist.  v1 collapsed
     constant-distance runs to their origin, which can point arbitrarily
     far back, forcing the resolved-byte pull to address the WHOLE
     output (its dominant cost).  The unified form used here,

         q = p - d * ceil((p - max(S, tile_start) + 1) / d),

     lands each match byte's parent on the same chain but within
     [tile_start - d, tile_start) when its run began earlier, and within
     [S - d, S) (>= tile_start - d) when it began in-tile — every
     post-collapse parent lies within max_dist of the tile, so the pull
     table is max_dist/128 rows instead of out_cap/128.  This is the
     windowed generalization of the reference's off1/off2 overlap
     shortcuts (/root/reference/deflate.py:1630-1652).

  4. RESOLVE by pointer doubling under a CONVERGENCE while_loop in the
     flat column domain: post-collapse chain depth is match-NESTING
     depth (typically 1-3, structurally <= log2 OTILE), where v1 always
     paid 11 rounds; all-literal/fully-collapsed tiles skip doubling.

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
TW = OROWS + 1  # token-window rows (OTILE+1 owners + alignment slack)

NEG = -(1 << 30)


def _bdot(a, b):
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


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
    return jnp.maximum(x, carry)


def _exp2_kernel(
    tok_lo_ref, tp_ref, tot_ref,  # SMEM
    off_ref, c1_ref, tb_ref,  # VMEM (1, KR, 128), or HBM when tok_hbm
    out_ref,  # (1, T*OROWS, 128)
    res_ref, pscr_ref, *maybe_dma,  # scratch (+ window buf + sems if tok_hbm)
    KR: int, out_cap: int, mdr: int, ntiles: int, interp: bool,
    tok_hbm: bool = False,
):
    b = pl.program_id(0)
    tp = tp_ref[b]
    total = tot_ref[b]
    bias = mdr * 128
    if interp:  # the CPU interpreter lacks several bf16 dot shapes; f32
        # dots are equally exact for the <=255 byte planes used here
        def bd(a, x):
            return jnp.dot(a.astype(jnp.float32), x.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    else:
        bd = _bdot
    res_ref[0 : mdr + OROWS, :] = jnp.zeros((mdr + OROWS, 128), jnp.int8)

    # constants hoisted out of the tile loop
    wrow = jax.lax.broadcasted_iota(jnp.int32, (OROWS, 128), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    es = (
        (jax.lax.broadcasted_iota(jnp.int32, (OTILE, OROWS), 0) >> 7)
        == jax.lax.broadcasted_iota(jnp.int32, (OTILE, OROWS), 1)
    ).astype(jnp.bfloat16)
    esT = es.T  # (OROWS, OTILE)
    maskc = (
        (jax.lax.broadcasted_iota(jnp.int32, (OTILE, 128), 0) & 127)
        == jax.lax.broadcasted_iota(jnp.int32, (OTILE, 128), 1)
    ).astype(jnp.float32)
    riW = jax.lax.broadcasted_iota(jnp.int32, (OTILE, OROWS), 1)
    riP = jax.lax.broadcasted_iota(jnp.int32, (OTILE, mdr + OROWS), 1)
    liota2 = jax.lax.broadcasted_iota(jnp.int32, (OTILE, 128), 1)
    prel = wrow * 128 + jax.lax.broadcasted_iota(jnp.int32, (OROWS, 128), 1)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (OROWS, 128), 1) == 0
    ones128 = jnp.ones((128, 128), jnp.bfloat16)

    # byte planes needed for biased pointer values (bias + OTILE)
    znb = 3 if (mdr * 128 + OTILE) > (1 << 16) else 2

    def flatten(x_rows, nb=2):  # (OROWS, 128) int32 >= 0 -> (OTILE, 1) f32
        g = bd(es, x_rows & 0xFF)
        for k in range(1, nb):
            g = g + bd(es, (x_rows >> (8 * k)) & 0xFF) * float(1 << (8 * k))
        return jnp.sum(g * maskc, axis=1, keepdims=True)

    def unflatten(col, nb=2):  # (OTILE, 1) f32 >= 0 -> (OROWS, 128) f32
        out = None
        rem = col
        for k in range(nb - 1, -1, -1):
            hi = jnp.floor(rem * (1.0 / float(1 << (8 * k))))
            rem = rem - hi * float(1 << (8 * k))
            term = bd(esT, hi * maskc) * float(1 << (8 * k))
            out = term if out is None else out + term
        return out

    def pick(idx, planes):
        """out[i] = Σ_k planes[k][idx[i]] * 256^k for an (OTILE, 1) int32
        in-tile index column; planes are (OROWS, 128) with values<=255."""
        idc = jnp.clip(idx, 0, OTILE - 1)
        oh = ((idc >> 7) == riW).astype(jnp.bfloat16)
        g = bd(oh, planes[0])
        for k, pk in enumerate(planes[1:]):
            g = g + bd(oh, pk) * float(1 << (8 * (k + 1)))
        return jnp.sum(
            jnp.where((idc & 127) == liota2, g, 0.0), axis=1, keepdims=True
        )

    def tile_body(t, carry):
        key1c, distc, prevc = carry
        ts = t * OTILE

        # ---- token window -------------------------------------------------
        lo_row = tok_lo_ref[b, t] >> 7
        if tok_hbm:
            # token arrays too large for VMEM residency (1 MB chunks):
            # DMA just this tile's window in from HBM
            wbuf, sems = maybe_dma
            cps = [
                pltpu.make_async_copy(
                    ref.at[b, pl.ds(lo_row, TW), :], wbuf.at[i], sems.at[i]
                )
                for i, ref in enumerate((off_ref, c1_ref, tb_ref))
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            woff = wbuf[0]
            wc1 = wbuf[1]
            wtb = wbuf[2]
        else:
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

        # ---- paint: key1 (23 bits, 3 byte planes) + dist (2 planes) ------
        pscr_ref[:, :] = jnp.zeros((5 * OROWS, 128), jnp.float32)
        for s in range(TW):
            @pl.when(jnp.any(inw[s]))
            def _(s=s):
                ok = inw[s]
                rs = jnp.where(ok, rel[s], OTILE)
                k1 = ((rs + 1) << 10) | wc1[s]
                ohr = ((rs[None, :] >> 7) == wrow).astype(jnp.bfloat16) * ok[
                    None, :
                ].astype(jnp.bfloat16)
                ohl = ((rs & 127)[:, None] == li).astype(jnp.bfloat16)

                def pb(v):
                    return bd(ohr, ohl * v[:, None].astype(jnp.bfloat16))

                for j, v in enumerate(
                    (k1 & 0xFF, (k1 >> 8) & 0xFF, k1 >> 16,
                     wtb[s] & 0xFF, wtb[s] >> 8)
                ):
                    sl = slice(j * OROWS, (j + 1) * OROWS)
                    pscr_ref[sl, :] = pscr_ref[sl, :] + pb(v)

        key1 = (
            pscr_ref[0:OROWS, :].astype(jnp.int32)
            + (pscr_ref[OROWS : 2 * OROWS, :].astype(jnp.int32) << 8)
            + (pscr_ref[2 * OROWS : 3 * OROWS, :].astype(jnp.int32) << 16)
        )
        dlo = pscr_ref[3 * OROWS : 4 * OROWS, :].astype(jnp.int32)
        dhi = pscr_ref[4 * OROWS :, :].astype(jnp.int32)
        painted = key1 > 0
        key1 = jnp.where(painted, key1, NEG)

        # ---- fill + owner-distance pick -----------------------------------
        f1 = _flat_cummax(key1, key1c)
        key1c_n = f1[OROWS - 1, 127] & 0x3FF

        filled = f1 >= 0
        c1v = f1 & 0x3FF
        kind = c1v >> 9
        ta = c1v & 0x1FF
        st_rel = (f1 >> 10) - 1  # -1 for owners carried from earlier tiles
        st_col = flatten(jnp.clip(st_rel, 0, OTILE - 1))
        dcol = pick(st_col.astype(jnp.int32), (dlo, dhi))
        dist2d = unflatten(dcol).astype(jnp.int32)
        dist = jnp.where(filled & (st_rel >= 0), dist2d, distc)
        dist = jnp.where(filled, dist, 0)

        p = ts + prel
        in_range = filled & (p < total)
        is_m = in_range & (kind == 1)
        distc_n = dist[OROWS - 1, 127]

        # ---- run boundaries + windowed collapse ---------------------------
        mb = jnp.where(is_m, (1 << 17) | dist, 0)
        lane_sh = jnp.concatenate(
            [jnp.zeros((OROWS, 1), jnp.int32), mb[:, :127]], axis=1
        )
        row_last = jnp.broadcast_to(mb[:, 127:128], (OROWS, 128))
        prev_row_last = jnp.concatenate(
            [jnp.broadcast_to(prevc, (1, 128)), row_last[: OROWS - 1, :]],
            axis=0,
        )
        prev_mb = jnp.where(col0, prev_row_last, lane_sh)
        prevc_n = mb[OROWS - 1, 127]

        prev_m = (prev_mb >> 17) & 1
        prev_b = prev_mb & 0x1FFFF
        run_start = is_m & ((prev_m == 0) | (prev_b != dist))
        S = _flat_cummax(jnp.where(run_start, p, NEG), NEG)
        t0 = jnp.maximum(S, ts)
        d = jnp.maximum(dist, 1)
        kq = (p - t0 + d) // d  # ceil((p - t0 + 1)/d), >= 1
        q = p - kq * d  # in [t0 - d, t0): within max_dist of the tile
        z = jnp.where(is_m, jnp.clip(q - ts, -bias, OTILE - 1), prel)

        # ---- pointer doubling (column domain, converges fast) -------------
        zc = flatten(z + bias, znb)  # (OTILE, 1) f32, biased

        def dstep(zq):
            plane = unflatten(zq, znb).astype(jnp.int32)  # (OROWS, 128)
            zqi = zq.astype(jnp.int32) - bias
            in_tile = zqi >= 0
            newv = pick(
                zqi, tuple((plane >> (8 * k)) & 0xFF for k in range(znb))
            )
            return jnp.where(in_tile, newv, zq)

        # two sync-free unrolled rounds cover nesting depth 4 (the common
        # case); a residual while_loop (usually 0 iterations) keeps the
        # structural log2(OTILE) bound without paying its per-iteration
        # scalar-reduce sync on every tile
        z1 = dstep(dstep(zc))

        def dcond(c):
            _, changed, r = c
            return changed & (r < 11)

        def dbody(c):
            zq, _, r = c
            znew = dstep(zq)
            return znew, jnp.any(znew != zq), r + 1

        zc, _, _ = jax.lax.while_loop(
            dcond, dbody, (z1, jnp.any(z1 != zc), jnp.int32(2))
        )

        # ---- pull: resolved window (mdr rows) ++ in-tile value plane ------
        val = jnp.where(in_range & (kind == 0), ta, 0)
        resw = res_ref[pl.ds(t * OROWS, mdr), :]  # rows [ts - mdr*128, ts)
        tbl = jnp.concatenate(
            [resw.astype(jnp.int32) + 128, val], axis=0
        ).astype(jnp.bfloat16)  # (mdr + OROWS, 128), values <= 255 exact
        zg = jnp.clip(zc.astype(jnp.int32), 0, (mdr + OROWS) * 128 - 1)
        ohg = ((zg >> 7) == riP).astype(jnp.bfloat16)
        g = bd(ohg, tbl)  # (OTILE, 128)
        # cross-lane sum as a matmul (values <= 255, bf16-exact); the CPU
        # interpreter lacks this bf16 dot shape, so it keeps jnp.sum
        gm = jnp.where((zg & 127) == liota2, g, 0.0)
        if interp:
            vcol = jnp.sum(gm, axis=1, keepdims=True)
        else:
            vcol = bd(gm, ones128)[:, :1]
        vt = unflatten(vcol).astype(jnp.int32)

        out_ref[0, pl.ds(t * OROWS, OROWS), :] = jnp.where(in_range, vt, 0)
        res_ref[pl.ds(mdr + t * OROWS, OROWS), :] = (vt - 128).astype(jnp.int8)
        return key1c_n, distc_n, prevc_n

    jax.lax.fori_loop(
        0, ntiles, tile_body, (jnp.int32(NEG), jnp.int32(0), jnp.int32(0))
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

    # token arrays stay HBM-resident (windows DMA'd per tile) once their
    # VMEM blocks would crowd out the 16 MB budget
    tok_hbm = (not interpret) and (3 * KR * 128 * 4 + out_cap * 4) > (10 << 20)
    kern = functools.partial(
        _exp2_kernel, KR=KR, out_cap=out_cap, mdr=mdr, ntiles=T,
        interp=interpret, tok_hbm=tok_hbm,
    )
    tok3 = lambda x: x.reshape(B, KR, 128)
    if tok_hbm:  # ANY-space blocks must be the whole array
        vspec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        vspec = pl.BlockSpec(
            (1, KR, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
    scratch = [
        pltpu.VMEM((mdr + out_cap // 128, 128), jnp.int8),
        pltpu.VMEM((5 * OROWS, 128), jnp.float32),
    ]
    if tok_hbm:
        scratch += [
            pltpu.VMEM((3, TW, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ]
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
        scratch_shapes=scratch,
        interpret=interpret,
    )(tok_lo, tp.astype(jnp.int32), total.astype(jnp.int32),
      tok3(off), tok3(c1), tok3(tb))
    return out.reshape(B, out_cap)
