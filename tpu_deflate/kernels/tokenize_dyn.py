"""Pallas TPU kernels: fused DYNAMIC-tree tokenizer (decode stage 1).

The dynamic analog of kernels/tokenize.py: one comparison-decode
candidate plane + boundary chase per lane, with PER-LANE canonical
Huffman parameters instead of the closed-form static arithmetic — the
data-parallel reinterpretation of the reference's dynamic decode loop
(BL/READBL/REPEAT header + HF1..SPREAD table builds + NEXT/D_NEXT symbol
walk, /root/reference/deflate.py:1084-1517).  Header parsing and table
construction happen OUTSIDE the kernel (ops/decode.dyn_header_params_batch,
a batched XLA pass); the kernels consume a 160-int packed table per lane:

  K1d (grid over lanes)  comparison-decode a candidate symbol at EVERY
      bit position: code length = first L with 15-bit reversed prefix <
      lit_lim[L] (15 scalar compares), rank arithmetic, then rank->symbol
      via predicated selects over the packed 81-row sym table; length/
      distance bases and extra-bit counts follow the RFC closed forms in
      the symbol.  Emits the PACKED FIELD PLANE (kind|adv|ta|dist-1, the
      same layout as ops/decode._candidate_plane) plus one-step maps and
      full 64-entry transfer maps.  Five pointer-doubling rounds close
      every in-tile chain: the caller guarantees min literal code length
      >= MIN_LIT_LEN (3) bits, so chains within a 64-bit tile have <= 22
      links.

  K2d (grid over tile slabs)  the cross-tile scan, vectorized across 128
      lanes, generalized for PER-LANE START BITS: a lane's state is
      "bits until the first symbol" until its start tile is reached
      (decremented by 64 per tile), then the entry phase as in the static
      K2; terminated chains go negative (sticky).

  K3d (grid over lanes)  per-tile token walk (<= 22 visits: 64/3-bit
      symbols plus a terminator) reading each visited symbol's fields
      from K1d's plane by a 64-row predicated select — no re-derivation,
      no second pass over the tables — then the same slot scans and
      monotone one-hot MXU compaction as the static K3.

Behavior parity: tokens/err/end-bit semantics match ops/decode.tokenize
(stop_at_eob=True) for a single static- or dynamic-tree block per lane;
enforced by interpret-mode tests against the XLA tokenize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_deflate.kernels.tokenize import (
    ERR_BAD_CODE,
    ERR_DIST,
    ERR_INPUT,
    ERR_OK,
    ERR_OVERFLOW,
    K_BAD,
    K_EOB,
    K_LIT,
    K_MATCH,
    STOP,
    STOP4,
    TILE,
    _ceil,
    _lane_exscan,
    _mkget,
    _pack4,
    _sel_packed,
    _windows,
)

# max symbol visits per 64-bit tile = ceil(64 / min literal code length)
# + 1 terminator; the batched container path gates at 3 bits (tier 3),
# the foreign single-stream loop at 2 (real zlib -6 streams contain
# 2-bit-literal blocks); shorter codes fall back to the XLA tokenize
WLK_BY_TIER = {3: 22, 2: 33}
WLK_D = WLK_BY_TIER[3]
MIN_LIT_LEN = 3
MIN_LIT_LEN_FOREIGN = 2

# packed per-lane table layout (ops/decode.dyn_header_params_batch)
TAB_LIT_LIM = 0
TAB_LIT_RD = 16
TAB_DIST_LIM = 32
TAB_DIST_RD = 48
TAB_SYM8 = 64  # 72 rows: 4 x 8-bit low bytes of (sym+1), 0 = dead rank
TAB_SYMHI = 136  # 9 rows: 32 x 1-bit bit-8 of (sym+1)
TAB_DSYM8 = 145  # 8 rows: 4 x 8-bit (dsym+1), 0 = dead rank
TAB_START = 153
TAB_MINLEN = 154
TAB_OUTBASE = 155  # output bytes already emitted before this block
TAB_W = 160


def _rev15(x):
    """Bit-reverse the low 16 bits, then >> 1: MSB-first 15-bit prefix."""
    x = x.astype(jnp.uint32)
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return (x >> 1).astype(jnp.int32)


def _dyn_sym(get, tab, b):
    """Comparison-decode one candidate symbol per element.

    get(shift, nbits): the layout-generic bit-window closure; tab: SMEM
    ref of the (1, TAB_W) per-lane table.  Returns (kind, adv, ta, dist)
    with the same semantics as tokenize._static_sym(need_fields=True) —
    adv = total bits consumed, ta = literal byte or match length.
    """
    shape = get(0, 1).shape

    def scal(i):
        return tab[b, i]

    # --- literal/length code length by comparison ------------------------
    v15 = _rev15(get(0, 15))
    cnt = jnp.zeros(shape, jnp.int32)
    for L in range(1, 16):
        cnt = cnt + (v15 < scal(TAB_LIT_LIM + L))
    nb = 16 - cnt
    nbc = jnp.clip(nb, 1, 15)
    rd = jnp.zeros(shape, jnp.int32)
    for L in range(1, 16):
        rd = jnp.where(nbc == L, scal(TAB_LIT_RD + L), rd)
    rank = (v15 >> (15 - nbc)) + rd

    # --- rank -> symbol via the packed 81-row table ----------------------
    rc = jnp.clip(rank, 0, 287)
    g = rc >> 2
    lo = jnp.zeros(shape, jnp.int32)
    for v in range(72):
        lo = jnp.where(g == v, scal(TAB_SYM8 + v), lo)
    lo = (lo >> ((rc & 3) << 3)) & 0xFF
    gh = rc >> 5
    hi = jnp.zeros(shape, jnp.int32)
    for v in range(9):
        hi = jnp.where(gh == v, scal(TAB_SYMHI + v), hi)
    hi = (hi >> (rc & 31)) & 1
    symp1 = lo | (hi << 8)
    bad = (nb > 15) | (rank < 0) | (rank >= 288) | (symp1 == 0)
    sym = jnp.clip(symp1 - 1, 0, 287)

    is_lit = sym < 256
    is_eob = sym == 256
    bad = bad | (sym > 285)
    i = jnp.clip(sym - 257, 0, 28)
    ebits = jnp.clip((i >> 2) - 1, 0, 5)
    lbase = jnp.where(i < 8, i + 3, ((4 + (i & 3)) << ebits) + 3)
    lbase = jnp.where(i == 28, 258, lbase)
    ebits = jnp.where(i == 28, 0, ebits)
    is_m = ~is_lit & ~is_eob & ~bad
    ebits = jnp.where(is_m, ebits, 0)
    lext = get(nbc, 5) & ((1 << ebits) - 1)
    length = lbase + lext

    # --- distance code (match candidates; masked otherwise) --------------
    doff = nbc + ebits
    dv15 = _rev15(get(doff, 15))
    dcnt = jnp.zeros(shape, jnp.int32)
    for L in range(1, 16):
        dcnt = dcnt + (dv15 < scal(TAB_DIST_LIM + L))
    dnb = 16 - dcnt
    dnbc = jnp.clip(dnb, 1, 15)
    drd = jnp.zeros(shape, jnp.int32)
    for L in range(1, 16):
        drd = jnp.where(dnbc == L, scal(TAB_DIST_RD + L), drd)
    drank = (dv15 >> (15 - dnbc)) + drd
    drc = jnp.clip(drank, 0, 31)
    dg = drc >> 2
    dlo = jnp.zeros(shape, jnp.int32)
    for v in range(8):
        dlo = jnp.where(dg == v, scal(TAB_DSYM8 + v), dlo)
    dsymp1 = (dlo >> ((drc & 3) << 3)) & 0xFF
    bad_d = (dnb > 15) | (drank < 0) | (drank >= 32) | (dsymp1 == 0)
    dsym = jnp.clip(dsymp1 - 1, 0, 29)
    debits = jnp.clip((dsym >> 1) - 1, 0, 13)
    dbase = jnp.where(dsym < 2, dsym + 1, ((2 + (dsym & 1)) << debits) + 1)
    dext = get(doff + dnbc, 13) & ((1 << debits) - 1)
    dist = dbase + dext

    kind = jnp.where(
        bad | (is_m & bad_d),
        K_BAD,
        jnp.where(is_lit, K_LIT, jnp.where(is_eob, K_EOB, K_MATCH)),
    )
    is_m = kind == K_MATCH
    adv = jnp.where(
        is_m, nbc + ebits + dnbc + debits, jnp.where(kind == K_BAD, 1, nbc)
    )
    ta = jnp.where(kind == K_LIT, sym, jnp.where(is_m, length, 0))
    return kind, adv, ta, jnp.where(is_m, dist, 0)


# ---------------------------------------------------------------------------
# K1d: plane + in-tile doubling -> field plane + one-step + transfer maps
# ---------------------------------------------------------------------------


def _k1d_kernel(end_ref, tab_ref, bT_ref, plane_ref, m0p_ref, phiP_ref,
                *, t64: int, chunk: int):
    b = pl.program_id(0)
    end_bit = end_ref[b]
    bT = bT_ref[0].astype(jnp.uint32)
    lo8, hi8 = _windows(bT)

    for c in range(t64 // chunk):
        sl = slice(c * chunk, (c + 1) * chunk)
        live = TILE * (c * chunk) < end_bit

        @pl.when(live)
        def _(sl=sl, c=c):
            lo = jnp.concatenate([lo8[:, sl]] * 8, axis=0)
            hi = jnp.concatenate([hi8[:, sl]] * 8, axis=0)
            r0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, chunk), 0)
            jj = ((r0 & 7) << 3) | (r0 >> 3)
            tt = (jax.lax.broadcasted_iota(jnp.int32, (TILE, chunk), 1)
                  + c * chunk)
            get = _mkget(lo, hi, r0 >> 3)
            kind, adv, ta, dist = _dyn_sym(get, tab_ref, b)
            oob = TILE * tt + jj >= end_bit
            kind = jnp.where(oob, K_BAD, kind)
            adv = jnp.where(oob, 1, adv)
            # field plane in the XLA _candidate_plane layout, stored at
            # PHYSICAL rows (row r holds position ((r&7)<<3)|(r>>3), the
            # same involution K3d's select undoes)
            plane_ref[0, :, sl] = (
                (kind << 30) | (adv << 24) | (ta << 15)
                | jnp.where(kind == K_MATCH, dist - 1, 0)
            )
            term = (kind == K_EOB) | (kind == K_BAD)
            m0 = jnp.where(term, 255, jj + adv)
            m = m0
            for _ in range(5):  # chains <= 22 links (codes >= 3 bits)
                m = _sel_packed([_pack4(m, g, perm=True) for g in range(16)], m)
            for g in range(16):
                m0p_ref[0, g, sl] = _pack4(m0, g, perm=True)
            phi = jnp.where(m >= 128, STOP, m - TILE)
            for g in range(16):  # FULL 64-entry maps: start phases reach 63
                phiP_ref[0, g, sl] = _pack4(phi, g, perm=True)

        @pl.when(jnp.logical_not(live))
        def _(sl=sl):
            plane_ref[0, :, sl] = jnp.full(
                (TILE, chunk), (K_BAD << 30) | (1 << 24), jnp.int32
            )
            m0p_ref[0, :, sl] = jnp.full((16, chunk), -1, jnp.int32)
            phiP_ref[0, :, sl] = jnp.full((16, chunk), STOP4, jnp.int32)


# ---------------------------------------------------------------------------
# K2d: cross-tile scan with per-lane start bits
# ---------------------------------------------------------------------------


def _k2d_kernel(start_ref, phi_ref, ent_ref, e_scr, *, tslab: int):
    g0 = pl.program_id(0)
    i0 = pl.program_id(1)

    @pl.when(i0 == 0)
    def _():
        # state per lane: bits until the first symbol (>= 64 counts down);
        # in [0, 64) = entry phase at the current tile; < 0 = terminated
        e_scr[0, :] = start_ref[0, :]

    alive = jnp.any(e_scr[0, :] >= 0)

    @pl.when(alive)
    def _():
        def body(i, _):
            E = e_scr[0, :]
            in_tile = (E >= 0) & (E < TILE)
            ent_ref[i, :] = jnp.where(in_tile, E, -1)
            Ec = jnp.clip(E, 0, TILE - 1)
            gq = Ec >> 2
            acc = Ec
            for v in range(16):
                acc = jnp.where(gq == v, phi_ref[i, v, :], acc)
            nE = (acc >> ((Ec & 3) << 3)) & 0xFF
            nE = jnp.where(nE >= 128, -1, nE)  # STOP byte -> terminated
            e_scr[0, :] = jnp.where(
                in_tile, nE, jnp.where(E >= TILE, E - TILE, E)
            )
            return 0

        jax.lax.fori_loop(0, tslab, body, 0)

    @pl.when(jnp.logical_not(alive))
    def _():
        ent_ref[:, :] = jnp.full((tslab, 128), -1, jnp.int32)


# ---------------------------------------------------------------------------
# K3d: per-tile walk reading fields from the plane + compaction
# ---------------------------------------------------------------------------


def _k3d_kernel(
    end_ref, tab_ref, plane_ref, m0p_ref, ent_ref, tok_ref, meta_ref,
    w_scr, sl_scr,
    *, t64: int, tokrows: int, wr: int, chunk: int, wlk: int = WLK_D,
):
    b = pl.program_id(0)
    end_bit = end_ref[b]
    out_base = tab_ref[b, TAB_OUTBASE]
    tok_ref[0] = jnp.zeros_like(tok_ref[0])

    # ---- walk: <= wlk symbol visits per tile.  Fields come from K1d's
    # plane by a 64-row predicated select at the visited phase (physical
    # row of in-tile position q is ((q&7)<<3)|(q>>3), the _row_of
    # involution) — no bitstream re-derivation.
    ent_row = ent_ref[0, 0, :]
    m0p_full = [m0p_ref[0, g, :] for g in range(16)]
    plane_rows = [plane_ref[0, r, :] for r in range(TILE)]
    for c in range(t64 // chunk):
        sl = slice(c * chunk, (c + 1) * chunk)
        live_c = TILE * (c * chunk) < end_bit

        @pl.when(live_c)
        def _(sl=sl, c=c):
            m0p_rows = [r[sl] for r in m0p_full]
            pl_rows = [r[sl].reshape(1, chunk) for r in plane_rows]
            cur = ent_row[sl].reshape(1, chunk)
            tvec = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                    + c * chunk)
            bad_col = jnp.zeros((1, chunk), bool)
            eob_col = jnp.full((1, chunk), -1, jnp.int32)
            for s in range(wlk):
                inb = (cur >= 0) & (cur < TILE)
                curc = jnp.clip(cur, 0, TILE - 1)
                prow = ((curc & 7) << 3) | (curc >> 3)  # physical row
                pv = jnp.zeros((1, chunk), jnp.int32)
                for r in range(TILE):
                    pv = jnp.where(prow == r, pl_rows[r], pv)
                kind = (pv >> 30) & 3
                adv = (pv >> 24) & 0x3F
                ta = (pv >> 15) & 0x1FF
                dist = (pv & 0x7FFF) + 1
                oob = TILE * tvec + curc >= end_bit
                kind = jnp.where(inb & ~oob, kind, K_BAD)
                is_tok = inb & ((kind == K_LIT) | (kind == K_MATCH))
                tk = jnp.where(kind == K_MATCH, 1, 0)
                packed = (
                    (tk << 26) | (ta << 17)
                    | jnp.where(kind == K_MATCH, dist, 0)
                )
                w_scr[s, sl] = jnp.where(is_tok, packed, -1)[0]
                bad_col = bad_col | (inb & (kind == K_BAD))
                eob_col = jnp.maximum(
                    eob_col,
                    jnp.where(
                        inb & (kind == K_EOB),
                        ((TILE * tvec + curc) << 6) | adv, -1,
                    ),
                )
                cur = jnp.where(inb, _sel_packed(m0p_rows, curc), cur)
            w_scr[wlk, sl] = eob_col[0]
            w_scr[wlk + 1, sl] = bad_col[0].astype(jnp.int32)

        @pl.when(jnp.logical_not(live_c))
        def _(sl=sl):
            w_scr[:wlk, sl] = jnp.full((wlk, chunk), -1, jnp.int32)
            w_scr[wlk, sl] = jnp.full((chunk,), -1, jnp.int32)
            w_scr[wlk + 1, sl] = jnp.zeros((chunk,), jnp.int32)

    # ---- per-tile counts, global scans (as the static K3) ---------------
    W = [w_scr[s, :].reshape(1, t64) for s in range(wlk)]
    live = [w >= 0 for w in W]
    lens = [
        jnp.where(li, jnp.where((w >> 26) & 3 == 0, 1, (w >> 17) & 0x1FF), 0)
        for w, li in zip(W, live)
    ]
    n_t = sum(li.astype(jnp.int32) for li in live)
    bytes_t = sum(lens)
    base_tok = _lane_exscan(n_t, t64)
    base_byte = _lane_exscan(bytes_t, t64)
    ntok = jnp.max(base_tok + n_t)
    out_total = jnp.max(base_byte + bytes_t)

    too_far = jnp.zeros((1, t64), bool)
    # matches may reach into output emitted by EARLIER blocks of the same
    # stream (foreign multi-block decode); out_base carries that offset
    run = base_byte + out_base
    slot = base_tok
    tokcap = tokrows * 128
    for s in range(wlk):
        is_m = live[s] & (((W[s] >> 26) & 3) == 1)
        too_far = too_far | (is_m & ((W[s] & 0x1FFFF) > run))
        run = run + lens[s]
        sl_scr[s, :] = jnp.where(live[s], slot, tokcap + 1024)[0]
        slot = slot + live[s].astype(jnp.int32)

    eob_pk = jnp.max(w_scr[wlk, :])
    bad = jnp.max(w_scr[wlk + 1, :]) > 0
    toofar = jnp.any(too_far)
    cap_ok = ntok < tokcap - 8
    anybad = bad | toofar | ~cap_ok
    err = jnp.where(
        anybad,
        jnp.where(toofar, ERR_DIST,
                  jnp.where(~cap_ok, ERR_OVERFLOW, ERR_BAD_CODE)),
        jnp.where(eob_pk >= 0, ERR_OK, ERR_INPUT),
    )
    end_pos = jnp.where(
        eob_pk >= 0, (eob_pk >> 6) + (eob_pk & 63), end_bit
    )

    # ---- compaction: transpose-free one-hot MXU scatter (as static K3) --
    wrow = jax.lax.broadcasted_iota(jnp.int32, (wr, 128), 0)
    si128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    dotT = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def chunk_body(i, _):
        idx = pl.multiple_of(i * 128, 128)
        slots = sl_scr[:, pl.ds(idx, 128)]
        has = jnp.min(slots) < tokcap

        @pl.when(has)
        def _():
            toks = w_scr[:wlk, pl.ds(idx, 128)]
            row0 = jnp.clip(jnp.min(slots) >> 7, 0, tokrows - wr)
            acc = jnp.zeros((4 * wr, 128), jnp.float32)
            for s in range(wlk):
                rel = (slots[s] - row0 * 128)[None, :]
                ok = (rel >= 0) & (rel < wr * 128)
                ohr = (((rel >> 7) == wrow) & ok).astype(jnp.bfloat16)
                m1b = (si128 == (rel & 127)).astype(jnp.bfloat16)
                v = jnp.where(ok, toks[s], 0)
                stacked = jnp.concatenate(
                    [ohr * ((v >> (8 * j)) & 0xFF).astype(jnp.bfloat16)
                     for j in range(4)],
                    axis=0,
                )
                acc = acc + dotT(stacked, m1b)
            ch = [acc[j * wr:(j + 1) * wr].astype(jnp.int32) for j in range(4)]
            paint = ch[0] + (ch[1] << 8) + (ch[2] << 16) + (ch[3] << 24)
            tok_ref[0, pl.ds(row0, wr), :] = (
                tok_ref[0, pl.ds(row0, wr), :] + paint
            )

        return 0

    jax.lax.fori_loop(0, t64 // 128, chunk_body, 0)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    meta = jnp.where(lanes == 0, ntok, 0)
    meta = jnp.where(lanes == 1, out_total, meta)
    meta = jnp.where(lanes == 2, err, meta)
    meta = jnp.where(lanes == 3, end_pos, meta)
    meta_ref[0, 0, :] = meta[0]


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("pw", "interpret", "hier", "tier"))
def tokenize_dyn_batch(
    rows: jax.Array,  # uint8[B, M] — one block per lane, bit 0 on
    end_bits: jax.Array,  # int32[B] — 8 * compressed size
    tab: jax.Array,  # int32[B, TAB_W] from dyn_header_params_batch
    starts: jax.Array,  # int32[B] absolute bit of the first symbol
    pw: int = 1 << 19,
    interpret: bool = False,
    hier: bool = False,
    tier: int = 3,
):
    """Fused dynamic/static tokenize: one boundary-chase pass per lane
    with per-lane comparison-decode tables.

    The caller (decode_rows_batch) guarantees: per-lane trees valid
    (prep ok), min literal code length >= MIN_LIT_LEN, end_bit <= pw-64.
    Returns (tok_packed int32[B, tokcap], ntok, out_total, end_pos, err)
    in the same layout as tokenize_static_batch.

    ``hier``: replace the lane-parallel K2d tile scan with the
    single-lane hierarchical chase (kernels/chase1.ent_from_phi) —
    requires B == 1, t64 a power of two, and starts[0] < 64 (the foreign
    loop re-bases each block's window at the first symbol's byte).  K2d's
    wall-clock is t64 sequential steps regardless of batch size, so for
    one lane the log-depth form is ~50x cheaper.
    """
    B, M = rows.shape
    t64 = pw // TILE
    assert t64 % 128 == 0, "pw must be a multiple of 64*128"
    u = t64 // 128

    def _pick(limit):
        for d in range(u, 0, -1):
            if u % d == 0 and d * 128 <= limit:
                return d * 128
        return 128

    # K1d gains from FINE live-gating granularity (the plane work per
    # column chunk is skipped once past end_bit; at ratio ~0.45 most of
    # the window is dead) while K3d's walk prefers wider chunks (its
    # per-chunk fixed cost dominates at 128).  Measured on v5e at the
    # bench shape: K1d 16.5 -> 10.4 ms at chunk 128; K3d 7.8 ms at 640.
    chunk1 = _pick(128)
    chunk3 = _pick(640)
    tslab = _pick(640)
    wlk = WLK_BY_TIER[tier]
    wr = 40 if tier == 2 else 24  # window rows: <= wlk*128+127 slots/chunk
    tokrows = max(_ceil(min(wlk * t64, pw // 8 + 64), 128) + 2, wr)

    need = pw // 8 + 16
    if M >= need:
        data = rows[:, :need]
    else:
        data = jnp.pad(rows, ((0, 0), (0, need - M)))
    d = data.astype(jnp.int32)
    b8 = d[:, : t64 * 8].reshape(B, t64, 8).transpose(0, 2, 1)
    b8n = jnp.concatenate(
        [b8[:, :, 1:], jnp.zeros((B, 8, 1), jnp.int32)], axis=2
    )
    bT = jnp.concatenate([b8, b8n], axis=1)  # (B, 16, t64)
    ends = end_bits.astype(jnp.int32)

    plane, m0p, phiP = pl.pallas_call(
        functools.partial(_k1d_kernel, t64=t64, chunk=chunk1),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (B, TAB_W), lane-indexed
            pl.BlockSpec((1, 16, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, TILE, t64), jnp.int32),
            jax.ShapeDtypeStruct((B, 16, t64), jnp.int32),
            jax.ShapeDtypeStruct((B, 16, t64), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((1, TILE, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ends, tab.astype(jnp.int32), bT)

    if hier:
        from tpu_deflate.kernels.chase1 import ent_from_phi

        assert B == 1 and (t64 & (t64 - 1)) == 0
        ent = ent_from_phi(phiP, starts[0], interpret=interpret)
    else:
        # ---- K2d over lane groups of 128 -------------------------------
        Bp = _ceil(B, 128) * 128
        phiT = jnp.pad(
            phiP, ((0, Bp - B), (0, 0), (0, 0)), constant_values=STOP4
        )
        phiT = phiT.transpose(2, 1, 0)  # (t64, 16, Bp)
        startsT = jnp.pad(
            starts.astype(jnp.int32), (0, Bp - B), constant_values=-1
        ).reshape(Bp // 128, 128)
        entT = pl.pallas_call(
            functools.partial(_k2d_kernel, tslab=tslab),
            grid=(Bp // 128, t64 // tslab),
            in_specs=[
                pl.BlockSpec((1, 128), lambda g, i: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (tslab, 16, 128), lambda g, i: (i, 0, g), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=jax.ShapeDtypeStruct((t64, Bp), jnp.int32),
            out_specs=pl.BlockSpec(
                (tslab, 128), lambda g, i: (i, g), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
            interpret=interpret,
        )(startsT, phiT)
        ent = entT.T[:B].reshape(B, 1, t64)

    tok, meta = pl.pallas_call(
        functools.partial(
            _k3d_kernel, t64=t64, tokrows=tokrows, wr=wr, chunk=chunk3,
            wlk=wlk,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (B, TAB_W)
            pl.BlockSpec((1, TILE, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, tokrows, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec(
                (1, tokrows, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((wlk + 2, t64), jnp.int32),
            pltpu.VMEM((wlk, t64), jnp.int32),
        ],
        interpret=interpret,
    )(ends, tab.astype(jnp.int32), plane, m0p, ent)

    tok = tok.reshape(B, tokrows * 128)
    meta = meta.reshape(B, 128)
    empty = ends <= 3
    err = jnp.where(empty, ERR_OK, meta[:, 2])
    end_pos = jnp.where(empty, 0, meta[:, 3])
    return tok, meta[:, 0], meta[:, 1], end_pos, err
