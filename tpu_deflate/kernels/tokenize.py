"""Pallas TPU kernels: fused static-tree tokenizer (decode stage 1).

Replaces the XLA tokenize pipeline (ops/decode.py: candidate plane ->
chase_reach -> cumsum -> mono_compact) for the chunk-parallel static case
— one static-Huffman DEFLATE block per lane, the own-container layout.
The XLA formulation round-trips ~100 full-size arrays through HBM per
pass; here the whole stage runs in three kernels whose intermediates
stay in VMEM:

  K1 (grid over lanes)  candidate-symbol decode at EVERY bit position,
      in a (64, T) tile layout (position p = 64t + j) built from
      transposed byte windows (``pltpu.repeat`` of per-tile 32-bit
      windows; per-row constant shifts) — no gathers, no transposes.
      In-tile pointer doubling needs only THREE rounds: every
      non-terminal static symbol spans >= 8 bits (literals 8/9, matches
      >= 12, EOB terminates), so chains within a 64-bit tile have <= 8
      links.  Emits packed one-step maps (m0) and per-tile entry->exit
      transfer maps (phi), 4 rows per int32.

  K2 (grid over tile slabs)  the cross-tile chase: entry phase per tile
      = exclusive scan of phi under map composition.  Sequential over
      tiles but VECTORIZED ACROSS THE 128 LANES (the scan state is a
      (1, 128) vector of per-lane phases), so the serial walk the
      reference performs once per symbol (NEXT, deflate.py:1402-1445)
      costs ~8k tiny vector steps for the WHOLE batch.

  K3 (grid over lanes)  per-tile token walk (<= 9 visits: 64/8 symbols
      plus a terminator), re-deriving each visited symbol's fields from
      the bitstream (cheaper than storing the full plane to HBM), then
      exclusive lane-scans for token slots / output offsets and an
      in-kernel monotone compaction.  The compaction paints each
      source row of 128 entries with ONE-HOT MATMULS OF SHAPE
      (WR,128)@(128,128): the 128-entry row is the contraction dim, so
      the MXU runs at full K=128 utilization — unlike flatten-based
      one-hot scatters whose K equals the tiny sublane count.

Behavior parity: tokens/err/end-bit semantics match ops/decode.tokenize
(static_only=True, stop_at_eob=True) — the data-parallel reinterpretation
of the reference's STATIC/NEXT/INFLATE decode loop
(/root/reference/deflate.py:1064-1082,1402-1445,1519-1591).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 64
WLK = 9  # max symbol visits per tile (ceil(64/8) literals + terminator)
STOP = 191
STOP4 = np.int32(np.uint32(0xBFBFBFBF))  # STOP in all 4 packed bytes

K_LIT, K_EOB, K_MATCH, K_BAD = 0, 1, 2, 3

# error codes (must match ops/decode.py)
ERR_OK = 0
ERR_BAD_CODE = 2
ERR_DIST = 4
ERR_OVERFLOW = 5
ERR_INPUT = 7


def _rev9(x):
    """Bit-reverse the low 16 bits, then >> 7: MSB-first 9-bit prefix."""
    x = x.astype(jnp.uint32)
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return (x >> 7).astype(jnp.int32)


def _static_sym(get, need_fields: bool = True):
    """Closed-form static-Huffman symbol decode (RFC 1951 3.2.6).

    Same arithmetic as ops/decode._candidate_plane_static (see its
    docstring for the derivation); layout-generic via the ``get(shift,
    nbits)`` bit-window closure.  Returns (kind, adv, ta, dist) where
    ta = literal byte or match length and adv = total bits consumed.
    With need_fields=False only (kind, adv) are valid — K1 builds maps
    from adv alone, so the dist-extra window read and the field
    arithmetic are skipped rather than trusting Mosaic to DCE them.
    """
    v9 = _rev9(get(0, 9))
    c7 = v9 >> 2
    c8 = v9 >> 1
    is7 = c7 < 24
    is8 = ~is7 & (c8 >= 48) & (c8 < 200)
    is9 = ~is7 & ~is8 & (v9 >= 400)
    nb = jnp.where(is7, 7, jnp.where(is8, 8, 9))
    sym = jnp.where(
        is7,
        256 + c7,
        jnp.where(is8, jnp.where(c8 < 192, c8 - 48, 280 + (c8 - 192)),
                  144 + (v9 - 400)),
    )
    bad = ~(is7 | is8 | is9) | (sym > 285)
    is_lit = sym < 256
    is_eob = sym == 256
    i = jnp.clip(sym - 257, 0, 28)
    ebits = jnp.clip((i >> 2) - 1, 0, 5)
    if need_fields:
        lbase = jnp.where(i < 8, i + 3, ((4 + (i & 3)) << ebits) + 3)
        lbase = jnp.where(i == 28, 258, lbase)
    ebits = jnp.where(i == 28, 0, ebits)
    is_m = ~is_lit & ~is_eob & ~bad

    doff = nb + jnp.where(is_m, ebits, 0)
    d5 = get(doff, 5)
    dsym = ((d5 & 1) << 4) | ((d5 & 2) << 2) | (d5 & 4) | ((d5 >> 2) & 2) | (d5 >> 4)
    bad_d = dsym > 29
    debits = jnp.clip((dsym >> 1) - 1, 0, 13)

    kind = jnp.where(
        bad | (is_m & bad_d),
        K_BAD,
        jnp.where(is_lit, K_LIT, jnp.where(is_eob, K_EOB, K_MATCH)),
    )
    is_m = kind == K_MATCH
    adv = jnp.where(is_m, nb + ebits + 5 + debits, jnp.where(kind == K_BAD, 1, nb))
    if not need_fields:
        zero = jnp.zeros_like(adv)
        return kind, adv, zero, zero
    lext = get(nb, 5) & ((1 << ebits) - 1)
    length = lbase + lext
    dbase = jnp.where(dsym < 2, dsym + 1, ((2 + (dsym & 1)) << debits) + 1)
    dext = get(doff + 5, 13) & ((1 << debits) - 1)
    dist = dbase + dext
    ta = jnp.where(kind == K_LIT, sym, jnp.where(is_m, length, 0))
    return kind, adv, ta, jnp.where(is_m, dist, 0)


def _row_of(q: int) -> int:
    """Physical row of in-tile position q in K1's plane layout.

    The plane is built over jnp.concatenate([lo8]*8) (8 copies of the
    per-byte windows stacked along sublanes), so physical row r holds
    position ((r&7)<<3)|(r>>3) — an involution, hence row_of == pos_of."""
    return ((q & 7) << 3) | (q >> 3)


def _pack4(m, g, perm: bool = False):
    """Positions 4g..4g+3 of a 64-row array of byte values -> one int32
    row.  With perm=True, rows are in K1's permuted plane layout."""
    r = _row_of if perm else (lambda q: q)
    return (m[r(4 * g)] | (m[r(4 * g + 1)] << 8) | (m[r(4 * g + 2)] << 16)
            | (m[r(4 * g + 3)] << 24))


def _sel_packed(rows, idx):
    """out[x] = table[idx[x]] for a table given as len(rows) packed int32
    rows (4 byte-entries each); idx values outside [0, 4*len(rows)) keep
    their own value."""
    n = len(rows)
    g = idx >> 2
    acc = idx
    for v in range(n):
        r = rows[v]
        if r.ndim < idx.ndim:
            r = r[None, :]
        acc = jnp.where(g == v, r, acc)
    sub = (acc >> ((idx & 3) << 3)) & 0xFF
    return jnp.where((idx >= 0) & (idx < 4 * n), sub, idx)


def _windows(bT_u32):
    """(16, T) transposed bytes -> per-tile-byte 32-bit LE windows.

    lo8[a] = bytes 8t+a .. +3;  hi8[a] = bytes 8t+a+4 .. +7  (a in [0,8))."""
    lo8 = (bT_u32[0:8] | (bT_u32[1:9] << 8) | (bT_u32[2:10] << 16)
           | (bT_u32[3:11] << 24))
    hi8 = (bT_u32[4:12] | (bT_u32[5:13] << 8) | (bT_u32[6:14] << 16)
           | (bT_u32[7:15] << 24))
    return lo8, hi8


def _mkget(lo, hi, rr):
    """64-bit window bit extractor: up to 15 bits at bit offset rr+shift
    (total <= 49+15 = 64).  Mirrors ops/decode's window math."""

    def get(shift, nbits):
        s = (rr + shift).astype(jnp.uint32)
        s2 = s & 31
        a = (lo >> s2) | ((hi << (31 - s2)) << 1)
        v = jnp.where(s < 32, a, hi >> s2).astype(jnp.uint32)
        if isinstance(nbits, int):
            mask = jnp.uint32((1 << nbits) - 1)
        else:
            mask = (jnp.uint32(1) << nbits.astype(jnp.uint32)) - 1
        return (v & mask).astype(jnp.int32)

    return get


# ---------------------------------------------------------------------------
# K1: plane + in-tile doubling -> one-step maps + per-tile transfer maps
# ---------------------------------------------------------------------------


def _k1_kernel(end_ref, bT_ref, m0p_ref, phiP_ref, *, t64: int, chunk: int):
    b = pl.program_id(0)
    end_bit = end_ref[b]
    bT = bT_ref[0].astype(jnp.uint32)
    lo8, hi8 = _windows(bT)

    for c in range(t64 // chunk):
        sl = slice(c * chunk, (c + 1) * chunk)
        live = TILE * (c * chunk) < end_bit

        @pl.when(live)
        def _(sl=sl, c=c):
            # 8 stacked copies: physical row r holds the 64-bit window at
            # byte 8t + (r&7); it represents in-tile position
            # jj = ((r&7)<<3)|(r>>3) with bit-in-byte shift r>>3.
            lo = jnp.concatenate([lo8[:, sl]] * 8, axis=0)
            hi = jnp.concatenate([hi8[:, sl]] * 8, axis=0)
            r0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, chunk), 0)
            jj = ((r0 & 7) << 3) | (r0 >> 3)
            tt = jax.lax.broadcasted_iota(jnp.int32, (TILE, chunk), 1) + c * chunk
            get = _mkget(lo, hi, r0 >> 3)
            kind, adv, _ta, _dist = _static_sym(get, need_fields=False)
            oob = TILE * tt + jj >= end_bit
            kind = jnp.where(oob, K_BAD, kind)
            term = (kind == K_EOB) | (kind == K_BAD)
            m0 = jnp.where(term, 255, jj + adv)
            m = m0
            for _ in range(3):  # chains <= 8 links (symbols >= 8 bits)
                m = _sel_packed([_pack4(m, g, perm=True) for g in range(16)], m)
            for g in range(16):
                m0p_ref[0, g, sl] = _pack4(m0, g, perm=True)
            phi = jnp.where(m >= 128, STOP, m - TILE)
            for g in range(12):
                phiP_ref[0, g, sl] = _pack4(phi, g, perm=True)

        @pl.when(jnp.logical_not(live))
        def _(sl=sl):
            m0p_ref[0, :, sl] = jnp.full((16, chunk), -1, jnp.int32)
            phiP_ref[0, :, sl] = jnp.full((12, chunk), STOP4, jnp.int32)


# ---------------------------------------------------------------------------
# K2: cross-tile scan (sequential over tiles, vectorized over lanes)
# ---------------------------------------------------------------------------


def _k2_kernel(phi_ref, ent_ref, e_scr, *, tslab: int, start_bit: int):
    i0 = pl.program_id(1)

    @pl.when(i0 == 0)
    def _():
        e_scr[0, :] = jnp.full((128,), start_bit, jnp.int32)

    alive = jnp.any(e_scr[0, :] < TILE)

    @pl.when(alive)
    def _():
        def body(i, _):
            E = e_scr[0, :]
            ent_ref[i, :] = E
            g = E >> 2
            acc = E
            for v in range(12):
                acc = jnp.where(g == v, phi_ref[i, v, :], acc)
            nE = (acc >> ((E & 3) << 3)) & 0xFF
            e_scr[0, :] = jnp.where(E < TILE, nE, E)
            return 0

        jax.lax.fori_loop(0, tslab, body, 0)

    @pl.when(jnp.logical_not(alive))
    def _():
        ent_ref[:, :] = jnp.broadcast_to(e_scr[0, :], (tslab, 128))


# ---------------------------------------------------------------------------
# K3: per-tile walk + field re-derivation + slot scans + compaction
# ---------------------------------------------------------------------------


def _lane_exscan(x, width: int):
    """Exclusive prefix sum along lanes of a (1, width) int32 row."""
    orig = x
    li = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    k = 1
    while k < width:
        sh = pltpu.roll(x, k, 1)
        x = x + jnp.where(li >= k, sh, 0)
        k *= 2
    return x - orig


def _k3_kernel(
    end_ref, bT_ref, m0p_ref, ent_ref, tok_ref, meta_ref,
    w_scr, sl_scr,
    *, t64: int, tokrows: int, wr: int, chunk: int,
):
    b = pl.program_id(0)
    end_bit = end_ref[b]
    tok_ref[0] = jnp.zeros_like(tok_ref[0])
    bT = bT_ref[0].astype(jnp.uint32)
    lo8, hi8 = _windows(bT)

    # ---- walk: <= WLK symbol visits per tile, chunked over columns so
    # chunks wholly past end_bit skip the symbol re-derivation (at typical
    # ratios ~40% of the position window is beyond the stream).  Per-chunk
    # EOB/bad reductions land in two extra w_scr rows.  Refs are loaded
    # full-row OUTSIDE the conds (Mosaic lowers an offset ref-slice load
    # inside a cond as an unsupported >2D gather); chunks slice the values.
    m0p_full = [m0p_ref[0, g, :] for g in range(16)]
    ent_row = ent_ref[0, 0, :]
    for c in range(t64 // chunk):
        sl = slice(c * chunk, (c + 1) * chunk)
        live_c = TILE * (c * chunk) < end_bit

        @pl.when(live_c)
        def _(sl=sl, c=c):
            m0p_rows = [r[sl] for r in m0p_full]
            lo8c = [lo8[v][sl].reshape(1, chunk) for v in range(8)]
            hi8c = [hi8[v][sl].reshape(1, chunk) for v in range(8)]
            cur = ent_row[sl].reshape(1, chunk)
            tvec = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                    + c * chunk)
            bad_col = jnp.zeros((1, chunk), bool)
            eob_col = jnp.full((1, chunk), -1, jnp.int32)
            for s in range(WLK):
                inb = cur < TILE
                a = jnp.clip(cur >> 3, 0, 7)
                lo = jnp.zeros((1, chunk), jnp.uint32)
                hi = jnp.zeros((1, chunk), jnp.uint32)
                for v in range(8):
                    lo = jnp.where(a == v, lo8c[v], lo)
                    hi = jnp.where(a == v, hi8c[v], hi)
                get = _mkget(lo, hi, cur & 7)
                kind, _adv, ta, dist = _static_sym(get)
                oob = TILE * tvec + cur >= end_bit
                kind = jnp.where(inb & ~oob, kind, K_BAD)
                is_tok = inb & ((kind == K_LIT) | (kind == K_MATCH))
                tk = jnp.where(kind == K_MATCH, 1, 0)
                packed = (tk << 26) | (ta << 17) | (dist & 0x1FFFF)
                w_scr[s, sl] = jnp.where(is_tok, packed, -1)[0]
                bad_col = bad_col | (inb & (kind == K_BAD))
                eob_col = jnp.maximum(
                    eob_col,
                    jnp.where(inb & (kind == K_EOB), TILE * tvec + cur, -1),
                )
                cur = _sel_packed(m0p_rows, cur)
            w_scr[WLK, sl] = eob_col[0]
            w_scr[WLK + 1, sl] = bad_col[0].astype(jnp.int32)

        @pl.when(jnp.logical_not(live_c))
        def _(sl=sl):
            w_scr[:WLK, sl] = jnp.full((WLK, chunk), -1, jnp.int32)
            w_scr[WLK, sl] = jnp.full((chunk,), -1, jnp.int32)
            w_scr[WLK + 1, sl] = jnp.zeros((chunk,), jnp.int32)

    # ---- per-tile counts, global scans ---------------------------------
    W = [w_scr[s, :].reshape(1, t64) for s in range(WLK)]
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
    run = base_byte
    slot = base_tok
    tokcap = tokrows * 128
    for s in range(WLK):
        is_m = live[s] & (((W[s] >> 26) & 3) == 1)
        too_far = too_far | (is_m & ((W[s] & 0x1FFFF) > run))
        run = run + lens[s]
        sl_scr[s, :] = jnp.where(live[s], slot, tokcap + 1024)[0]
        slot = slot + live[s].astype(jnp.int32)

    eob_at = jnp.max(w_scr[WLK, :])
    bad = jnp.max(w_scr[WLK + 1, :]) > 0
    toofar = jnp.any(too_far)
    cap_ok = ntok < tokcap - 8
    anybad = bad | toofar | ~cap_ok
    err = jnp.where(
        anybad,
        jnp.where(toofar, ERR_DIST,
                  jnp.where(~cap_ok, ERR_OVERFLOW, ERR_BAD_CODE)),
        jnp.where(eob_at >= 0, ERR_OK, ERR_INPUT),
    )
    end_pos = jnp.where(eob_at >= 0, eob_at + 7, end_bit)

    # ---- compaction: transpose-free one-hot scatter ---------------------
    # acc[r, k] = sum_src ohr[r, src] * v[src] * (rel[src] & 127 == k),
    # with BOTH one-hots built from lane-major rel (sublane iota compares)
    # and the contraction over src = lanes of both operands (A @ B^T on
    # the MXU) — the earlier formulation transposed rel/v to sublanes per
    # visit, 2 vector transposes x WLK x t64/128 per lane, which
    # dominated this kernel (~27 of its 37 ms per 8 MiB).  The 4 value
    # channels are stacked along M into ONE (4*wr, 128) operand so the
    # (128, 128) one-hot loads into the MXU once per visit, not 4x; a
    # chunk whose tiles hold no live tokens skips its visits entirely.
    wrow = jax.lax.broadcasted_iota(jnp.int32, (wr, 128), 0)
    si128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)  # sublane ids
    dotT = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def chunk_body(i, _):
        idx = pl.multiple_of(i * 128, 128)
        slots = sl_scr[:, pl.ds(idx, 128)]  # (WLK, 128) absolute slots
        has = jnp.min(slots) < tokcap

        @pl.when(has)
        def _():
            toks = w_scr[:WLK, pl.ds(idx, 128)]
            row0 = jnp.clip(jnp.min(slots) >> 7, 0, tokrows - wr)
            acc = jnp.zeros((4 * wr, 128), jnp.float32)
            for s in range(WLK):
                rel = (slots[s] - row0 * 128)[None, :]  # (1, 128) lane-major
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


def _ceil(a, b):
    return -(-a // b)


@functools.partial(
    jax.jit, static_argnames=("pw", "start_bit", "interpret")
)
def tokenize_static_batch(
    rows: jax.Array,  # uint8[B, M] — one static block per lane, bit 0 on
    end_bits: jax.Array,  # int32[B] — 8 * compressed size
    pw: int = 1 << 19,
    start_bit: int = 3,
    interpret: bool = False,
):
    """Fused static tokenize: one single-pass boundary chase per lane.

    Covers streams with end_bit <= pw - 64 (the caller falls back to the
    XLA tokenize otherwise).  Returns (tok_packed int32[B, tokcap], ntok,
    out_total, end_pos, err) with tok packed as tk(1)<<26 | ta(9)<<17 |
    dist(17) — the same layout ops/decode.block_pass compacts.
    """
    B, M = rows.shape
    t64 = pw // TILE
    assert t64 % 128 == 0, "pw must be a multiple of 64*128"
    u = t64 // 128

    def _pick(limit):  # largest divisor of u with d*128 <= limit
        for d in range(u, 0, -1):
            if u % d == 0 and d * 128 <= limit:
                return d * 128
        return 128

    chunk = _pick(1664)  # K1/K3 plane/walk columns per chunk
    tslab = _pick(640)  # K2 tiles per grid step
    wr = 16  # window rows: <= 9*128+127 slots; 16 keeps 4*wr slices 8-aligned
    tokrows = max(_ceil(min(WLK * t64, pw // 8 + 64), 128) + 2, wr)

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

    m0p, phiP = pl.pallas_call(
        functools.partial(_k1_kernel, t64=t64, chunk=chunk),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, 16, t64), jnp.int32),
            jax.ShapeDtypeStruct((B, 12, t64), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((1, 16, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ends, bT)

    # ---- K2 over lane groups of 128 ------------------------------------
    Bp = _ceil(B, 128) * 128
    phiT = jnp.pad(phiP, ((0, Bp - B), (0, 0), (0, 0)), constant_values=STOP4)
    phiT = phiT.transpose(2, 1, 0)  # (t64, 12, Bp)
    entT = pl.pallas_call(
        functools.partial(_k2_kernel, tslab=tslab, start_bit=start_bit),
        grid=(Bp // 128, t64 // tslab),
        in_specs=[
            pl.BlockSpec(
                (tslab, 12, 128), lambda g, i: (i, 0, g), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=jax.ShapeDtypeStruct((t64, Bp), jnp.int32),
        out_specs=pl.BlockSpec(
            (tslab, 128), lambda g, i: (i, g), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        interpret=interpret,
    )(phiT)
    ent = entT.T[:B].reshape(B, 1, t64)

    tok, meta = pl.pallas_call(
        functools.partial(
            _k3_kernel, t64=t64, tokrows=tokrows, wr=wr, chunk=chunk
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16, t64), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((WLK + 2, t64), jnp.int32),
            pltpu.VMEM((WLK, t64), jnp.int32),
        ],
        interpret=interpret,
    )(ends, bT, m0p, ent)

    tok = tok.reshape(B, tokrows * 128)
    meta = meta.reshape(B, 128)
    # empty lanes (no stream at all) are a clean end, not ERR_INPUT —
    # matches ops/decode.tokenize's clean_end rule for pos >= end_bit
    empty = ends <= start_bit
    err = jnp.where(empty, ERR_OK, meta[:, 2])
    end_pos = jnp.where(empty, start_bit, meta[:, 3])
    return tok, meta[:, 0], meta[:, 1], end_pos, err
