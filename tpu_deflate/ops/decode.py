"""TPU-native DEFLATE decoder (jittable, static shapes).

Reinterprets the reference's 28-state decode FSM
(/root/reference/deflate.py:656-1659) in two stages:

  Stage 1 — tokenize, via PARALLEL BOUNDARY-CHASE.  Huffman streams are
  bit-serial: you only know where symbol k+1 starts after decoding symbol
  k.  The reference spends 1+ cycles per symbol on this chain
  (NEXT/D_NEXT, deflate.py:1402-1517).  Here we instead decode a
  *candidate* symbol at EVERY bit position of the block — one vectorized
  sweep of table lookups (the candidate at a non-boundary position is
  garbage, but computing it is free parallelism on the VPU) — giving a
  jump array next[p] = p + symbol_bits(p).  The true symbol boundaries
  are the orbit of the block's start bit under next[], found in
  O(log window) pointer-doubling rounds.  Tokens are then emitted in
  order with a prefix-sum scatter.  EOB positions self-loop, which both
  terminates the chase and marks the block end.  Block headers, stored
  blocks and dynamic-table builds run in a cheap outer per-block loop.

  Symbol decode itself is a single full-table lookup: the reference's
  instant-lookup ``leaves``/``d_leaves`` RAMs + SPREAD replication
  (deflate.py:1204-1400) built to the full 15-bit depth (32768 entries,
  the same RAM size), so the widen-on-miss path (deflate.py:1423-1430)
  does not exist.  Dynamic-tree builds (BL/READBL/REPEAT/HF1..SPREAD) are
  vectorized: canonical assignment by sort + prefix sums, and the spread
  table by bit-reversal + searchsorted over left-aligned code ranges —
  O(1) depth instead of the reference's 3x32768 cycles per dynamic block.

  Stage 2 — expand.  Tokens become output bytes entirely in parallel:
  output offsets by prefix sum, token ownership by searchsorted, and
  back-references (including overlapping dist<len runs, the off1/off2
  special cases at deflate.py:1630-1652) resolved by pointer-doubling to
  each position's literal root in log2(N) rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_deflate.config import DeflateConfig
from tpu_deflate.spec import tables as T
from tpu_deflate.spec.huffman import build_decode_table

TABLE_BITS = 15
TABLE_SIZE = 1 << TABLE_BITS
CL_BITS = 7
MAX_SYMS = 320  # 288 lit/len + 32 dist

# error codes
ERR_OK = 0
ERR_METHOD = 1
ERR_BAD_CODE = 2
ERR_BAD_SYM = 3
ERR_DIST = 4
ERR_OVERFLOW = 5
ERR_STORED = 6
ERR_INPUT = 7

_STATIC_LIT_TABLE = np.asarray(build_decode_table(T.STATIC_LITLEN_LENGTHS, TABLE_BITS))
_STATIC_DIST_TABLE = np.asarray(build_decode_table(T.STATIC_DIST_LENGTHS, TABLE_BITS))


def _revbits15_vec(x: jax.Array) -> jax.Array:
    """Bit-reverse the low 16 bits of each element, vectorized."""
    x = x.astype(jnp.uint32)
    x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
    x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
    x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
    x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
    return x.astype(jnp.int32)


def build_table_jax(lengths: jax.Array, table_bits: int) -> jax.Array:
    """Vectorized canonical-Huffman instant-lookup table build.

    lengths: int32[S] code lengths (0 = absent).  Returns
    int32[2**table_bits] of packed leaves (sym << 4 | nbits), 0 = invalid.
    """
    S = lengths.shape[0]
    sym_idx = jnp.arange(S, dtype=jnp.int32)
    valid = lengths > 0
    # canonical order: by (length, symbol); invalid symbols sort last
    order = jnp.argsort(jnp.where(valid, lengths, 99) * S + sym_idx)
    len_sorted = lengths[order]
    valid_sorted = len_sorted > 0

    # histogram + RFC 1951 next_code recurrence
    ones = valid.astype(jnp.int32)
    bl_count = jnp.zeros((17,), jnp.int32).at[jnp.clip(lengths, 0, 16)].add(ones)

    def nc_step(carry, blc):
        code = (carry + blc) << 1
        return code, code

    _, nc = jax.lax.scan(nc_step, jnp.int32(0), bl_count[:16])
    next_code = jnp.concatenate([jnp.zeros((1,), jnp.int32), nc])  # [17]

    # rank within equal-length run (sorted order groups lengths)
    cum_before = jnp.cumsum(bl_count) - bl_count  # syms with shorter length
    pos_sorted = jnp.arange(S, dtype=jnp.int32)
    rank = pos_sorted - cum_before[jnp.clip(len_sorted, 0, 16)]
    code_sorted = next_code[jnp.clip(len_sorted, 0, 16)] + rank

    # left-aligned (MSB-first) start of each code's cover range
    start_sorted = jnp.where(
        valid_sorted,
        code_sorted << (table_bits - len_sorted),
        jnp.int32(1 << table_bits),
    )

    t = jnp.arange(1 << table_bits, dtype=jnp.int32)
    m = _revbits15_vec(t) >> (16 - table_bits)
    k = jnp.clip(jnp.searchsorted(start_sorted, m, side="right") - 1, 0, S - 1)
    nb = len_sorted[k]
    covered = (
        (nb > 0)
        & (nb <= table_bits)
        & (m - start_sorted[k] < (1 << jnp.clip(table_bits - nb, 0, table_bits)))
    )
    leaf = (order[k] << 4) | nb
    return jnp.where(covered, leaf, 0)


def _peek_bits(data_u32: jax.Array, pos: jax.Array, nbits) -> jax.Array:
    """Peek up to 24 bits at absolute bit position(s) `pos` (elementwise —
    works for scalar or vector pos)."""
    byte0 = pos >> 3
    sh = (pos & 7).astype(jnp.uint32)
    M = data_u32.shape[0]
    i0 = jnp.clip(byte0, 0, M - 1)
    i1 = jnp.clip(byte0 + 1, 0, M - 1)
    i2 = jnp.clip(byte0 + 2, 0, M - 1)
    i3 = jnp.clip(byte0 + 3, 0, M - 1)
    acc = (
        data_u32[i0]
        | (data_u32[i1] << 8)
        | (data_u32[i2] << 16)
        | (data_u32[i3] << 24)
    )
    v = (acc >> sh).astype(jnp.uint32)
    mask = jnp.uint32((1 << nbits) - 1) if isinstance(nbits, int) else (
        (jnp.uint32(1) << nbits.astype(jnp.uint32)) - 1
    )
    return (v & mask).astype(jnp.int32)


# token kinds
TK_LIT = 0
TK_MATCH = 1
TK_STORED = 2

# FSM modes (outer, per-block loop only — there is no per-symbol loop)
M_HEADER = 0
M_CLLEN = 1
M_TABLES = 2
M_TOKENS = 3
M_DONE = 4
M_ERROR = 5


@functools.partial(jax.jit, static_argnames=("tok_cap", "pwin", "stop_at_eob"))
def tokenize(
    data: jax.Array,
    start_bit: jax.Array,
    tok_cap: int,
    end_bit: jax.Array | None = None,
    pwin: int = 1 << 19,
    stop_at_eob: bool = False,
):
    """Stage 1: bitstream -> token arrays.

    data: uint8[M].  pwin: bit positions processed per parallel block pass
    (blocks longer than pwin continue in further passes).  ``end_bit``
    bounds this decode for chunk-parallel lanes; ``stop_at_eob`` makes any
    end-of-block terminate the lane (indexed chunks are one block each, so
    lanes skip the inter-chunk alignment markers entirely).
    Returns (tk, ta, tb, tp, out_total, end_pos, err).
    """
    M = data.shape[0]
    d32 = data.astype(jnp.uint32)
    nbits_total = 8 * M
    if end_bit is None:
        end_bit = jnp.int32(nbits_total)
    else:
        end_bit = jnp.asarray(end_bit, jnp.int32)

    lit_static = jnp.asarray(_STATIC_LIT_TABLE)
    dist_static = jnp.asarray(_STATIC_DIST_TABLE)
    len_base = jnp.asarray(T.LENGTH_BASE)
    len_extra = jnp.asarray(T.LENGTH_EXTRA_BITS)
    dist_base = jnp.asarray(T.DIST_BASE)
    dist_extra = jnp.asarray(T.DIST_EXTRA_BITS)
    cl_order = jnp.asarray(T.CODE_LENGTH_ORDER)

    def peek(pos, nb):
        return _peek_bits(d32, pos, nb)

    state = dict(
        pos=jnp.asarray(start_bit, jnp.int32),
        mode=jnp.int32(M_HEADER),
        bfinal=jnp.int32(0),
        hlit=jnp.int32(0),
        hdist=jnp.int32(0),
        cl_idx=jnp.int32(0),
        lit_tab=lit_static,
        dist_tab=dist_static,
        cl_tab=jnp.zeros((1 << CL_BITS,), jnp.int32),
        lengths=jnp.zeros((MAX_SYMS,), jnp.int32),
        tk=jnp.zeros((tok_cap,), jnp.int32),
        ta=jnp.zeros((tok_cap,), jnp.int32),
        tb=jnp.zeros((tok_cap,), jnp.int32),
        tp=jnp.int32(0),
        out_total=jnp.int32(0),
        err=jnp.int32(ERR_OK),
    )

    # ---------------- block header (stored / static / dynamic) ----------
    def header_fn(s):
        pos = s["pos"]
        bfinal = peek(pos, 1)
        btype = peek(pos + 1, 2)
        pos3 = pos + 3

        def stored(s):
            p = (pos3 + 7) & ~7  # align to byte
            ln = peek(p, 16)
            nln = peek(p + 16, 16)
            ok = ln == (nln ^ 0xFFFF)
            byte_off = (p + 32) >> 3
            tp = s["tp"]
            return dict(
                s,
                pos=p + 32 + 8 * ln,
                tk=s["tk"].at[tp].set(TK_STORED),
                ta=s["ta"].at[tp].set(ln),
                tb=s["tb"].at[tp].set(byte_off),
                tp=tp + 1,
                out_total=s["out_total"] + ln,
                bfinal=bfinal,
                mode=jnp.where(
                    ~ok,
                    jnp.int32(M_ERROR),
                    jnp.where(bfinal == 1, jnp.int32(M_DONE), jnp.int32(M_HEADER)),
                ),
                err=jnp.where(ok, s["err"], jnp.int32(ERR_STORED)),
            )

        def static(s):
            return dict(
                s,
                pos=pos3,
                bfinal=bfinal,
                lit_tab=lit_static,
                dist_tab=dist_static,
                mode=jnp.int32(M_TOKENS),
            )

        def dynamic(s):
            hlit = peek(pos3, 5) + 257
            hdist = peek(pos3 + 5, 5) + 1
            hclen = peek(pos3 + 10, 4) + 4
            p = pos3 + 14
            j = jnp.arange(19, dtype=jnp.int32)
            raw = peek(p + 3 * j, 3)
            raw = jnp.where(j < hclen, raw, 0)
            cl_lengths = jnp.zeros((19,), jnp.int32).at[cl_order].set(raw)
            cl_tab_small = build_table_jax(
                jnp.pad(cl_lengths, (0, MAX_SYMS - 19)), CL_BITS
            )
            return dict(
                s,
                pos=p + 3 * hclen,
                bfinal=bfinal,
                hlit=hlit,
                hdist=hdist,
                cl_idx=jnp.int32(0),
                cl_tab=cl_tab_small,
                lengths=jnp.zeros((MAX_SYMS,), jnp.int32),
                mode=jnp.int32(M_CLLEN),
            )

        def bad(s):
            return dict(s, mode=jnp.int32(M_ERROR), err=jnp.int32(ERR_METHOD))

        return jax.lax.switch(jnp.clip(btype, 0, 3), [stored, static, dynamic, bad], s)

    # -------- code-length symbol decode (dynamic header, <=316 iters) ----
    def cllen_fn(s):
        pos = s["pos"]
        leaf = s["cl_tab"][peek(pos, CL_BITS)]
        nb = leaf & 0xF
        sym = leaf >> 4
        bad = nb == 0
        pos = pos + nb
        ci = s["cl_idx"]
        lengths = s["lengths"]
        prev = lengths[jnp.clip(ci - 1, 0, MAX_SYMS - 1)]

        # sym < 16: one length; 16: repeat prev 3+2bits; 17: 3+3bits zeros;
        # 18: 11+7bits zeros  (reference READBL/REPEAT, deflate.py:1125-1146)
        rep16 = 3 + peek(pos, 2)
        rep17 = 3 + peek(pos, 3)
        rep18 = 11 + peek(pos, 7)
        is16 = sym == 16
        is17 = sym == 17
        is18 = sym == 18
        islit = sym < 16
        adv = jnp.where(is16, 2, jnp.where(is17, 3, jnp.where(is18, 7, 0)))
        count = jnp.where(
            islit, 1, jnp.where(is16, rep16, jnp.where(is17, rep17, rep18))
        )
        value = jnp.where(islit, sym, jnp.where(is16, prev, 0))
        sidx = jnp.arange(MAX_SYMS, dtype=jnp.int32)
        write = (sidx >= ci) & (sidx < ci + count)
        lengths = jnp.where(write, value, lengths)
        ci = ci + count
        done = ci >= s["hlit"] + s["hdist"]

        return dict(
            s,
            pos=pos + adv,
            cl_idx=ci,
            lengths=lengths,
            err=jnp.where(bad, jnp.int32(ERR_BAD_CODE), s["err"]),
            mode=jnp.where(
                bad,
                jnp.int32(M_ERROR),
                jnp.where(done, jnp.int32(M_TABLES), s["mode"]),
            ),
        )

    def tables_fn(s):
        """Build the block's lit/dist instant-lookup tables (once per
        dynamic block)."""
        sidx = jnp.arange(MAX_SYMS, dtype=jnp.int32)
        lengths_ = s["lengths"]
        hlit = s["hlit"]
        lit_lengths = jnp.where(sidx < hlit, lengths_, 0)
        dl = lengths_[jnp.clip(hlit + sidx, 0, MAX_SYMS - 1)]
        dist_lengths = jnp.where(sidx < s["hdist"], dl, 0)
        return dict(
            s,
            lit_tab=build_table_jax(lit_lengths, TABLE_BITS),
            dist_tab=build_table_jax(dist_lengths, TABLE_BITS),
            mode=jnp.int32(M_TOKENS),
        )

    # -------- the parallel boundary-chase over one window ----------------
    def block_pass(s):
        base = s["pos"]
        rel = jnp.arange(pwin, dtype=jnp.int32)
        p_abs = base + rel
        oob = p_abs >= end_bit

        # candidate symbol decode at EVERY bit position (vectorized)
        leaf = s["lit_tab"][peek(p_abs, TABLE_BITS)]
        nb = leaf & 0xF
        sym = leaf >> 4
        is_eob = (sym == 256) & (nb > 0)
        is_match_c = (sym > 256) & (nb > 0)
        is_lit = (sym < 256) & (nb > 0)

        li = jnp.clip(sym - 257, 0, 28)
        bad_sym = is_match_c & (sym - 257 >= 29)
        leb = len_extra[li]
        lext = peek(p_abs + nb, 5) & ((1 << leb) - 1)
        length = len_base[li] + lext
        dpos = p_abs + nb + leb
        dleaf = s["dist_tab"][peek(dpos, TABLE_BITS)]
        dnb = dleaf & 0xF
        dsym = jnp.clip(dleaf >> 4, 0, 29)
        bad_d = is_match_c & ((dnb == 0) | ((dleaf >> 4) >= 30))
        deb = dist_extra[dsym]
        dext = peek(dpos + dnb, 13) & ((1 << deb) - 1)
        dist = dist_base[dsym] + dext

        bad = (nb == 0) | bad_sym | bad_d | oob
        adv = nb + jnp.where(is_match_c, leb + dnb + deb, 0)
        nxt = jnp.where(is_eob | bad, rel, rel + adv)
        nxt = jnp.minimum(nxt, pwin)  # pwin = overflow sentinel

        # pointer-doubling reachability from rel=0 (the block/window start)
        J = jnp.concatenate([nxt, jnp.array([pwin], jnp.int32)])
        r = jnp.zeros((pwin + 1,), jnp.int32).at[0].set(1)
        rounds = max(1, int(np.ceil(np.log2(max(pwin, 2)))) + 1)
        for _ in range(rounds):
            r = jnp.maximum(r, jnp.zeros_like(r).at[J].max(r))
            J = J[J]
        reach = r[:pwin] == 1
        overflowed = r[pwin] == 1

        # ordered token emission by prefix sum over reached positions
        tmask = reach & (is_lit | is_match_c) & ~bad
        ord1 = jnp.cumsum(tmask.astype(jnp.int32))  # 1-based ordinal
        ntok = ord1[-1]
        tp = s["tp"]
        cap_ok = tp + ntok < tok_cap - 1
        slot = jnp.where(tmask & cap_ok, tp + ord1 - 1, jnp.int32(tok_cap - 1))
        tk_val = jnp.where(is_lit, jnp.int32(TK_LIT), jnp.int32(TK_MATCH))
        ta_val = jnp.where(is_lit, sym, length)
        tb_val = jnp.where(is_lit, 0, dist)

        # distance validity: output produced before each token
        produced = jnp.where(tmask, jnp.where(is_lit, 1, length), 0)
        prefix_out = s["out_total"] + jnp.cumsum(produced) - produced
        too_far = jnp.any(tmask & is_match_c & (dist > prefix_out))
        bad_reached = jnp.any(reach & bad)

        eob_hit = jnp.any(reach & is_eob)
        eob_rel = jnp.max(jnp.where(reach & is_eob, rel, -1))
        eob_nb = nb[jnp.clip(eob_rel, 0, pwin - 1)]
        # window continue: the last reached position's successor (>= pwin)
        last_rel = jnp.max(jnp.where(reach, rel, -1))
        cont_pos = base + last_rel + adv[jnp.clip(last_rel, 0, pwin - 1)]

        new_pos = jnp.where(eob_hit, base + eob_rel + eob_nb, cont_pos)
        anybad = bad_reached | too_far | ~cap_ok
        after_eob = (
            jnp.int32(M_DONE)
            if stop_at_eob
            else jnp.where(
                s["bfinal"] == 1, jnp.int32(M_DONE), jnp.int32(M_HEADER)
            )
        )
        mode = jnp.where(
            anybad,
            jnp.int32(M_ERROR),
            jnp.where(eob_hit, after_eob, jnp.int32(M_TOKENS)),
        )
        err = jnp.where(
            anybad,
            jnp.where(
                too_far,
                jnp.int32(ERR_DIST),
                jnp.where(~cap_ok, jnp.int32(ERR_OVERFLOW), jnp.int32(ERR_BAD_CODE)),
            ),
            s["err"],
        )
        return dict(
            s,
            pos=new_pos,
            tk=s["tk"].at[slot].set(jnp.where(tmask, tk_val, s["tk"][slot])),
            ta=s["ta"].at[slot].set(jnp.where(tmask, ta_val, s["ta"][slot])),
            tb=s["tb"].at[slot].set(jnp.where(tmask, tb_val, s["tb"][slot])),
            tp=tp + jnp.where(cap_ok, ntok, 0),
            out_total=s["out_total"] + jnp.where(cap_ok, jnp.sum(produced), 0),
            mode=mode,
            err=err,
        )

    # ---------------- outer per-block loop -------------------------------
    def in_bounds(s):
        return (
            (s["pos"] <= nbits_total)
            & (s["pos"] < end_bit)
            & (s["tp"] < tok_cap - 1)
        )

    def outer_cond(s):
        return (s["mode"] < M_DONE) & in_bounds(s)

    def outer_body(s):
        s = jax.lax.cond(s["mode"] == M_HEADER, header_fn, lambda s: s, s)
        s = jax.lax.while_loop(
            lambda s: (s["mode"] == M_CLLEN) & in_bounds(s), cllen_fn, s
        )
        s = jax.lax.cond(s["mode"] == M_TABLES, tables_fn, lambda s: s, s)
        s = jax.lax.cond(s["mode"] == M_TOKENS, block_pass, lambda s: s, s)
        return s

    s = jax.lax.while_loop(outer_cond, outer_body, state)
    clean_end = (s["mode"] == M_DONE) | (
        (s["err"] == ERR_OK) & (s["pos"] >= end_bit) & (s["mode"] == M_HEADER)
    )
    err = jnp.where(
        clean_end,
        s["err"],
        jnp.where(
            s["err"] != ERR_OK,
            s["err"],
            jnp.where(
                s["tp"] >= tok_cap - 1,
                jnp.int32(ERR_OVERFLOW),
                jnp.int32(ERR_INPUT),
            ),
        ),
    )
    return s["tk"], s["ta"], s["tb"], s["tp"], s["out_total"], s["pos"], err


@functools.partial(jax.jit, static_argnames=("out_cap",))
def expand(data, tk, ta, tb, tp, out_cap: int):
    """Stage 2: token arrays -> output bytes, fully parallel."""
    TOK = tk.shape[0]
    tok_idx = jnp.arange(TOK, dtype=jnp.int32)
    live = tok_idx < tp
    out_len_tok = jnp.where(
        live, jnp.where(tk == TK_LIT, 1, ta), 0
    )  # match & stored produce ta bytes
    out_off = jnp.cumsum(out_len_tok) - out_len_tok  # exclusive

    p = jnp.arange(out_cap, dtype=jnp.int32)
    total = jnp.sum(out_len_tok)
    # token owning each output position
    owner = jnp.clip(jnp.searchsorted(out_off, p, side="right") - 1, 0, TOK - 1)
    j = p - out_off[owner]
    kind = tk[owner]
    a = ta[owner]
    b = tb[owner]
    in_range = p < total

    M = data.shape[0]
    d = data.astype(jnp.int32)
    stored_byte = d[jnp.clip(b + j, 0, M - 1)]
    lit_byte = a

    is_root = in_range & (kind != TK_MATCH)
    val = jnp.where(kind == TK_LIT, lit_byte, stored_byte)
    parent = jnp.where(is_root | ~in_range, p, jnp.clip(p - b, 0, out_cap - 1))
    rounds = max(1, int(np.ceil(np.log2(max(out_cap, 2)))))
    for _ in range(rounds):
        parent = parent[parent]
    out = jnp.where(in_range, val[parent], 0).astype(jnp.uint8)
    return out, total


def _pick_pwin(nbytes: int) -> int:
    """Window (bit positions per parallel pass) covering nbytes of
    compressed data, capped to bound memory."""
    want = 8 * max(nbytes, 64)
    p = 1 << int(np.ceil(np.log2(want)))
    return min(p, 1 << 20)


def inflate_device(
    data: bytes | np.ndarray,
    start_bit: int = 0,
    out_cap: int | None = None,
) -> tuple[np.ndarray, int, int]:
    """Full device inflate.  Returns (output array, output length, end bit).

    Retries with a doubled output buffer on overflow, like a host resizing
    the reference's OBSIZE.
    """
    raw = np.frombuffer(bytes(data), dtype=np.uint8)
    m = len(raw)
    # pad the input to a power-of-two bucket so compiled programs are
    # reused across calls with different stream lengths
    m_pad = max(1 << 12, 1 << int(np.ceil(np.log2(max(m, 2)))))
    arr = jnp.asarray(np.pad(raw, (0, m_pad - m)))
    cap = out_cap or max(1 << 12, 1 << (int(np.ceil(np.log2(max(4 * m, 2))))))
    pwin = _pick_pwin(m_pad)
    while True:
        tok_cap = cap + 16
        tk, ta, tb, tp, out_total, pos, err = tokenize(
            arr, start_bit, tok_cap=tok_cap, pwin=pwin
        )
        err = int(err)
        if err == ERR_OVERFLOW or (err == ERR_OK and int(out_total) > cap):
            cap *= 2
            if cap > 1 << 31:
                raise ValueError("output too large")
            continue
        if err != ERR_OK:
            raise ValueError(f"inflate error code {err}")
        out, total = expand(arr, tk, ta, tb, tp, out_cap=cap)
        return np.asarray(out), int(total), int(pos)


def zlib_decompress_device(data: bytes, config: DeflateConfig = DeflateConfig()) -> bytes:
    """RFC 1950 unwrap + device inflate + Adler-32 verify."""
    from tpu_deflate.ops.checksum import adler32_jax

    if len(data) < 6:
        raise ValueError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8 or (cmf << 8 | flg) % 31 != 0:
        raise ValueError("bad zlib header")
    out, total, end_bit = inflate_device(data, start_bit=16)
    trailer_at = (end_bit + 7) // 8
    expect = int.from_bytes(data[trailer_at : trailer_at + 4], "big")
    got = int(adler32_jax(jnp.asarray(out), total))
    if got != expect:
        raise ValueError(f"Adler-32 mismatch {got:#x} != {expect:#x}")
    return out[:total].tobytes()
