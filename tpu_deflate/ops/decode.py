"""TPU-native DEFLATE decoder (jittable, static shapes).

Two stages, reinterpreting the reference's 28-state decode FSM
(/root/reference/deflate.py:656-1659):

  Stage 1 — tokenize.  A compiled 3-phase state machine (HEADER / CLLEN /
  TOKENS) walks the bitstream one Huffman symbol per iteration and emits a
  token list: literal byte, (length, distance) pair, or stored-block byte
  range.  Symbol decode is a single full-table lookup — the reference's
  instant-lookup ``leaves``/``d_leaves`` RAMs + SPREAD replication
  (deflate.py:1204-1400) built out to the full 15-bit depth (32768 entries,
  the same RAM size), so there is no widen-on-miss path (deflate.py:1423-
  1430 "CACHE MISS") at all.  Dynamic-tree table builds (BL/READBL/REPEAT/
  HF1..SPREAD) are vectorized: canonical code assignment by sort + prefix
  sums, and the spread table by bit-reversal + searchsorted over left-
  aligned code ranges — O(1) depth instead of the reference's 3x32768
  cycles per dynamic block.

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

    # histogram + RFC next_code
    ones = valid.astype(jnp.int32)
    bl_count = jnp.zeros((17,), jnp.int32).at[jnp.clip(lengths, 0, 16)].add(ones)
    # next_code[l] = (next_code[l-1] + bl_count[l-1]) << 1, next_code[0]=0
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
    """Peek up to 24 bits at absolute bit position `pos` from byte array
    packed as uint32 per byte."""
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

# FSM modes
M_HEADER = 0
M_CLLEN = 1
M_TOKENS = 2
M_DONE = 3
M_ERROR = 4


@functools.partial(jax.jit, static_argnames=("tok_cap",))
def tokenize(data: jax.Array, start_bit: jax.Array, tok_cap: int):
    """Stage 1: bitstream -> token arrays.

    data: uint8[M].  Returns dict of token arrays + end position + error.
    """
    M = data.shape[0]
    d32 = data.astype(jnp.uint32)
    nbits_total = 8 * M

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
            s = dict(
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
            return s

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
            hclen = peek(pos3 + 14 - 4, 4) + 4  # bits at pos3+10
            p = pos3 + 14
            # read hclen 3-bit lengths in CODE_LENGTH_ORDER
            j = jnp.arange(19, dtype=jnp.int32)
            raw = jax.vmap(lambda k: peek(p + 3 * k, 3))(j)
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

        total = s["hlit"] + s["hdist"]
        done = ci >= total

        def finish(s):
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

        s = dict(
            s,
            pos=pos + adv,
            cl_idx=ci,
            lengths=lengths,
            err=jnp.where(bad, jnp.int32(ERR_BAD_CODE), s["err"]),
            mode=jnp.where(bad, jnp.int32(M_ERROR), s["mode"]),
        )
        return jax.lax.cond(done & ~bad, finish, lambda s: s, s)

    def tokens_fn(s):
        pos = s["pos"]
        leaf = s["lit_tab"][peek(pos, TABLE_BITS)]
        nb = leaf & 0xF
        sym = leaf >> 4
        bad = nb == 0
        pos = pos + nb

        def lit(s):
            tp = s["tp"]
            return dict(
                s,
                pos=pos,
                tk=s["tk"].at[tp].set(TK_LIT),
                ta=s["ta"].at[tp].set(sym),
                tp=tp + 1,
                out_total=s["out_total"] + 1,
            )

        def eob(s):
            return dict(
                s,
                pos=pos,
                mode=jnp.where(
                    s["bfinal"] == 1, jnp.int32(M_DONE), jnp.int32(M_HEADER)
                ),
            )

        def match(s):
            li = jnp.clip(sym - 257, 0, 28)
            bad_sym = sym - 257 >= 29
            leb = len_extra[li]
            length = len_base[li] + peek(pos, leb)
            p2 = pos + leb
            dleaf = s["dist_tab"][peek(p2, TABLE_BITS)]
            dnb = dleaf & 0xF
            dsym = jnp.clip(dleaf >> 4, 0, 29)
            bad_d = (dnb == 0) | ((dleaf >> 4) >= 30)
            p3 = p2 + dnb
            deb = dist_extra[dsym]
            dist = dist_base[dsym] + peek(p3, deb)
            p4 = p3 + deb
            too_far = dist > s["out_total"]
            tp = s["tp"]
            anybad = bad_sym | bad_d | too_far
            return dict(
                s,
                pos=p4,
                tk=s["tk"].at[tp].set(TK_MATCH),
                ta=s["ta"].at[tp].set(length),
                tb=s["tb"].at[tp].set(dist),
                tp=tp + 1,
                out_total=s["out_total"] + length,
                mode=jnp.where(anybad, jnp.int32(M_ERROR), s["mode"]),
                err=jnp.where(
                    anybad,
                    jnp.where(too_far, jnp.int32(ERR_DIST), jnp.int32(ERR_BAD_SYM)),
                    s["err"],
                ),
            )

        branch = jnp.where(sym < 256, 0, jnp.where(sym == 256, 1, 2))
        s = jax.lax.switch(branch, [lit, eob, match], s)
        return dict(
            s,
            err=jnp.where(bad, jnp.int32(ERR_BAD_CODE), s["err"]),
            mode=jnp.where(bad, jnp.int32(M_ERROR), s["mode"]),
        )

    def cond(s):
        return (
            (s["mode"] < M_DONE)
            & (s["pos"] <= nbits_total)
            & (s["tp"] < tok_cap - 1)
        )

    def body(s):
        return jax.lax.switch(
            jnp.clip(s["mode"], 0, 2), [header_fn, cllen_fn, tokens_fn], s
        )

    s = jax.lax.while_loop(cond, body, state)
    err = jnp.where(
        s["mode"] == M_DONE,
        s["err"],
        jnp.where(
            s["err"] != ERR_OK,
            s["err"],
            jnp.where(s["tp"] >= tok_cap - 1, jnp.int32(ERR_OVERFLOW), jnp.int32(ERR_INPUT)),
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
    while True:
        tok_cap = cap + 16
        tk, ta, tb, tp, out_total, pos, err = tokenize(
            arr, start_bit, tok_cap=tok_cap
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
