"""Device-paced foreign-stream inflate: one DEFLATE block per loop step.

The reference's actual serving workload is an arbitrary zlib stream it
did not produce (/root/reference/deflate.py:656-732): multi-block, mixed
stored/static/dynamic, back-references crossing block boundaries.  Block
boundaries are only discoverable by decoding, so the outer walk is
inherently sequential — the goal is to make each step cheap and keep the
WHOLE walk on device (one ``lax.while_loop``, zero host round-trips):

  per block:  scalar header peeks
              -> [dynamic only] code-length mini-chase: XLA candidate
                 decode + the single-lane Pallas chase
                 (kernels/chase1.visited_from_adv) + RLE prefix tail
              -> canonical params + packed table (ops/decode)
              -> the fused tokenizer trio over a window re-based at the
                 first symbol's byte (K1d + hierarchical chase + K3d,
                 kernels/tokenize_dyn.py with hier=True)
              -> append the pass's dense token slab at the running token
                 cursor with ONE dynamic_update_slice

Tokens accumulate in a packed buffer sized 8m/3 + slab (a literal costs
>= 3 bits under the kernel's MIN_LIT_LEN gate, so overflow is impossible
for any stream the fast path accepts); expansion runs once at the end.
Streams the kernels cannot serve (literal codes < 3 bits, blocks longer
than the 2^18-bit window) set a FALLBACK flag and the caller reruns the
XLA pipeline (ops/decode.inflate_device's original path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_deflate.ops import decode as D
from tpu_deflate.spec import tables as T

PW = 1 << 19  # bit window per block pass: zlib buffers <= 16384 symbols
# per block, so match-heavy blocks reach ~16K x 28 bits ~ 4.6e5 bits; a
# 2^18 window spuriously fell back on real zlib -6 streams
WINB = PW // 8 + 16
CLW = 8192  # code-length chase window for the Pallas path (T=128 tiles)

# loop modes
RUNNING = 0
DONE = 1
FAILED = 2
FALLBACK = 3


def _pallas_reach(interpret: bool):
    from tpu_deflate.kernels.chase1 import visited_from_adv

    def reach(adv_f, term_f):
        Tt = CLW // 64
        advT = adv_f.reshape(Tt, 64).T
        termT = term_f.reshape(Tt, 64).T.astype(jnp.int32)
        vis = visited_from_adv(
            advT, termT, jnp.int32(0), interpret=interpret
        )
        return vis.T.reshape(-1) != 0

    return reach


@functools.partial(
    jax.jit, static_argnames=("tok_cap", "interpret")
)
def _foreign_loop(
    data_ext: jax.Array,  # uint8[m_pad + WINB + 1200]
    start_bit: jax.Array,
    end_bit: jax.Array,
    tok_cap: int,
    interpret: bool = False,
):
    from tpu_deflate.kernels.tokenize_dyn import (
        ERR_INPUT,
        MIN_LIT_LEN_FOREIGN,
        tokenize_dyn_batch,
    )

    d32 = data_ext.astype(jnp.uint32)
    cl_order = jnp.asarray(T.CODE_LENGTH_ORDER)
    s_lit_lengths = jnp.asarray(T.STATIC_LITLEN_LENGTHS)
    s_dist_lengths = jnp.asarray(T.STATIC_DIST_LENGTHS)
    reach = _pallas_reach(interpret)
    ident = lambda sym, xp=np: sym

    def peek(pos, nb):
        return D._peek_bits(d32, pos, nb)

    state = dict(
        pos=jnp.asarray(start_bit, jnp.int32),
        mode=jnp.int32(RUNNING),
        bfinal=jnp.int32(0),
        tp=jnp.int32(0),
        out_total=jnp.int32(0),
        err=jnp.int32(0),
        tk=jnp.zeros((tok_cap,), jnp.int32),
        ta=jnp.zeros((tok_cap,), jnp.int32),
        tb=jnp.zeros((tok_cap,), jnp.int32),
        it=jnp.int32(0),
        dbg=jnp.int32(-1),
    )

    def stored_fn(s):
        pos = s["pos"]
        bfinal = peek(pos, 1)
        p = (pos + 3 + 7) & ~7
        ln = peek(p, 16)
        nln = peek(p + 16, 16)
        ok = ln == (nln ^ 0xFFFF)
        byte_off = (p + 32) >> 3
        tp = s["tp"]
        return dict(
            s,
            pos=p + 32 + 8 * ln,
            tk=jax.lax.dynamic_update_slice(
                s["tk"], jnp.full((1,), D.TK_STORED, jnp.int32), (tp,)
            ),
            ta=jax.lax.dynamic_update_slice(
                s["ta"], ln[None], (tp,)
            ),
            tb=jax.lax.dynamic_update_slice(
                s["tb"], byte_off[None], (tp,)
            ),
            tp=tp + 1,
            out_total=s["out_total"] + ln,
            bfinal=bfinal,
            mode=jnp.where(
                ~ok,
                jnp.int32(FAILED),
                jnp.where(bfinal == 1, jnp.int32(DONE), jnp.int32(RUNNING)),
            ),
            err=jnp.where(ok, s["err"], jnp.int32(D.ERR_STORED)),
        )

    def huff_fn(s):
        pos = s["pos"]
        bfinal = peek(pos, 1)
        btype = peek(pos + 1, 2)
        is_static = btype == 1

        def parse_dyn(_):
            hlit = peek(pos + 3, 5) + 257
            hdist = peek(pos + 8, 5) + 1
            hclen = peek(pos + 13, 4) + 4
            j = jnp.arange(19, dtype=jnp.int32)
            raw = jnp.where(j < hclen, peek(pos + 17 + 3 * j, 3), 0)
            cl_lengths = jnp.zeros((19,), jnp.int32).at[cl_order].set(raw)
            clim, crd, cmeta, cover = D._canon_params_jax(
                cl_lengths, 19, ident
            )
            cl_pos = pos + 17 + 3 * hclen
            lengths, end_next, cl_ok = D._decode_cl_lengths(
                data_ext, cl_pos, hlit + hdist, clim, crd, cmeta,
                win=CLW, reach_fn=reach,
            )
            sidx = jnp.arange(D.MAX_SYMS, dtype=jnp.int32)
            dyn_lit = jnp.where(sidx < hlit, lengths, 0)[:288]
            dl = lengths[jnp.clip(hlit + jnp.arange(32), 0, D.MAX_SYMS - 1)]
            dyn_dist = jnp.where(jnp.arange(32) < hdist, dl, 0)
            return dyn_lit, dyn_dist, cl_pos + end_next, cl_ok & ~cover

        def parse_static(_):
            return (
                s_lit_lengths, s_dist_lengths, pos + 3, jnp.asarray(True)
            )

        lit_l, dist_l, start_abs, hdr_ok = jax.lax.cond(
            is_static, parse_static, parse_dyn, None
        )
        tab, min_len, trees_ok = D.pack_block_tab(
            lit_l, dist_l, start_abs & 7, out_base=s["out_total"]
        )
        hdr_ok = hdr_ok & trees_ok

        base2 = start_abs >> 3
        win = jax.lax.dynamic_slice(data_ext, (base2,), (WINB,))[None]
        end_rel = end_bit - 8 * base2
        small = end_rel <= PW - 64
        end_k = jnp.minimum(end_rel, PW)
        tok, ntok, outp, endp, kerr = tokenize_dyn_batch(
            win, end_k[None], tab[None], (start_abs & 7)[None], pw=PW,
            interpret=interpret, hier=True, tier=2,
        )
        kerr = kerr[0]
        # blocks the kernels cannot serve -> XLA fallback: sub-3-bit
        # literal codes, blocks running past the 2^18-bit window, or more
        # tokens than one pass slab (huge non-zlib blocks)
        fallback = (min_len < MIN_LIT_LEN_FOREIGN) | (
            (kerr == ERR_INPUT) & ~small
        ) | (kerr == D.ERR_OVERFLOW)
        ok = hdr_ok & (kerr == 0) & ~fallback

        tp = s["tp"]
        # UNCONDITIONAL in-place append: tokens past tp are dead (the
        # cursor only advances on ok, and on !ok the loop exits), so the
        # slab always lands and the carry buffer is never copied — a
        # where(ok, tk2, tk) here forced XLA to materialize a second
        # 12 MB token buffer every iteration (~4 ms/block, the entire
        # old per-block cost).
        tk2 = jax.lax.dynamic_update_slice(s["tk"], tok[0], (tp,))
        new_pos = 8 * base2 + endp[0]
        after = jnp.where(
            bfinal == 1, jnp.int32(DONE), jnp.int32(RUNNING)
        )
        mode = jnp.where(
            fallback,
            jnp.int32(FALLBACK),
            jnp.where(ok, after, jnp.int32(FAILED)),
        )
        err = jnp.where(
            ok | fallback,
            s["err"],
            jnp.where(~hdr_ok, jnp.int32(D.ERR_BAD_CODE), kerr),
        )
        return dict(
            s,
            dbg=jnp.where(
                fallback,
                (min_len << 16) | (kerr << 8) | jnp.where(small, 1, 0),
                s["dbg"],
            ),
            pos=jnp.where(ok, new_pos, s["pos"]),
            tk=tk2,
            tp=jnp.where(ok, tp + ntok[0], tp),
            out_total=jnp.where(ok, s["out_total"] + outp[0], s["out_total"]),
            bfinal=bfinal,
            mode=mode,
            err=err,
        )

    def bad_fn(s):
        return dict(s, mode=jnp.int32(FAILED), err=jnp.int32(D.ERR_METHOD))

    def body(s):
        btype = peek(s["pos"] + 1, 2)
        s = jax.lax.switch(
            jnp.clip(btype, 0, 3),
            [stored_fn, huff_fn, huff_fn, bad_fn],
            s,
        )
        return dict(s, it=s["it"] + 1)

    max_it = jnp.maximum((end_bit - start_bit) // 32 + 8, 8)

    def cond(s):
        return (
            (s["mode"] == RUNNING)
            & (s["pos"] < end_bit)
            & (s["it"] < max_it)
            & (s["tp"] < tok_cap - (PW // 8 + 8192))
        )

    s = jax.lax.while_loop(cond, body, state)
    # running out of input without BFINAL is a truncated stream
    mode = jnp.where(
        s["mode"] == RUNNING, jnp.int32(FAILED), s["mode"]
    )
    err = jnp.where(
        (s["mode"] == RUNNING) & (s["err"] == 0),
        jnp.int32(D.ERR_INPUT),
        s["err"],
    )
    return (
        mode, err, s["tk"], s["ta"], s["tb"], s["tp"], s["out_total"],
        s["pos"], s["dbg"], s["it"],
    )


SEG = 1 << 19  # output bytes per expansion segment
WIN = 1 << 15  # RFC window carried between segments
SEGTOK = SEG + WIN + 1024  # tokens per segment (each emits >= 1 byte)


@functools.partial(jax.jit, static_argnames=("nseg_cap", "interpret"))
def _expand_segments(
    data_ext, tk, ta, tb, tp, out_total, nseg_cap: int,
    interpret: bool = False,
):
    """Segmented single-stream expansion, fully on device.

    Tokens are ordered with known output offsets and back-references
    reach <= 32 KB, so the stream expands in ~SEG-byte SEGMENTS OF WHOLE
    TOKENS: segment k holds tokens [searchsorted(off, k*SEG),
    searchsorted(off, (k+1)*SEG)) — its output starts at a ragged base
    base_k in [k*SEG, k*SEG + 258) and a boundary-crossing match belongs
    wholly to the segment where it starts.  Each segment expands with the
    previous 32 KB of ALREADY-WRITTEN output prepended as LITERAL tokens
    (the expand kernels consume literals natively; a stored-token window
    would force their XLA fallback), and writes a fixed-size slab whose
    tail garbage is exactly covered by the next segment's slab.  One
    lax.fori carries everything on device — the out-of-VMEM answer to
    the reference's OBSIZE=32768 full-window requirement
    (/root/reference/README.md:20-22).
    """
    from tpu_deflate.ops.decode import TK_LIT, expand_batch

    TOK = tk.shape[0]
    live = jnp.arange(TOK, dtype=jnp.int32) < tp
    out_len = jnp.where(live, jnp.where(tk == TK_LIT, 1, ta), 0)
    off = jnp.cumsum(out_len) - out_len
    off = jnp.where(live, off, jnp.int32(1 << 30))  # keep sorted past tp

    # max emission past a segment boundary: one STORED token reaches
    # 65535 bytes (matches only 258) — slab and cap must cover it
    SLAB = SEG + 65536 + 512
    cap = -(-(WIN + SLAB) // 2048) * 2048  # expand kernels' OTILE multiple
    out = jnp.zeros((nseg_cap * SEG + SLAB + 2048,), jnp.uint8)
    tkp = jnp.pad(tk, (0, SEGTOK))
    tap = jnp.pad(ta, (0, SEGTOK))
    tbp = jnp.pad(tb, (0, SEGTOK))
    offp = jnp.pad(off, (0, SEGTOK), constant_values=1 << 30)

    def body(k, out):
        lo = jnp.clip(jnp.searchsorted(off, k * SEG, side="left"), 0, tp)
        hi = jnp.clip(
            jnp.searchsorted(off, (k + 1) * SEG, side="left"), 0, tp
        )
        n_k = hi - lo
        base = jax.lax.dynamic_slice(offp, (lo,), (1,))[0]
        base = jnp.where(n_k > 0, base, k * SEG)
        tkk = jax.lax.dynamic_slice(tkp, (lo,), (SEGTOK,))
        tak = jax.lax.dynamic_slice(tap, (lo,), (SEGTOK,))
        tbk = jax.lax.dynamic_slice(tbp, (lo,), (SEGTOK,))
        # previous WIN output bytes as literal tokens (content unused for
        # k == 0: distances never precede the stream start)
        wstart = jnp.maximum(base - WIN, 0)
        win = jax.lax.dynamic_slice(out, (wstart,), (WIN,)).astype(jnp.int32)
        tk2 = jnp.concatenate([jnp.zeros((WIN,), jnp.int32), tkk])
        ta2 = jnp.concatenate([win, tak])
        tb2 = jnp.concatenate([jnp.zeros((WIN,), jnp.int32), tbk])
        out_k, _tot = expand_batch(
            data_ext, tk2[None], ta2[None], tb2[None],
            (WIN + n_k)[None], out_cap=cap,
        )
        slab = jax.lax.dynamic_slice(out_k[0], (WIN,), (SLAB,))
        # tail garbage beyond this segment's emission lies inside the
        # next segment's slab and is overwritten by it
        return jax.lax.dynamic_update_slice(out, slab, (base,))

    nseg = jnp.clip((out_total + SEG - 1) // SEG, 0, nseg_cap)
    out = jax.lax.fori_loop(0, nseg, body, out)
    return out


def inflate_foreign_device(
    data: bytes | np.ndarray, start_bit: int = 0, interpret: bool = False
):
    """Device-paced foreign inflate.  Returns (out, total, end_bit) like
    inflate_device, or None when the stream needs the XLA fallback path
    (sub-3-bit literal codes or oversized blocks)."""
    from tpu_deflate.ref.inflate import DeflateError

    raw = np.frombuffer(bytes(data), dtype=np.uint8)
    m = len(raw)
    m_pad = max(1 << 12, 1 << int(np.ceil(np.log2(max(m, 2)))))
    arr = jnp.asarray(np.pad(raw, (0, m_pad - m + WINB + 1200)))
    # literal >= 3 bits under the fast path => ntok <= bits/3; two pass
    # slabs of slack so the loop's early-stop guard can never fire on a
    # valid stream
    tok_cap = (8 * m_pad) // 3 + 2 * (PW // 8 + 8192) + 16384
    tok_cap = -(-tok_cap // 1024) * 1024
    mode, err, tk, ta, tb, tp, out_total, pos, dbg, it = _foreign_loop(
        arr, jnp.int32(start_bit), jnp.int32(8 * m), tok_cap=tok_cap,
        interpret=interpret,
    )
    # ONE host round-trip for all control scalars (each np conversion
    # costs a full ~27 ms tunnel sync)
    mode, err_h, tp_h, total, pos_h, dbg_h, it_h = (
        int(x) for x in np.asarray(
            jnp.stack([mode, err, tp, out_total, pos, dbg, it])
        )
    )
    if mode == FALLBACK:
        import os as _os
        if _os.environ.get("TPU_DEFLATE_FOREIGN_DEBUG"):
            print(f"foreign fallback: it={it_h} pos={pos_h} "
                  f"min_len={dbg_h >> 16} kerr={(dbg_h >> 8) & 0xFF} "
                  f"small={dbg_h & 1}")
        return None
    if mode != DONE:
        raise DeflateError(
            f"corrupt stream: {D.ERR_NAMES.get(err_h, f'error code {err_h}')}"
        )
    # unpack the mixed token buffer (packed kernel tokens + TK_STORED
    # markers; a packed value is never exactly TK_STORED=2)
    is_stored = tk == D.TK_STORED
    tkv = jnp.where(is_stored, D.TK_STORED, (tk >> 26) & 3)
    tav = jnp.where(is_stored, ta, (tk >> 17) & 0x1FF)
    tbv = jnp.where(is_stored, tb, tk & 0x1FFFF)
    if total <= SEG + 256:
        cap = max(1 << 12, 1 << int(np.ceil(np.log2(max(total, 2)))))
        out, _tot2 = D.expand(arr, tkv, tav, tbv, tp, out_cap=cap)
    else:
        nseg_cap = max(1, 1 << int(np.ceil(np.log2(-(-total // SEG)))))
        out = _expand_segments(
            arr, tkv, tav, tbv, tp, out_total, nseg_cap=nseg_cap,
            interpret=interpret,
        )
    return np.asarray(out), total, pos_h
