"""Pallas TPU kernel: gather-native token expansion, v3.

Supersedes kernels/expand2.py for match distances <= 256 (the win256
own-container configs — both static and dynamic trees).  v2 walked
2048-byte tiles sequentially, spending ~150 small ops per tile on
one-hot-matmul scatter/fill/pick machinery (~27 us/tile, 4096 tiles per
8 MiB).  v3 exploits Mosaic's ``tpu.dynamic_gather`` (jnp.take_along_axis
along lanes) to process a WHOLE chunk per grid step with no tiling:

  1. OWNERSHIP IS A MERGE, NOT A SCATTER.  Positions are dense integers,
     token output offsets are sorted, and every token emits >= 1 byte, so
     the token row owning position-row i's first byte is a prefix COUNT:
     tr[i] = #{token rows j: off[128j] <= 128i} - 1, computed by summing
     staircase one-hot matmuls — and the owner of each position then
     falls in token rows {tr, tr+1} (a 128-position row advances <= 128
     tokens).  This replaces paint + cummax fill entirely.

  2. Each position row pulls its 256-token candidate window with SEVEN
     (R, KR)@(KR, 256) one-hot byte-plane matmuls (off 17 bits -> 3
     planes, packed kind|ta|dist 28 bits -> 4), then finds its owner by
     a 7-round BINARY SEARCH over the sorted window — each round ONE
     lane-gather (take_along_axis axis=1).

  3. LZ77 resolution: parents collapse analytically across the whole
     MAXIMAL same-distance token run (q = rb - d + (p - (rb - d)) mod d
     with rb the run's first output offset, found by one token-level
     cummax — the run-wide generalization of the reference's off1/off2
     overlap shortcuts, deflate.py:1630-1652).  Every in-run byte then
     points DIRECTLY at the d pre-run source bytes, so resolution depth
     is the match NESTING depth, independent of run length (the
     per-token collapse this replaces crept long runs at DCLAMP bytes
     per round — measured 14.5 of 19.5 ms at the bench shape).  The
     plane packs delta<<16 | (d-1)<<8 | value (delta 0 = resolved):
     near parents (delta <= DCLAMP) resolve via 6 static sublane shifts
     + lane-gathers with composition capped at DCLAMP; far parents
     resolve via a row-one-hot MXU pull at ANY distance when the row's
     far lanes source from one <= 3-row region, with an arithmetic
     on-chain downgrade (delta -> largest multiple of d <= DCLAMP,
     valid because init deltas are multiples of d) as the guaranteed-
     progress fallback for mixed rows.

Element-equal to the XLA formulation (ops/decode._expand_fields +
kernels/resolve.py); parity-tested in interpret mode.  Reference
behavior anchor: the COPY datapath, /root/reference/deflate.py:1593-1659.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

MAXD = 256  # largest match distance this kernel accepts
# static sublane shifts per resolve round; the composition clamp is
# 128*ROWBACK so the shift window always covers a clamped delta
ROWBACK = int(_os.environ.get("TPU_DEFLATE_EXP3_ROWBACK", "5"))
DCLAMP = 128 * ROWBACK


def _bdot(a, b):
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _gather_lanes(x, idx):
    """out[i, j] = x[i, idx[i, j]] — tpu.dynamic_gather along lanes."""
    return jnp.take_along_axis(x, idx, axis=1)


def _imod(a, d):
    """a mod d for int32 0 <= a < 2^18, 1 <= d < 2^18 (f32 div + fixup)."""
    k = jnp.floor(a.astype(jnp.float32) / d.astype(jnp.float32)).astype(
        jnp.int32
    )
    r = a - k * d
    # correctly-rounded f32 division can overshoot floor by one at near-
    # integer quotients; one fixup each way restores exactness
    r = jnp.where(r < 0, r + d, r)
    r = jnp.where(r >= d, r - d, r)
    return r


def _exp3_kernel(
    tp_ref, tot_ref,  # SMEM int32[B]
    fo_ref,  # (1, 8, KRL) int32 — first offset per token row (lane-major,
    #          padded to 8 sublanes for Mosaic's block divisibility rule)
    off_ref, fpk_ref, rb_ref,  # (1, KR, 128) int32 token planes
    out_ref,  # (1, R, 128) int32
    *, R: int, KR: int, KRL: int, interp: bool, fixed_bodies: int = 0,
    sched: str = "dyadic",
):
    total = tot_ref[pl.program_id(0)]
    fo8 = fo_ref[0]  # (8, KRL), all sublanes equal

    ri = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    p = ri * 128 + li

    # ---- 1. token row per position row: staircase count ----------------
    cnt = jnp.zeros((R, 128), jnp.float32)
    ones128 = jnp.ones((128, 128), jnp.bfloat16)
    i128 = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
    for c in range(KRL // 128):
        # whole-tile slice then sublane 0: keeps the layout tile-aligned
        # (a lane slice of a (1, KRL) vector trips a Mosaic relayout bug)
        foc = fo8[:, c * 128:(c + 1) * 128][0:1]
        oh = (foc <= i128).astype(jnp.bfloat16)  # counts per chunk <= 128
        cnt = cnt + _bdot(oh, ones128)
    tr = cnt.astype(jnp.int32) - 1  # (R, 128), lanes equal, >= 0

    # ---- 2. candidate token windows: rows tr, tr+1 ---------------------
    off_t = off_ref[0]
    fpk_t = fpk_ref[0]
    rb_t = rb_ref[0]
    zrow = jnp.zeros((1, 128), jnp.int32)
    off2 = jnp.concatenate(
        [off_t, jnp.concatenate([off_t[1:], zrow + (R * 128)], 0)], axis=1
    )  # (KR, 256): lanes 0-127 row j, 128-255 row j+1
    fpk2 = jnp.concatenate(
        [fpk_t, jnp.concatenate([fpk_t[1:], zrow], 0)], axis=1
    )
    rb2 = jnp.concatenate(
        [rb_t, jnp.concatenate([rb_t[1:], zrow], 0)], axis=1
    )
    ki = jax.lax.broadcasted_iota(jnp.int32, (R, KR), 1)
    ohw = (ki == tr[:, 0:1]).astype(jnp.bfloat16)  # (R, KR)

    def gather_rows(planes, nb):
        acc = None
        for k in range(nb):
            g = _bdot(ohw, ((planes >> (8 * k)) & 0xFF))
            term = g.astype(jnp.int32) << (8 * k)
            acc = term if acc is None else acc + term
        return acc  # (R, 256) int32

    W_off = gather_rows(off2, 3)
    W_fpk = gather_rows(fpk2, 4)
    W_rb = gather_rows(rb2, 3)
    WA = W_off[:, :128]
    WB = W_off[:, 128:]

    # ---- 3. owner per position: binary search (7 lane-gathers/piece) ---
    def count_le(w):
        c = jnp.zeros((R, 128), jnp.int32)
        for k in (64, 32, 16, 8, 4, 2, 1):
            t = jnp.clip(c + k - 1, 0, 127)
            g = _gather_lanes(w, t)
            c = jnp.where(g <= p, c + k, c)
        # the 7 rounds sum to 127, so a full window (all 128 entries
        # <= p) is undercounted by one; sorted w makes the test free
        return jnp.where(w[:, 127:128] <= p, 128, c)

    cntA = count_le(WA)
    cntB = count_le(WB)
    owner_rel = cntA + cntB - 1  # in [0, 255]

    selB = owner_rel >= 128
    oA = jnp.clip(owner_rel, 0, 127)
    oB = jnp.clip(owner_rel - 128, 0, 127)

    def pick2(w):
        return jnp.where(
            selB, _gather_lanes(w[:, 128:], oB), _gather_lanes(w[:, :128], oA)
        )

    fv = pick2(W_fpk)
    rbp = pick2(W_rb)

    kind = (fv >> 26) & 3
    ta = (fv >> 17) & 0x1FF
    dist = fv & 0x1FFFF

    # ---- 4. init plane: delta<<16 | (d-1)<<8 | value (delta 0 = done) --
    # run-extended collapse: q = first chain element BEFORE the whole
    # same-distance run (rb = run's first output offset), so in-run
    # deltas point straight at the d pre-run source bytes
    in_range = p < total
    is_m = in_range & (kind == 1)
    d = jnp.clip(dist, 1, MAXD)
    src0 = rbp - d
    a = jnp.maximum(p - src0, 0)
    q = src0 + _imod(a, d)
    q = jnp.clip(q, 0, jnp.maximum(p - 1, 0))
    D0 = p - q  # multiple of d, up to the run length
    P = jnp.where(
        is_m, (D0 << 16) | ((d - 1) << 8), jnp.where(in_range, ta & 0xFF, 0)
    )

    # ---- 5. resolve rounds ---------------------------------------------
    def rnd(P):
        """Near ladder: lanes with delta <= DCLAMP gather their parent's
        packed word (6 static sublane shifts + lane-gathers); a resolved
        parent's value is adopted (on-chain => equal value), an
        unresolved one composes, capped at DCLAMP so reach never grows
        past the shift window."""
        Dp = P >> 16
        act = (Dp > 0) & (Dp <= DCLAMP)
        qq = p - jnp.where(act, Dp, 0)
        qrb = ri - (qq >> 7)  # rows back, 0..ROWBACK
        ql = qq & 127
        acc = jnp.zeros((R, 128), jnp.int32)
        sh = P
        for k in range(ROWBACK + 1):
            if k:
                sh = jnp.concatenate([jnp.zeros((k, 128), jnp.int32),
                                      P[: R - k]], axis=0)
            g = _gather_lanes(sh, ql)
            acc = jnp.where(qrb == k, g, acc)
        Dq = acc >> 16
        nD = Dp + Dq
        res = jnp.where(
            Dq == 0,
            acc & 0xFF,
            jnp.where(nD <= DCLAMP, (nD << 16) | (acc & 0xFF00), P),
        )
        return jnp.where(act, res, P)

    def far_pull(P):
        """Row-one-hot long-range pull at ANY distance: when a row's far
        lanes (or, if none, all unresolved lanes) source from one
        <= 3-row region — every interior row of a constant-distance run —
        adopt resolved parent VALUES via 3 MXU gathers.  With the
        run-extended collapse this resolves a whole run one nesting level
        after its pre-run bytes, independent of run length."""
        Dp = P >> 16
        unres = Dp > 0
        far = Dp > DCLAMP
        # int32 select: a (R,1)-broadcast where() over bool vectors trips
        # Mosaic ("unsupported target bitwidth for truncation", i8->i1)
        far_i = far.astype(jnp.int32)
        farrow = jnp.max(far_i, axis=1, keepdims=True)
        mask = (far_i * farrow + unres.astype(jnp.int32) * (1 - farrow)) > 0
        qq = p - Dp
        big = jnp.int32(1 << 20)
        qmn = jnp.min(jnp.where(mask, qq, big), axis=1, keepdims=True)
        qmx = jnp.max(jnp.where(mask, qq, -1), axis=1, keepdims=True)
        r0 = jnp.clip(qmn, 0, (R - 1) * 128) >> 7
        uniform = (qmn >= 0) & (qmx - qmn <= 255)
        # one bf16-exact plane: resolved value + 1 in [1, 256], 0 = not
        vp = jnp.where(Dp == 0, (P & 0xFF) + 1, 0).astype(jnp.bfloat16)
        z1 = jnp.zeros((1, 128), jnp.bfloat16)
        vps = (vp,
               jnp.concatenate([vp[1:], z1], 0),
               jnp.concatenate([vp[2:], z1, z1], 0))
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) == r0
        ).astype(jnp.bfloat16)
        rj = (qq >> 7) - r0
        ql = qq & 127
        got = jnp.zeros((R, 128), jnp.int32)
        for j in range(3):
            w = jnp.dot(oh, vps[j], preferred_element_type=jnp.float32)
            g = _gather_lanes(w.astype(jnp.int32), ql)
            got = jnp.where(rj == j, g, got)
        ok = mask & uniform & (rj >= 0) & (rj <= 2) & (got > 0)
        return jnp.where(ok, got - 1, P)

    def downgrade(P):
        """Guaranteed-progress fallback for far lanes far_pull cannot
        serve (mixed rows spanning two runs): drop the delta to the
        largest multiple of the lane's own d that fits the near ladder.
        Valid because far deltas are un-composed init values, which are
        multiples of d, and every multiple of d below them stays on the
        equal-value chain."""
        Dp = P >> 16
        far = Dp > DCLAMP
        d = ((P >> 8) & 0xFF) + 1
        nD = DCLAMP - _imod(jnp.full((R, 128), DCLAMP, jnp.int32), d)
        return jnp.where(far, (nD << 16) | (P & 0xFF00), P)

    if sched == "dyadic":
        # ---- dyadic transfer-map resolve: deterministic log depth ------
        # Representation: P = value (< 256) OR (w'+1) << 16, where w' is
        # the target's offset into the 768-byte window [row_base - 640,
        # row_base + 128) — in-row targets have w' >= 640.  After the
        # leaf phase all pointers are strictly before their own row
        # (w' < 640), re-read RELATIVE TO THE CURRENT LEVEL'S BLOCK BASE:
        # at level k a pointer of p means position base_k(p) - 640 + w'.
        # Composing the upper half of each 2^(k+1)-row block:
        #   * target inside the lower half  -> gather its state; values
        #     adopt; pointers adopt VERBATIM (the lower half's base IS
        #     the combined base);
        #   * target before the lower half (k < 3 only) -> arithmetic
        #     rebase w' += 128*2^k (no gather).
        # Every position composes exactly once per level -> log2(R)
        # levels total, no data-dependent loop, no while/any syncs.
        # dyadic needs deltas <= 640 (5-row window), independent of the
        # wave path's configurable DCLAMP
        Dp0 = P >> 16
        dd = ((P >> 8) & 0xFF) + 1
        nD = 640 - _imod(jnp.full((R, 128), 640, jnp.int32), dd)
        P = jnp.where(Dp0 > 640, (nD << 16) | (P & 0xFF00), P)
        Dp = P >> 16
        # convert delta-packing to window-packing (row window is 640+128)
        wprime = 640 - Dp + (p & 127)
        P = jnp.where(Dp > 0, (wprime + 1) << 16, P & 0xFF)

        def leaf_round(P):
            ptr = P >> 16
            inrow = ptr > 640  # w' >= 640  <=>  w'+1 > 640
            ql = jnp.clip(ptr - 641, 0, 127)
            g = _gather_lanes(P, ql)
            return jnp.where(inrow, g, P)

        for _ in range(7):  # in-row chains <= 128 links
            P = leaf_round(P)

        nlev = int(np.log2(R))
        for k in range(nlev):
            bs = 1 << k
            half_bytes = bs * 128
            ptr = P >> 16
            is_ptr = ptr > 0
            wp = ptr - 1
            uh = ((ri >> k) & 1) == 1
            # stripe planes: W_j[r] = P[base_k_row(r) - 5 + j], built as
            # a static (5-j)-row down-shift + block-local row-0 broadcast
            j = jnp.clip(wp >> 7, 0, 4)
            ql = wp & 127
            got = jnp.zeros((R, 128), jnp.int32)
            for jj in range(5):
                sh = 5 - jj
                Ssh = jnp.concatenate(
                    [jnp.zeros((sh, 128), jnp.int32), P[: R - sh]], axis=0
                )
                if bs > 1:
                    Wb = Ssh.reshape(R // bs, bs, 128)[:, 0:1, :]
                    Wj = jnp.broadcast_to(Wb, (R // bs, bs, 128)).reshape(
                        R, 128
                    )
                else:
                    Wj = Ssh
                g = _gather_lanes(Wj, ql)
                got = jnp.where(j == jj, g, got)
            in_lower = wp >= (640 - half_bytes)  # q >= base_{k+1}
            rebased = ((wp + half_bytes + 1) << 16)
            newP = jnp.where(in_lower, got, rebased)
            P = jnp.where(uh & is_ptr, newP, P)

        out_ref[0] = jnp.where(in_range, P & 0xFF, 0)
        return

    P = rnd(rnd(P))

    if fixed_bodies:  # debug: fixed schedule, report unresolved count
        for i in range(fixed_bodies):
            if i % 4 == 0:
                P = far_pull(P)
            P = rnd(rnd(P))
            if i == 5:
                P = downgrade(P)
        out_ref[0] = jnp.where(
            in_range, jnp.where(P >= (1 << 16), -1, P & 0xFF), 0
        )
        return

    def cond(c):
        Pc, r = c
        return jnp.any(Pc >= (1 << 16)) & (r < jnp.int32(R * 128))

    def body(c):
        Pc, r = c
        # far_pull every 4th body: with the run-extended collapse it
        # resolves a WHOLE run one nesting level after its pre-run
        # bytes, so a handful of firings suffice; text rows never
        # qualify and shouldn't pay for it every body
        Pc = jax.lax.cond(r % 8 == 2, far_pull, lambda x: x, Pc)
        Pc = rnd(rnd(Pc))
        # by r == 12 every typical run has resolved via far_pull; any
        # far lane still alive sits in a mixed row — convert it to the
        # additive near ladder so the loop provably terminates
        Pc = jax.lax.cond(r == 12, downgrade, lambda x: x, Pc)
        return Pc, r + 2

    P, _ = jax.lax.while_loop(cond, body, (P, jnp.int32(2)))

    out_ref[0] = jnp.where(in_range, P & 0xFF, 0)


@functools.partial(jax.jit, static_argnames=("out_cap", "interpret"))
def expand_fused3(
    off: jax.Array,  # int32[B, K] per-token exclusive output offsets
    c1: jax.Array,  # int32[B, K] kind<<9 | ta  (kind 0 lit, 1 match)
    tb: jax.Array,  # int32[B, K] match distance (0 for literals)
    tp: jax.Array,  # int32[B]
    total: jax.Array,  # int32[B]
    out_cap: int,
    interpret: bool = False,
):
    """Gather-native paint-free expansion.  Returns int32[B, out_cap].

    Requires every match distance <= 256 (callers route larger
    distances to expand_fused2 / the XLA path)."""
    B, K = off.shape
    assert out_cap % 128 == 0
    R = out_cap // 128
    KR = -(-(K + 1) // 128) + 1  # +1 row so the tr+1 window never overruns
    pad = KR * 128 - K
    live = jnp.arange(K, dtype=jnp.int32) < tp[:, None]
    kind = jnp.clip(c1 >> 9, 0, 3)
    # maximal same-distance run base per token (one cummax, no gather):
    # a match token continues its predecessor's run when the predecessor
    # is a match with the same distance; boundaries carry their own off
    ism = live & (kind == 1)
    prev_ism = jnp.pad(ism[:, :-1], ((0, 0), (1, 0)))
    prev_tb = jnp.pad(tb[:, :-1], ((0, 0), (1, 0)))
    cont = ism & prev_ism & (tb == prev_tb)
    cand = jnp.where(ism & ~cont, off, -1)
    rb = jax.lax.cummax(cand, axis=1)
    rb = jnp.where(ism, rb, 0)

    off = jnp.where(live, off, out_cap)
    off = jnp.pad(off, ((0, 0), (0, pad)), constant_values=out_cap)
    fpk = (kind << 26) | ((c1 & 0x1FF) << 17) | (tb & 0x1FFFF)
    fpk = jnp.pad(jnp.where(live, fpk, 0), ((0, 0), (0, pad)))
    rb = jnp.pad(rb, ((0, 0), (0, pad)))

    off3 = off.reshape(B, KR, 128)
    fpk3 = fpk.reshape(B, KR, 128)
    rb3 = rb.reshape(B, KR, 128)
    KRL = -(-KR // 128) * 128
    fo = jnp.pad(off3[:, :, 0], ((0, 0), (0, KRL - KR)),
                 constant_values=out_cap)
    fo = jnp.broadcast_to(fo[:, None, :], (B, 8, KRL))

    import os as _os

    sched = _os.environ.get("TPU_DEFLATE_EXP3_SCHED", "dyadic")
    if sched == "dyadic" and (R & (R - 1)):
        sched = "wave"  # dyadic needs a power-of-two row count
    kern = functools.partial(
        _exp3_kernel, R=R, KR=KR, KRL=KRL, interp=interpret,
        fixed_bodies=int(_os.environ.get("TPU_DEFLATE_EXP3_FIXED", "0")),
        sched=sched,
    )
    vspec = pl.BlockSpec((1, KR, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, KRL), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec,
            vspec,
            vspec,
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tp.astype(jnp.int32), total.astype(jnp.int32), fo, off3, fpk3, rb3)
    return out.reshape(B, out_cap)
