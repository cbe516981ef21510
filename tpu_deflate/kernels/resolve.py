"""Pallas TPU kernel: LZ77 back-reference resolution by pointer doubling.

The expand stage's only irreducibly "random access" step is following each
output byte's parent chain (p -> p - dist) to its literal root — the
parallel generalization of the reference's COPY state and its off1/off2
overlap special cases (/root/reference/deflate.py:1593-1659).  At the XLA
level each doubling round is a full-size gather, which on TPU runs at only
~100M indices/s (measured, v5e) and dominated decode time.

This kernel performs the gather on the MXU instead: for a chunk buffer of
N = R*128 positions held in VMEM as (R, 128), a full-range gather
``x[p]`` decomposes into

    rows  = p >> 7, cols = p & 127
    B     = onehot(rows) @ X          # (tile, R) @ (R, 128) row pick, MXU
    out   = sum(B * onehot(cols), -1) # lane pick, VPU multiply-reduce

Values are carried in float32 (exact for ints < 2^24; parents < N <= 2^17
and byte values <= 255 both qualify).  Rounds run to a fixed log2(N) bound
with an any()-changed early exit, so typical data pays ~log2(max match
nesting depth) rounds.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # indices resolved per inner step
_RS = TILE // 128  # sublane rows per tile


_GRP = 16  # sublane rows (2048 indices) gathered per matmul


def _gather_tiles(src_ref, idx_ref, dst_ref, R: int):
    """dst.flat[i] = src.flat[idx.flat[i]] over a whole (R, 128) chunk.

    All refs are (R, 128) float32 VMEM scratch; idx values integral in
    [0, R*128).  Per group of 16 sublane rows (2048 indices): transpose
    to columns, stack into a (2048, 1) index column, one-hot row pick as
    ONE (2048, R) @ (R, 128) MXU matmul, lane pick by multiply-reduce,
    reassemble and transpose back.  (Mosaic supports 2-D transposes and
    sublane/lane concats; lane-interleaving reshapes are not lowerable.)"""
    G = _GRP * 128
    riota = jax.lax.broadcasted_iota(jnp.int32, (G, R), 1).astype(jnp.float32)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1).astype(jnp.float32)
    # constant one-hots that flatten a (_GRP, 128) tile into a (G, 1)
    # column (i = s*128 + c) and back — themselves MXU matmuls, since
    # Mosaic cannot lower lane-interleaving reshapes/concats directly
    gi = jax.lax.broadcasted_iota(jnp.int32, (G, _GRP), 0) >> 7
    es = (gi == jax.lax.broadcasted_iota(jnp.int32, (G, _GRP), 1)).astype(
        jnp.float32
    )  # (G, _GRP): es[i, s] = (i >> 7 == s)
    ci = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0) & 127
    maskc = (ci == jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)).astype(
        jnp.float32
    )  # (G, 128): maskc[i, c] = (i & 127 == c)

    # TPU f32 matmuls truncate inputs to bf16 at default precision, so any
    # VALUE side of a one-hot matmul is split into exact <=255 byte planes
    src = src_ref[:]
    src_hi = jnp.floor(src * (1.0 / 256.0))
    src_lo = src - src_hi * 256.0

    def bdot(a, b):
        # explicit bf16 operands guarantee the MXU path; operands are
        # one-hots and <=255 byte planes, both bf16-exact
        return jnp.dot(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    def onehot_pick(oh, hi, lo, mask):
        ph = bdot(oh, hi)
        pl_ = bdot(oh, lo)
        return (
            jnp.sum(ph * mask, axis=1, keepdims=True) * 256.0
            + jnp.sum(pl_ * mask, axis=1, keepdims=True)
        )

    def tile_body(t, _):
        tile = idx_ref[pl.ds(t * _GRP, _GRP), :]
        th = jnp.floor(tile * (1.0 / 256.0))
        tl = tile - th * 256.0
        pt = onehot_pick(es, th, tl, maskc)  # (G, 1) flat index column
        rows = jnp.floor(pt * (1.0 / 128.0))
        cols = pt - rows * 128.0
        oh = (rows == riota).astype(jnp.bfloat16)  # (G, R), exact 0/1
        colsm = (cols == ciota).astype(jnp.float32)
        g = onehot_pick(oh, src_hi, src_lo, colsm)  # (G, 1) gathered values
        gh = jnp.floor(g * (1.0 / 256.0))
        gl = g - gh * 256.0
        out_tile = (
            bdot(es.T, gh * maskc) * 256.0 + bdot(es.T, gl * maskc)
        )  # (_GRP, 128)
        dst_ref[pl.ds(t * _GRP, _GRP), :] = out_tile
        return 0

    jax.lax.fori_loop(0, R // _GRP, tile_body, 0)


def _resolve_kernel(
    parent_ref, val_ref, out_ref, par_ref, conv_ref, pa, pb, rounds: int, R: int
):
    """One chunk: parent/val (1, R, 128) int32 -> (root values, final
    parents, converged flag).  Fixed-trip fori — a data-dependent while
    cond stalls the Mosaic pipeline ~100x (measured) — so chains deeper
    than 2^rounds are finished by the caller's XLA fallback using the
    parents output."""
    pa[:] = parent_ref[0].astype(jnp.float32)

    def round_body(_, carry):
        _gather_tiles(pa, pa, pb, R)
        pa[:] = pb[:]
        return carry

    jax.lax.fori_loop(0, rounds, round_body, 0)
    # one more round doubles as the convergence check
    _gather_tiles(pa, pa, pb, R)
    conv_ref[0] = jnp.broadcast_to(
        jnp.all(pb[:] == pa[:]).astype(jnp.int32), (8, 128)
    )
    par_ref[0] = pb[:].astype(jnp.int32)

    # final value pick: out = val[root] (pa takes values, pb holds roots;
    # per-tile read-before-write makes idx_ref == dst_ref safe)
    pa[:] = val_ref[0].astype(jnp.float32)
    _gather_tiles(pa, pb, pb, R)
    out_ref[0] = pb[:].astype(jnp.int32)


def _resolve_xla(parent, val):
    """XLA fallback (CPU tests / non-TPU backends): early-exit doubling.
    Works on int32[..., N] (indices into the last axis)."""
    def cond(c):
        _, changed = c
        return changed

    def body(c):
        p, _ = c
        nxt = jnp.take_along_axis(p, p, axis=-1)
        return nxt, jnp.any(nxt != p)

    p, _ = jax.lax.while_loop(cond, body, (parent, jnp.bool_(True)))
    return jnp.take_along_axis(val, p, axis=-1)


def resolve_roots(parent: jax.Array, val: jax.Array) -> jax.Array:
    """Resolve each position's value through its parent chain.

    parent/val: int32[..., N] (N a multiple of 512, N <= 2^16 so byte-plane
    splits stay bf16-exact; parent indices in [0, N)).  Leading dims are chunk lanes.
    Returns int32 values at each position's chain root."""
    N = parent.shape[-1]
    on_tpu = jax.devices()[0].platform == "tpu"
    if os.environ.get("TPU_DEFLATE_NO_PALLAS_RESOLVE"):
        return _resolve_xla(parent, val)
    if (not on_tpu) or N % TILE != 0 or N < TILE or N > (1 << 16):
        return _resolve_xla(parent, val)

    R = N // 128
    # 8 fixed rounds cover chain depths <= 2^8 — beyond typical
    # match-nesting once constant-distance runs are collapsed; deeper
    # (adversarial) chains fall through to the XLA finisher below
    rounds = min(8, max(1, int(np.ceil(np.log2(N)))))
    kern = functools.partial(_resolve_kernel, rounds=rounds, R=R)

    lead = parent.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    p3 = parent.reshape(B, R, 128)
    v3 = val.reshape(B, R, 128)
    spec = pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    rootval, par, conv = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        ),
        in_specs=[spec, spec],
        out_specs=(
            spec,
            spec,
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
        ],
    )(p3, v3)

    rootval = rootval.reshape(B, N)
    out = jax.lax.cond(
        jnp.all(conv[:, 0, 0] == 1),
        lambda _: rootval,
        lambda _: jax.vmap(_resolve_xla)(par.reshape(B, N), val.reshape(B, N)),
        None,
    )
    return out.reshape(*lead, N) if lead else out.reshape(N)
