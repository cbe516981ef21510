"""Pallas TPU kernel: single-lane hierarchical boundary chase.

The foreign-stream decoder (ops/foreign.py) walks a zlib stream one
DEFLATE block at a time on device; each block needs ONE chase over its
bit window.  The batched K2 kernels scan tiles sequentially and
parallelize across 128 lanes — with a single lane that wall-clock does
not amortize (t64 sequential steps ~1.6 ms/pass).  Here the cross-tile
transfer maps compose up a BINARY HIERARCHY instead, with stride-2^k
``pltpu.roll`` pairings so no strided lane slicing is needed:

  up:    M_{k+1}[j] = M_k[j + 2^k] o M_k[j]   (valid at j % 2^{k+1} == 0)
         — one packed select against the rolled level per round;
         levels are stored packed (16 rows/level) for the descent
  down:  ent[j + 2^k] = M_k[j](ent[j])        (select + roll + mask)

log2(T) rounds each of ~45 vector ops replace T sequential steps — the
same trick ops/decode.chase_reach uses in XLA, but resident in VMEM with
zero dispatch overhead.  Two entry points:

  ent_from_phi      per-tile entry phases from K1d's packed transfer
                    maps (position-ordered, as _pack4(..., perm=True)
                    emits them) — feeds K3d for the token window.
  visited_from_adv  full chase for the dynamic-header code-length
                    region: builds one-step maps from (adv, term)
                    in-kernel, composes, descends, then marks every
                    visited bit position with a 64-step walk.

Reference behavior: the per-symbol NEXT walk of
/root/reference/deflate.py:1402-1445 and the READBL/REPEAT header walk
(deflate.py:1125-1146), re-expressed as log-depth map composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_deflate.kernels.tokenize import STOP, TILE, _pack4, _sel_packed


def _roll_rows(rows, amt):
    """Roll each (T,) packed row right by amt lanes (value j -> j+amt);
    negative amounts rotate left (reduced mod the row length)."""
    T = rows[0].shape[-1]
    return [pltpu.roll(r.reshape(1, -1), amt % T, 1)[0] for r in rows]


def _compose_descend(phi, p0, T: int, levels: int, hist_scr):
    """Shared hierarchy: per-tile maps -> per-tile entry phases.

    phi: (64, T) int32 entry->next-tile-phase maps (row = entry phase),
    values [0, 48) or STOP.  Returns ent (1, T) int32 in [0, 64) or -1.
    """
    cur = phi  # unpacked current level; history stored packed for descent
    for k in range(levels):
        pk = [_pack4(cur, g) for g in range(16)]
        for g in range(16):
            hist_scr[16 * k + g, :] = pk[g]
        right = _roll_rows(pk, -(1 << k))  # neighbor's map at column j
        cur = _sel_packed(right, cur)  # comp[e] = right[cur[e]]; STOP kept

    # down: entry per tile
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    ent = jnp.where(col == 0, p0, -1)
    for k in range(levels - 1, -1, -1):
        rows_k = [hist_scr[16 * k + g, :] for g in range(16)]
        er = _sel_packed(rows_k, ent)
        er = pltpu.roll(er, 1 << k, 1)
        mask = (col & ((1 << (k + 1)) - 1)) == (1 << k)
        ent = jnp.where(mask, er, ent)
        ent = jnp.where((ent > 63) | (ent < 0), -1, ent)
    return ent


def _ent_kernel(p0_ref, phi_ref, ent_ref, hist_scr, *, T: int, levels: int):
    # unpack K1d's packed maps (4 entries/int32, position-ordered)
    rows = []
    for e in range(TILE):
        r = phi_ref[0, e >> 2, :]
        rows.append(((r >> ((e & 3) << 3)) & 0xFF).reshape(1, T))
    phi = jnp.concatenate(rows, axis=0)
    ent = _compose_descend(phi, p0_ref[0], T, levels, hist_scr)
    ent_ref[0, 0, :] = ent[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ent_from_phi(phiP: jax.Array, p0: jax.Array, interpret: bool = False):
    """phiP: int32[1, 16, T] packed transfer maps (T a power of two);
    p0: int32[] start phase in tile 0 (the window is re-based per block,
    so the first symbol is always within the first 8 bits).  Returns
    ent int32[1, 1, T]."""
    _, _, T = phiP.shape
    levels = T.bit_length() - 1
    assert 1 << levels == T, "T must be a power of two"
    return pl.pallas_call(
        functools.partial(_ent_kernel, T=T, levels=levels),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((1, 1, T), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16 * levels, T), jnp.int32)],
        # at T=8192 the packed level history (13 x 16 rows) + unpacked
        # maps exceed the 16 MB scoped-VMEM default; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(p0.reshape(1).astype(jnp.int32), phiP)


def _visit_kernel(p0_ref, adv_ref, term_ref, vis_ref, hist_scr,
                  *, T: int, levels: int):
    e = jax.lax.broadcasted_iota(jnp.int32, (TILE, T), 0)
    adv = adv_ref[...]
    term = term_ref[...] != 0
    m0 = jnp.where(term, 255, e + adv)
    m = m0
    for _ in range(6):  # generic: adv >= 1, chains <= 64 links
        m = _sel_packed([_pack4(m, g) for g in range(16)], m)
    phi = jnp.where(m >= 128, STOP, m - TILE)
    ent = _compose_descend(phi, p0_ref[0], T, levels, hist_scr)

    m0p = [_pack4(m0, g) for g in range(16)]
    cur = ent
    vis = jnp.zeros((TILE, T), jnp.int32)
    for _ in range(TILE):
        inb = (cur >= 0) & (cur < TILE)
        vis = vis | (inb & (e == cur)).astype(jnp.int32)
        nxt = _sel_packed(m0p, jnp.clip(cur, 0, TILE - 1))
        cur = jnp.where(inb, nxt, cur)
    vis_ref[...] = vis


@functools.partial(jax.jit, static_argnames=("interpret",))
def visited_from_adv(advT: jax.Array, termT: jax.Array, p0: jax.Array,
                     interpret: bool = False):
    """advT/termT: int32[64, T] per-position jump lengths / terminators in
    the (row = in-tile position, column = tile) layout; T a power of two.
    Returns visited int32[64, T] (1 where the orbit of position p0 lands),
    element-equal to ops/decode.chase_reach on the flattened layout."""
    _, T = advT.shape
    levels = T.bit_length() - 1
    assert 1 << levels == T
    return pl.pallas_call(
        functools.partial(_visit_kernel, T=T, levels=levels),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((TILE, T), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16 * levels, T), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(p0.reshape(1).astype(jnp.int32), advT, termT)
