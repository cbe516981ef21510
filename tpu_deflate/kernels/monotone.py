"""Pallas TPU kernel: monotone multi-channel scatter-add.

DEFLATE's data movement is dominated by scatters whose target indices are
NONDECREASING: bit-pack byte offsets (the reference's serial put() path,
/root/reference/deflate.py:535-567), token-compaction ranks, and output
painting offsets.  XLA lowers these as general scatters (~60-100M
indices/s on v5e, measured) — but monotonicity means a fixed slab of the
input stream touches a BOUNDED output window, so each slab can be applied
as one-hot matmuls on the MXU and accumulated with a read-modify-write of
that window.  The grid walks input slabs sequentially (TPU grids execute
in order on a core), so overlapping windows of neighboring slabs
accumulate correctly.

    out[c, j] = sum_{e : idx[e] == j} val[c, e]

Per slab of 2048 entries with window base W0 (row-aligned):
    rel    = idx - W0                      (flattened to a (2048,1) column
                                            by constant one-hot matmuls)
    OH_rT  = (rel >> 7 == r)               (WROWS, 2048) row one-hot
    OH_l   = (rel & 127 == l)              (2048, 128)   lane one-hot
    paint  = OH_rT @ (OH_l * val_column)   one MXU matmul per byte plane
    out[rows W0/128 ..] += paint

Requirements: idx nondecreasing over live entries (dead entries may carry
any idx >= size with val 0 — they fall outside every window and drop
out); idx[e + SLAB] - idx[e] <= 8192 for all e (bit-pack emissions
advance <= 4 bytes each, so a 2048-slab spans <= 8192 bytes); values fit
16 bits per channel (byte-plane split keeps the MXU bf16-exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 2048
SLAB_ROWS = SLAB // 128
WINDOW = 8192 + 128
WROWS = WINDOW // 128


def _kernel(olo_ref, idx_ref, val_ref, out_ref, C: int, nrows_out: int,
            wrows: int):
    """Transpose-free slab paint: both one-hots are built lane-major from
    each 128-entry sublane row (sublane-iota compares) and contracted
    src-on-lanes via dot_general A@B^T — no (2048,1) column flattening.
    The earlier form transposed idx/val columns through one-hot matmuls
    streaming 2048 rows per slab, which cost as much as the paint."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    row0 = jnp.clip(olo_ref[b, t], 0, nrows_out - wrows)
    rel = idx_ref[0, pl.ds(t * SLAB_ROWS, SLAB_ROWS), :] - row0 * 128

    wiota = jax.lax.broadcasted_iota(jnp.int32, (wrows, 128), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    dotT = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    accs = [jnp.zeros((wrows, 128), jnp.float32) for _ in range(2 * C)]
    for er in range(SLAB_ROWS):
        r = rel[er : er + 1]  # (1, 128) lane-major
        ok = (r >= 0) & (r < wrows * 128)
        ohr = (((r >> 7) == wiota) & ok).astype(jnp.bfloat16)
        m1 = (si == (r & 127)).astype(jnp.bfloat16)  # (128dst, 128src)
        for c in range(C):
            v = val_ref[0, c, pl.ds(t * SLAB_ROWS + er, 1), :]
            vl = (v & 0xFF).astype(jnp.bfloat16)
            vh = ((v >> 8) & 0xFF).astype(jnp.bfloat16)
            accs[2 * c] = accs[2 * c] + dotT(ohr * vl, m1)
            accs[2 * c + 1] = accs[2 * c + 1] + dotT(ohr * vh, m1)
    for c in range(C):
        paint = accs[2 * c].astype(jnp.int32) + (
            accs[2 * c + 1].astype(jnp.int32) << 8
        )
        cur = out_ref[0, c, pl.ds(row0, wrows), :]
        out_ref[0, c, pl.ds(row0, wrows), :] = cur + paint


def mono_scatter_add_xla(idx, vals, size):
    """XLA fallback: plain scatter-add per channel.

    idx: int32[..., K]; vals: int32[..., C, K].  Returns int32[..., C, size].
    """
    tgt = jnp.clip(idx, 0, size - 1)
    drop = (idx < 0) | (idx >= size)
    v = jnp.where(drop[..., None, :], 0, vals)
    zero = jnp.zeros(vals.shape[:-1] + (size,), jnp.int32)
    if idx.ndim == 1:
        return zero.at[..., tgt].add(v)
    # batched: vmap over leading dims
    f = mono_scatter_add_xla
    for _ in range(idx.ndim - 1):
        f = jax.vmap(f, in_axes=(0, 0, None))
    return f(idx, vals, size)


def mono_scatter_add(idx: jax.Array, vals: jax.Array, size: int,
                     emax_bits: int = 32) -> jax.Array:
    """Monotone scatter-add: out[..., c, j] = sum over idx[...]==j of vals.

    idx: int32[B, K] nondecreasing (K % 2048 == 0); vals: int32[B, C, K]
    with per-channel values < 2^16; size: output length (padded
    internally to rows of 128 plus window slack).  emax_bits bounds the
    per-entry index advance (idx[e+1]-idx[e] <= emax_bits/8 bytes), which
    sizes each slab's output window.  Returns int32[B, C, size].
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    B, K = idx.shape
    C = vals.shape[1]
    wrows = -(-(-(-(SLAB * emax_bits // 8) // 128) + 2) // 8) * 8
    # VMEM budget: per-lane blocks are idx (4K) + vals (4CK) + out (4C*size)
    vmem_bytes = 4 * K * (1 + C) + 4 * C * (-(-size // 128) + wrows) * 128
    if (not on_tpu) or K % SLAB != 0 or vmem_bytes > (12 << 20):
        return mono_scatter_add_xla(idx, vals, size)

    T = K // SLAB
    nrows = -(-size // 128) + wrows
    olo = jnp.clip(idx[:, ::SLAB] >> 7, 0, nrows - wrows)  # (B, T)
    idx3 = idx.reshape(B, K // 128, 128)
    val4 = vals.reshape(B, C, K // 128, 128)
    kern = functools.partial(_kernel, C=C, nrows_out=nrows, wrows=wrows)
    out = pl.pallas_call(
        kern,
        grid=(B, T),
        out_shape=jax.ShapeDtypeStruct((B, C, nrows, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # olo (B, T), read-only
            pl.BlockSpec(
                (1, K // 128, 128), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, C, K // 128, 128),
                lambda b, t: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, C, nrows, 128), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )(olo, idx3, val4)
    return out.reshape(B, C, nrows * 128)[:, :, :size]


# ---------------------------------------------------------------------------
# Single-lane monotone compaction (vmap-safe: grid has no batch axis)
# ---------------------------------------------------------------------------

CSLAB = 2048
CSLAB_ROWS = CSLAB // 128
CWIN_ROWS = CSLAB_ROWS + 1  # slots advance <= 1 per entry -> tight window


def _compact_kernel(idx_ref, val_ref, out_ref, C: int, nrows_out: int,
                    size: int):
    """One input slab -> window-bounded one-hot paint of C channels.

    Targets are nondecreasing and advance <= CSLAB per slab, so each slab
    touches <= CWIN_ROWS output rows.  The window base comes from an
    in-kernel min reduce (dead idx >= size never win), so there is no SMEM
    operand and the kernel is vmap-safe.  Grid is (T,) sequential.  A slab
    whose entries are ALL dead (idx >= size) is skipped outright: its
    window base clips to nrows_out - CWIN_ROWS, i.e. >= ceil(size/128)
    rows, so every paint it could make lands at an out index >= size and
    is discarded by mono_compact's final [:size] trim — the skip is
    behavior-preserving for ANY dead values, not just zeros.  In the
    boundary-chase tokenizer the tail of the position window beyond the
    stream end is all-dead, and under vmap each skipped slab saves a full
    (CSLAB, 128) one-hot build + 4 MXU passes per lane."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        out_ref[:, :, :] = jnp.zeros_like(out_ref)

    tile_i = idx_ref[pl.ds(t * CSLAB_ROWS, CSLAB_ROWS), :]
    has_live = jnp.min(tile_i) < size

    @pl.when(has_live)
    def _paint():
        G = CSLAB
        gi = jax.lax.broadcasted_iota(jnp.int32, (G, CSLAB_ROWS), 0) >> 7
        es = (gi == jax.lax.broadcasted_iota(
            jnp.int32, (G, CSLAB_ROWS), 1)).astype(jnp.float32)
        ci = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 0) & 127
        maskc = (ci == jax.lax.broadcasted_iota(
            jnp.int32, (G, 128), 1)).astype(jnp.float32)

        def bdot(a, b_):
            return jnp.dot(
                a.astype(jnp.bfloat16),
                b_.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

        def flatten(tile):
            hi = jnp.floor(tile * (1.0 / 256.0))
            lo = tile - hi * 256.0
            return (
                jnp.sum(bdot(es, hi) * maskc, axis=1, keepdims=True) * 256.0
                + jnp.sum(bdot(es, lo) * maskc, axis=1, keepdims=True)
            )

        WIN = CWIN_ROWS * 128
        row0 = jnp.clip(jnp.min(tile_i) >> 7, 0, nrows_out - CWIN_ROWS)
        base = (row0 * 128).astype(jnp.float32)
        rel = flatten(
            jnp.clip(tile_i.astype(jnp.float32) - base, 0.0, float(WIN)))
        rrow = jnp.floor(rel * (1.0 / 128.0))
        rlane = rel - rrow * 128.0
        wiota = jax.lax.broadcasted_iota(
            jnp.int32, (CWIN_ROWS, G), 0).astype(jnp.float32)
        oh_rT = (rrow.T == wiota).astype(jnp.float32)  # (CWIN_ROWS, G)
        liota = jax.lax.broadcasted_iota(
            jnp.int32, (G, 128), 1).astype(jnp.float32)
        inw = (rel >= 0.0) & (rel < float(WIN))
        oh_l = (rlane == liota).astype(jnp.float32) * inw.astype(jnp.float32)

        for c in range(C):
            vcol = flatten(
                val_ref[c, pl.ds(t * CSLAB_ROWS, CSLAB_ROWS), :].astype(
                    jnp.float32))
            vh = jnp.floor(vcol * (1.0 / 256.0))
            vl = vcol - vh * 256.0
            paint = bdot(oh_rT, oh_l * vh) * 256.0 + bdot(oh_rT, oh_l * vl)
            cur = out_ref[c, pl.ds(row0, CWIN_ROWS), :]
            out_ref[c, pl.ds(row0, CWIN_ROWS), :] = cur + paint.astype(
                jnp.int32)


def mono_compact(idx: jax.Array, vals: jax.Array, size: int,
                 interpret: bool | None = None) -> jax.Array:
    """Single-lane monotone scatter-add (compaction): out[c, idx[e]] += v.

    idx: int32[K] nondecreasing over live entries, advancing <= 1 per
    entry (compaction ranks); dead entries carry idx >= size and drop out.
    vals: int32[C, K], channel values < 2^16.  Returns int32[C, size].
    Safe under jax.vmap (the kernel grid carries no batch axis).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K = idx.shape[0]
    C = vals.shape[0]
    Kp = -(-K // CSLAB) * CSLAB
    if Kp != K:
        idx = jnp.pad(idx, (0, Kp - K), constant_values=size)
        vals = jnp.pad(vals, ((0, 0), (0, Kp - K)))
    T = Kp // CSLAB
    nrows = -(-size // 128) + CWIN_ROWS
    idx3 = idx.reshape(Kp // 128, 128)
    val3 = vals.reshape(C, Kp // 128, 128)
    kern = functools.partial(_compact_kernel, C=C, nrows_out=nrows, size=size)
    out = pl.pallas_call(
        kern,
        grid=(T,),
        out_shape=jax.ShapeDtypeStruct((C, nrows, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx3, val3)
    return out.reshape(C, nrows * 128)[:, :size]
