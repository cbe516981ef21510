"""Pallas TPU kernel: distance-bitplane LZ77 matcher (stages 1+2 fused).

In-kernel version of ops/encode._match_extend_bitplane — the
reinterpretation of the reference's FAST matcher (32 combinational
3-byte comparators + priority encoder + SEARCHF/SEARCH10 extension,
/root/reference/deflate.py:407-421,899-994).  The XLA formulation costs
~4 dispatched ops per distance (~20-40us each at these batch shapes, so
the 256-distance sweep is dispatch-bound); here the sweep is a fully
UNROLLED ladder of static-amount ``pltpu.roll`` compares, so the whole
sweep is ONE kernel launch and each distance is a handful of vector
instructions over register/VMEM-resident rows.

Layout: the block is split into 128 contiguous segments (one per sublane
row), each prefixed with the previous segment's last ``window`` bytes and
suffixed with the next segment's first ``max_match`` bytes (the haloed
lane-major layout of kernels/match.py) — every distance shift becomes an
in-row rotate, every extension step a static in-row slice.

Per 32-distance channel, byte-equality planes pack into one uint32
bitplane; then, exactly as the XLA version:
  * 3-byte seeds = plane & shift1(plane) & shift2(plane)
  * nearest distance = least-set-bit, channels ascending
  * extension walks the chosen distance's bit with a variable shift
Outputs are element-equal to _match_extend_bitplane (the caller applies
the same n/idx masks and the final n-clip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _match2_kernel_hybrid(n_ref, ext_ref, dl_ref, *, window: int,
                          max_match: int, seg: int):
    """Two-level sweep: ONE dynamic-amount roll per 32-distance channel
    (base = ext rotated by 32c), then 32 STATIC sub-rolls (amounts 1..32)
    of the base — static small shifts are the cheap VPU form the
    fully-unrolled kernel proved out, while the per-distance roll amounts
    never exceed 32 (the full unroll's rolls reach `window` lanes and its
    composed program hangs at execution — suspected instruction-memory
    pressure).  Channel loop unrolled in Python (8 channels at win256);
    an scf.for version fails Mosaic legalization.  Requires
    window % 32 == 0."""
    b = pl.program_id(0)
    n = n_ref[b]
    halo = window
    rhalo = max_match
    E = -(-(seg + rhalo) // 128) * 128
    L = -(-(halo + E) // 128) * 128
    ext = ext_ref[0]
    key = ext[:, halo : halo + E]
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, seg), 0) * seg
        + jax.lax.broadcasted_iota(jnp.int32, (LANES, seg), 1)
    )
    posok = pos + 3 <= n
    nch = window // 32
    best_d = jnp.zeros((LANES, seg), jnp.int32)
    found = jnp.zeros((LANES, seg), bool)
    length = jnp.zeros((LANES, seg), jnp.int32)
    for c in range(nch):
        # independent static base roll per channel (no serial chain —
        # a cumulative base = roll(base, 32) dependency cost ~1.3 ms at
        # the bench shape)
        base = pltpu.roll(ext, 32 * c, 1) if c else ext
        chc = jnp.zeros((LANES, E), jnp.uint32)
        for t in range(32):  # static sub-rolls: d = 32c + t + 1
            rolled = pltpu.roll(base, t + 1, 1)[:, halo : halo + E]
            eqb = (key == rolled).astype(jnp.uint32)
            chc = chc | (eqb << t)
        mc = chc[:, :seg] & chc[:, 1 : seg + 1] & chc[:, 2 : seg + 2]
        lsb = mc & (~mc + jnp.uint32(1))
        k = (31 - jax.lax.clz(lsb)).astype(jnp.int32)
        has_c = mc != 0
        new = ~found & has_c
        d_c = 32 * c + k + 1
        best_d = jnp.where(new, d_c, best_d)
        found = found | has_c
        bit = jnp.where(new, k, 0).astype(jnp.uint32)
        alive = new & posok & (d_c <= pos)
        len_c = jnp.zeros((LANES, seg), jnp.int32)
        for kk in range(3, max_match):
            alive = alive & (((chc[:, kk : seg + kk] >> bit) & 1) == 1)
            len_c = len_c + alive.astype(jnp.int32)
        length = length + len_c
    has = found & posok & (best_d <= pos)
    length = jnp.where(has, 3 + length, 0)
    length = jnp.minimum(length, jnp.maximum(n - pos, 0))
    dl_ref[0] = (jnp.where(has, best_d, 0) << 9) | length


def _match2_kernel(n_ref, ext_ref, dl_ref, *, window: int,
                   max_match: int, seg: int, unroll: bool):
    b = pl.program_id(0)
    n = n_ref[b]
    halo = window
    rhalo = max_match
    # channel span, lane-aligned (seeds need +2, ladder up to +max_match-1)
    E = -(-(seg + rhalo) // 128) * 128
    L = -(-(halo + E) // 128) * 128  # dynamic_rotate wants 128-aligned rows
    ext = ext_ref[0]  # (LANES, L) int32 byte values (-1 pads)
    key = ext[:, halo : halo + E]

    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, seg), 0) * seg
        + jax.lax.broadcasted_iota(jnp.int32, (LANES, seg), 1)
    )
    posok = pos + 3 <= n

    # ONE 32-distance channel is live at a time: build its bitplane, pick
    # the newly-found seeds (channels ascend in distance, so earlier
    # channels win = nearest-match priority), and run the extension ladder
    # for exactly those positions before moving on.  Keeping all channels
    # resident (r2 layout: an (nch*LANES, E) scratch + per-phase passes)
    # blew the 16 MB scoped-VMEM budget at the bench shape — this form
    # peaks at one channel plane plus the accumulators.
    #
    # ``unroll``: the channel sweep is UNROLLED (static roll amounts, SSA
    # value): measured 3.7x over the fori_loop/dynamic-roll form at the
    # bench shape (scripts/probe_match6.py, 5.9 ms vs 22 ms, B=128 x
    # 64 KiB, win256/m10) — static-amount rolls lower to cheap lane
    # shifts.  The fori form is kept selectable because Mosaic codegen of
    # the big unrolled program is the newer, riskier path.
    nch = (window + 31) // 32
    best_d = jnp.zeros((LANES, seg), jnp.int32)
    found = jnp.zeros((LANES, seg), bool)
    length = jnp.zeros((LANES, seg), jnp.int32)
    for c in range(nch):
        lo_d = 32 * c + 1
        hi_d = min(32 * c + 32, window)
        if unroll:
            chc = jnp.zeros((LANES, E), jnp.uint32)
            for t in range(hi_d - lo_d + 1):
                d = lo_d + t
                # roll right by d: rolled[:, i] = ext[:, i - d]; the slice
                # stays wrap-free: i - d >= halo - d >= 0 on [halo, halo+E)
                rolled = pltpu.roll(ext, d, 1)[:, halo : halo + E]
                eqb = (key == rolled).astype(jnp.uint32)
                chc = chc | (eqb << ((d - 1) & 31))
        else:
            def body(t, ch):
                d = lo_d + t
                rolled = pltpu.roll(ext, d, 1)[:, halo : halo + E]
                eqb = (key == rolled).astype(jnp.uint32)
                return ch | (eqb << ((d - 1) & 31))

            chc = jax.lax.fori_loop(
                0, hi_d - lo_d + 1, body, jnp.zeros((LANES, E), jnp.uint32)
            )
        # 3-byte seeds; nearest distance = least set bit within the channel
        mc = chc[:, :seg] & chc[:, 1 : seg + 1] & chc[:, 2 : seg + 2]
        lsb = mc & (~mc + jnp.uint32(1))
        k = (31 - jax.lax.clz(lsb)).astype(jnp.int32)
        has_c = mc != 0
        new = ~found & has_c
        d_c = 32 * c + k + 1
        best_d = jnp.where(new, d_c, best_d)
        found = found | has_c
        # extension ladder for this channel's winners (bit index == k)
        bit = jnp.where(new, k, 0).astype(jnp.uint32)
        alive = new & posok & (d_c <= pos)
        len_c = jnp.zeros((LANES, seg), jnp.int32)
        for kk in range(3, max_match):
            alive = alive & (((chc[:, kk : seg + kk] >> bit) & 1) == 1)
            len_c = len_c + alive.astype(jnp.int32)
        length = length + len_c

    has = found & posok & (best_d <= pos)
    length = jnp.where(has, 3 + length, 0)
    length = jnp.minimum(length, jnp.maximum(n - pos, 0))
    # one packed output (dist 9b | len 9b) halves the VMEM output buffers
    dl_ref[0] = (jnp.where(has, best_d, 0) << 9) | length


def _halo_bytes(b: jax.Array, halo: int, seg: int, rhalo: int) -> jax.Array:
    """(N,) int32 bytes -> (LANES, halo + seg + rhalo) with -1 pads.

    Row i is the contiguous slice b[i*seg - halo : i*seg + seg + rhalo]
    (-1 outside [0, N)) — built from LANES static slices of the padded
    flat array rather than a gather (the affine-index gather cost ~7 ms
    of the 13 ms kernel call at the bench shape; slices are pure copies).
    """
    L = halo + seg + rhalo
    flatp = jnp.concatenate(
        [jnp.full(halo, -1, b.dtype), b, jnp.full(L, -1, b.dtype)]
    )
    return jnp.stack(
        [jax.lax.slice(flatp, (i * seg,), (i * seg + L,)) for i in range(LANES)]
    )


@functools.partial(jax.jit, static_argnames=("window", "max_match", "interpret"))
def match_bitplane_batch(
    data: jax.Array,  # uint8/int32 [B, N]
    n: jax.Array,  # int32 [B]
    window: int,
    max_match: int,
    interpret: bool | None = None,
):
    """(dist, length) int32[B, N] — element-equal to the XLA bitplane
    matcher.  N must be a multiple of 128; window <= 256."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    import os as _os

    # default: hybrid (two-level rolls) — composes cleanly and measured
    # encode 0.280 GB/s vs fori's 0.241 at the bench shape.  The fully
    # UNROLLED sweep is fastest standalone (8.9 ms vs hybrid ~11 ms) but
    # its composed encode_blocks_batch program HANGS at device execution
    # (reproduced 3x on 2026-08-20; suspected Mosaic instruction-memory
    # pressure — the hybrid's rolls never exceed 32 lanes and its body is
    # 1/8 the size): select "unroll" for standalone experiments only.
    # (The round-3 gather-halo form was retired after two rounds of
    # hardware bench runs confirmed the r4 forms.)
    form = _os.environ.get("TPU_DEFLATE_MATCH2_FORM", "hybrid")
    B, N = data.shape
    seg = N // LANES
    halo, rhalo = window, max_match
    b = data.astype(jnp.int32)
    E = -(-(seg + rhalo) // 128) * 128
    L = -(-(halo + E) // 128) * 128  # lane-aligned rows for roll
    # the halo layout carries L - halo >= seg + rhalo columns per row so
    # channel slices stay in-bounds (extra columns read real next-segment
    # bytes or -1 pads; they are never consumed past seg + max_match)
    ext = jax.vmap(lambda row: _halo_bytes(row, halo, seg, L - halo - seg))(b)

    spec = pl.BlockSpec(
        (1, LANES, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM,
    )
    ospec = pl.BlockSpec((1, LANES, seg), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if form == "hybrid" and window % 32 == 0:
        kern = functools.partial(
            _match2_kernel_hybrid, window=window, max_match=max_match,
            seg=seg,
        )
    else:
        kern = functools.partial(
            _match2_kernel, window=window, max_match=max_match, seg=seg,
            unroll=form == "unroll",
        )
    dl = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, LANES, seg), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=ospec,
        # the unrolled sweep keeps the live channel plane + accumulators
        # ~21 MB at the bench shape, over Mosaic's 16 MB default scoped
        # budget; v5e has 128 MB VMEM so a raised per-kernel cap is safe
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(n.astype(jnp.int32), ext)
    dl = dl.reshape(B, N)
    return dl >> 9, dl & 0x1FF
