"""Pallas TPU kernel: whole-window LZ77 match finder (FAST matcher).

This is the native-kernel reinterpretation of the reference's FAST mode:
32 combinational 3-byte comparators evaluated every cycle with a priority
encoder choosing the nearest hit, then an extension ladder to MATCH10
length (/root/reference/deflate.py:407-421,979-994,899-964; generated as 32
parallel `assign`s in deflate.v:1029-1156).  On TPU the same structure
becomes: every VPU lane-element is a position, the W window comparisons are
W minor-axis shifted compares, and the extension ladder is a run-length
count over the same equality planes — all operating on VMEM-resident data.

Layout trick: byte shifts across 128-lane boundaries are expensive on TPU,
so the caller supplies a HALOED lane-major layout: the block is split into
128 contiguous segments (one per sublane row), each prefixed with the last
(window + max_match) bytes of the previous segment.  Every window shift is
then a static minor-axis slice.

The kernel computes, for every position, the nearest match distance in
[1, W] and the match length in [3, max_match] (0 if none) — exactly the
contract of ops.encode stages 1+2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _halo_layout(key3: jax.Array, halo: int, seg: int, rhalo: int) -> jax.Array:
    """(N,) -> (LANES, halo + seg + rhalo): row l holds
    key3[l*seg - halo : (l+1)*seg + rhalo] with out-of-range entries set to
    -1 (never match).  Left halo feeds window look-back, right halo feeds
    forward match extension across the segment boundary."""
    idx = (
        jnp.arange(LANES, dtype=jnp.int32)[:, None] * seg
        - halo
        + jnp.arange(halo + seg + rhalo, dtype=jnp.int32)[None, :]
    )
    valid = (idx >= 0) & (idx < key3.shape[0])
    vals = key3[jnp.clip(idx, 0, key3.shape[0] - 1)]
    return jnp.where(valid, vals, -1)


def _match_kernel(ext_ref, bestd_ref, bestl_ref, *, window: int, max_match: int, seg: int):
    halo = window + max_match
    key = ext_ref[:, halo : halo + seg]  # (LANES, seg)
    best_d = jnp.zeros((LANES, seg), jnp.int32)
    best_l = jnp.zeros((LANES, seg), jnp.int32)
    ext_steps = max_match - 3  # extra key-equality steps beyond the seed

    # sweep d = window..1 so the nearest distance wins (priority encoder)
    for t in range(window):
        d = window - t
        cand = ext_ref[:, halo - d : halo - d + seg]
        eq0 = key == cand
        # run length of consecutive equal keys == extension beyond 3 bytes:
        # key3[p+j] == key3[p+j-d] for j<=e  <=>  match length >= 3+e
        acc = eq0
        length = jnp.where(eq0, 3, 0)
        for j in range(1, ext_steps + 1):
            nxt = ext_ref[:, halo + j : halo + j + seg] == ext_ref[
                :, halo - d + j : halo - d + j + seg
            ]
            acc = acc & nxt
            length = length + acc.astype(jnp.int32)
        best_d = jnp.where(eq0, d, best_d)
        best_l = jnp.where(eq0, length, best_l)
    bestd_ref[:, :] = best_d
    bestl_ref[:, :] = best_l


@functools.partial(
    jax.jit, static_argnames=("window", "max_match", "interpret")
)
def find_matches_pallas(
    key3: jax.Array,
    n: jax.Array,
    window: int = 32,
    max_match: int = 10,
    interpret: bool | None = None,
):
    """Nearest-match (distance, length) for every position of a block.

    key3: int32[N] exact 3-byte keys (invalid positions must hold unique
    sentinels, as ops.encode prepares them).  N must be a multiple of 128.
    Returns (dist int32[N], length int32[N]); length is capped by the
    caller against n - i.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = key3.shape[0]
    assert N % LANES == 0, "block size must be a multiple of 128"
    seg = N // LANES
    halo = window + max_match
    rhalo = max_match
    ext = _halo_layout(key3, halo, seg, rhalo)

    kern = functools.partial(
        _match_kernel, window=window, max_match=max_match, seg=seg
    )
    bestd, bestl = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((LANES, seg), jnp.int32),
            jax.ShapeDtypeStruct((LANES, seg), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ext)
    dist = bestd.reshape(-1)
    length = bestl.reshape(-1)
    # positions whose match would cross a validity rule are filtered by the
    # caller (ops.encode applies the i/d/n bounds uniformly)
    return dist, length
