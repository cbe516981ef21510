"""Device-side (jittable) Adler-32.

Replaces the reference's byte-serial running pair (adler1/adler2,
/root/reference/deflate.py:381-383,828-831) with a closed form the VPU can
evaluate in one pass:

  a(n) = 1 + sum(d)                (mod 65521)
  b(n) = n + sum((n - i) * d[i])   (mod 65521)

Computed per 2048-byte segment (so weighted sums stay inside int32 without
x64) and folded with the associative combine rule, which is also what lets
independently-encoded shards merge their checksums after a data-parallel
encode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ADLER_MOD = 65521
_SEG = 2048  # 2048 * 2048 * 255 < 2^31


def adler32_pair_combine(p1, p2):
    """Combine (a, b, len) adler states of two concatenated streams.

    int32-safe for ANY segment length: rem and (a1-1)%MOD are both up to
    65520, so the naive product reaches ~2^32 and wraps (it bit the
    sharded encode fold at 32 KiB chunks); split the multiplicand into
    8-bit halves so every intermediate stays under 2^25."""
    a1, b1, l1 = p1
    a2, b2, l2 = p2
    rem = l2 % ADLER_MOD
    x = (a1 - 1) % ADLER_MOD
    xh, xl = x >> 8, x & 0xFF
    t = ((rem * xh) % ADLER_MOD * 256 + rem * xl) % ADLER_MOD
    a = (a1 + a2 - 1) % ADLER_MOD
    b = (b1 + b2 + t) % ADLER_MOD
    return a, b, l1 + l2


def adler32_state(data: jax.Array, n) -> tuple[jax.Array, jax.Array]:
    """(a, b) Adler state of data[:n].  data: uint8[N], n: int32 scalar."""
    N = data.shape[0]
    pad = (-N) % _SEG
    d = jnp.pad(data, (0, pad)).astype(jnp.int32)
    nseg = d.shape[0] // _SEG
    d = d.reshape(nseg, _SEG)
    n = jnp.asarray(n, jnp.int32)

    seg_start = jnp.arange(nseg, dtype=jnp.int32) * _SEG
    seg_len = jnp.clip(n - seg_start, 0, _SEG)  # valid bytes per segment
    j = jnp.arange(_SEG, dtype=jnp.int32)[None, :]
    mask = j < seg_len[:, None]
    dm = jnp.where(mask, d, 0)
    w = jnp.maximum(seg_len[:, None] - j, 0)
    a_seg = (1 + dm.sum(axis=1)) % ADLER_MOD
    b_seg = (seg_len + (w * dm).sum(axis=1)) % ADLER_MOD

    def step(carry, seg):
        a, b, l = adler32_pair_combine(carry, seg)
        return (a, b, l), None

    (a, b, _), _ = jax.lax.scan(
        step,
        (jnp.int32(1), jnp.int32(0), jnp.int32(0)),
        (a_seg, b_seg, seg_len),
    )
    return a, b


def adler32_jax(data: jax.Array, n) -> jax.Array:
    """Adler-32 checksum of data[:n] as uint32."""
    a, b = adler32_state(data, n)
    return (b.astype(jnp.uint32) << 16) | a.astype(jnp.uint32)
