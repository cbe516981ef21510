"""Probe matcher sweep variants round 2.

probe_match3 findings: i8/i16 elementwise and SSA static slices crash the
Mosaic compiler; dynamic roll per distance (current) measured 10.34 ms at
B=32 for the bare sweep.  Hypothesis: dynamic-amount roll lowers to a
log-step barrel shifter (~10 conditional rotates), so hoisting it out of
the per-distance loop is the big lever.  Variants (sweep only, xor-folded
so nothing is DCE'd):

  v4  carried roll-by-1 (static amount) per distance
  v5  ONE dynamic roll per 32-distance channel -> scratch, then 32
      static REF slices (ref slices compile; SSA slices don't)
  v6  packed-4-bytes-per-u32 sweep: XLA-precomputed byte-realigned
      streams, static ref slices, xor + zero-byte-test, 8-distance
      group planes (4x less VMEM traffic per compare)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(x.reshape(-1)[:1])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


B, N = 32, 65536
seg = N // LANES          # 512
window, mm = 256, 10
E = -(-(seg + mm) // 128) * 128    # 640
L = -(-(window + E) // 128) * 128  # 896
halo = window


def main():
    log("device:", jax.devices()[0])
    rng = np.random.default_rng(1)
    ext_np = rng.integers(0, 8, (B, LANES, L), dtype=np.int32)
    ext = jnp.asarray(ext_np)

    in_spec = pl.BlockSpec((1, LANES, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, LANES, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def run(name, kern, scratch=None, osh=jnp.uint32, ow=E):
        f = jax.jit(lambda e: pl.pallas_call(
            kern, grid=(B,),
            out_shape=jax.ShapeDtypeStruct((B, LANES, ow), osh),
            in_specs=[in_spec],
            out_specs=pl.BlockSpec((1, LANES, ow), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch or [],
        )(e))
        try:
            dt = timeit(f, ext)
            log(f"{name:52s} {dt*1e3:7.2f} ms")
        except Exception as e:
            log(f"{name:52s} FAIL {type(e).__name__}: {str(e)[:140]}")

    # v4: carried roll-by-1
    def kern_v4(ext_ref, o_ref):
        acc = jnp.zeros((LANES, E), jnp.uint32)
        rolled = ext_ref[0]
        for c in range(8):
            def body(t, carry):
                ch, rolled = carry
                rolled = pltpu.roll(rolled, 1, 1)
                eq = rolled[:, halo : halo + E] == ext_ref[0][:, halo : halo + E]
                return ch | (eq.astype(jnp.uint32) << t), rolled

            ch, rolled = jax.lax.fori_loop(
                0, 32, body, (jnp.zeros((LANES, E), jnp.uint32), rolled))
            acc = acc ^ ch
        o_ref[0] = acc

    run("v4 carried roll-by-1", kern_v4)

    # v5: one dyn roll per channel -> scratch, 32 static ref slices
    def kern_v5(ext_ref, o_ref, s_ref):
        key = ext_ref[0][:, halo : halo + E]
        acc = jnp.zeros((LANES, E), jnp.uint32)
        for c in range(8):
            s_ref[...] = pltpu.roll(ext_ref[0], 32 * c + 1, 1)
            ch = jnp.zeros((LANES, E), jnp.uint32)
            for t in range(32):
                eq = s_ref[:, halo - t : halo - t + E] == key
                ch = ch | (eq.astype(jnp.uint32) << t)
            acc = acc ^ ch
        o_ref[0] = acc

    run("v5 chan dyn-roll->scratch + 32 ref slices", kern_v5,
        scratch=[pltpu.VMEM((LANES, L), jnp.int32)])

    # v5b: no roll at all: ext itself IS the scratch; slice at halo-d
    def kern_v5b(ext_ref, o_ref):
        key = ext_ref[0][:, halo : halo + E]
        acc = jnp.zeros((LANES, E), jnp.uint32)
        for c in range(8):
            ch = jnp.zeros((LANES, E), jnp.uint32)
            for t in range(32):
                d = 32 * c + 1 + t
                eq = ext_ref[0][:, halo - d : halo - d + E] == key
                ch = ch | (eq.astype(jnp.uint32) << t)
            acc = acc ^ ch
        o_ref[0] = acc

    run("v5b NO roll: 256 static ref slices", kern_v5b)

    # v6: packed words. Precompute V_r streams in XLA outside.
    P = L // 4  # 224 words per row

    def pack_streams(ext_i32):
        b8 = ext_i32.astype(jnp.uint32) & 0xFF
        w0 = (b8[..., 0::4] | (b8[..., 1::4] << 8) | (b8[..., 2::4] << 16)
              | (b8[..., 3::4] << 24))
        streams = [w0]
        for r in (1, 2, 3):
            lo = jnp.pad(w0[..., :-1], ((0, 0), (0, 0), (1, 0)))
            streams.append((lo >> (32 - 8 * r)) | (w0 << (8 * r)))
        return jnp.stack(streams, axis=1)  # (B, 4, LANES, P)

    V = jax.jit(pack_streams)(ext)
    HW = halo // 4  # 64 halo words

    def kern_v6(v_ref, o_ref):
        X = v_ref[0, 0][:, HW : HW + E // 4]
        acc = jnp.zeros((LANES, E // 4), jnp.uint32)
        for g in range(32):
            pg = jnp.zeros((LANES, E // 4), jnp.uint32)
            for t in range(8):
                d = 8 * g + 1 + t
                q, r = divmod(d, 4)
                z = X ^ v_ref[0, r][:, HW - q : HW - q + E // 4]
                zb = (
                    (z - jnp.uint32(0x01010101))
                    & ~z
                    & jnp.uint32(0x80808080)
                )
                pg = pg | ((zb >> 7) << t)
            acc = acc ^ pg
        o_ref[0] = acc

    f6 = jax.jit(lambda v: pl.pallas_call(
        kern_v6, grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, LANES, E // 4), jnp.uint32),
        in_specs=[pl.BlockSpec((1, 4, LANES, P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, LANES, E // 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(v))
    try:
        dt = timeit(f6, V)
        log(f"{'v6 packed-u32 sweep (8-dist groups)':52s} {dt*1e3:7.2f} ms")
    except Exception as e:
        log(f"{'v6 packed-u32 sweep':52s} FAIL {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
