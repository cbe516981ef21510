"""Probe Mosaic int8/int16 elementwise support + matcher sweep variants.

The match2 sweep is the encode bottleneck (28.9 ms / 8 MiB at r3 start).
Byte equality only needs byte-valued data; if Mosaic supports i8/i16
compare/and/or/select and static lane slices at those widths, the sweep's
vreg traffic drops 4x/2x.  This probe measures:
  1. i8/i16 elementwise op support inside a kernel
  2. sweep variants: current u32 roll, hoisted-roll + static slices,
     i16 channels, i8 channels
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


def probe(name, fn):
    try:
        t0 = time.time()
        out = np.asarray(fn())
        log(f"{name:50s} OK  compile+run {time.time()-t0:.1f}s sum={out.reshape(-1)[:4]}")
        return True
    except Exception as e:
        log(f"{name:50s} FAIL {type(e).__name__}: {str(e)[:160]}")
        return False


def main():
    log("device:", jax.devices()[0])

    # ---- 1. i8 elementwise support -----------------------------------
    T = 1024

    def k_i8(x_ref, o_ref):
        x = x_ref[...]
        y = x[:, 0:T]
        z = x[:, 8 : T + 8]
        eq = (y == z)
        acc = jnp.where(eq, jnp.int8(4), jnp.int8(0))
        acc = acc | jnp.where(y > z, jnp.int8(2), jnp.int8(0))
        acc = acc + (z & jnp.int8(1))
        neg = acc & (-acc)
        o_ref[...] = neg

    x8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 8, (LANES, T + 128), dtype=np.int8)
    )
    probe("i8 cmp/where/or/add/neg-and", lambda: pl.pallas_call(
        k_i8, out_shape=jax.ShapeDtypeStruct((LANES, T), jnp.int8))(x8))

    def k_i8roll(x_ref, o_ref):
        def body(t, acc):
            r = pltpu.roll(x_ref[...], t, 1)
            return acc + (r[:, 0:T] & jnp.int8(1))

        o_ref[...] = jax.lax.fori_loop(0, 8, body, jnp.zeros((LANES, T), jnp.int8))

    probe("i8 dynamic roll", lambda: pl.pallas_call(
        k_i8roll, out_shape=jax.ShapeDtypeStruct((LANES, T), jnp.int8))(x8))

    # ---- 2. i16 support ----------------------------------------------
    def k_i16(x_ref, o_ref):
        x = x_ref[...]
        y = x[:, 0:T]
        z = x[:, 8 : T + 8]
        acc = jnp.where(y == z, jnp.int16(1 << 12), jnp.int16(0))
        acc = acc | jnp.where(y > z, jnp.int16(2), jnp.int16(0))
        o_ref[...] = acc + (acc & (-acc))

    x16 = x8.astype(jnp.int16)
    probe("i16 cmp/where/or/add", lambda: pl.pallas_call(
        k_i16, out_shape=jax.ShapeDtypeStruct((LANES, T), jnp.int16))(x16))

    # ---- 3. sweep variants at production-ish shape -------------------
    B, N = 32, 65536
    seg = N // LANES
    window, mm = 256, 10
    E = -(-(seg + mm) // 128) * 128
    L = -(-(window + E) // 128) * 128
    rng = np.random.default_rng(1)
    ext_np = rng.integers(0, 8, (B, LANES, L), dtype=np.int32)

    # v0: current — dynamic roll per distance, u32 channels
    def kern_v0(ext_ref, o_ref, *, halo):
        ext = ext_ref[0]
        key = ext[:, halo : halo + E]
        acc = jnp.zeros((LANES, E), jnp.uint32)
        for c in range(8):
            def body(t, ch):
                d = 32 * c + 1 + t
                rolled = pltpu.roll(ext, d, 1)[:, halo : halo + E]
                return ch | ((key == rolled).astype(jnp.uint32) << ((d - 1) & 31))
            ch = jax.lax.fori_loop(0, 32, body, jnp.zeros((LANES, E), jnp.uint32))
            acc = acc ^ ch
        o_ref[0] = acc

    # v1: hoist roll per channel; 32 static slices inside
    def kern_v1(ext_ref, o_ref, *, halo):
        ext = ext_ref[0]
        key = ext[:, halo : halo + E]
        acc = jnp.zeros((LANES, E), jnp.uint32)
        for c in range(8):
            base = pltpu.roll(ext, 32 * c + 1, 1)
            ch = jnp.zeros((LANES, E), jnp.uint32)
            for t in range(32):
                rolled = base[:, halo - t : halo - t + E]
                ch = ch | ((key == rolled).astype(jnp.uint32) << t)
            acc = acc ^ ch
        o_ref[0] = acc

    # v2: i8 data, 32 u8 channels (8 distances each), hoisted roll
    def kern_v2(ext_ref, o_ref, *, halo):
        ext = ext_ref[0]
        key = ext[:, halo : halo + E]
        acc = jnp.zeros((LANES, E), jnp.int8)
        for c in range(32):
            base = pltpu.roll(ext, 8 * c + 1, 1)
            ch = jnp.zeros((LANES, E), jnp.int8)
            for t in range(8):
                rolled = base[:, halo - t : halo - t + E]
                ch = ch | jnp.where(key == rolled, jnp.int8(1 << t), jnp.int8(0))
            acc = acc ^ ch
        o_ref[0] = acc

    # v3: i16 data, 16 u16 channels, hoisted roll
    def kern_v3(ext_ref, o_ref, *, halo):
        ext = ext_ref[0]
        key = ext[:, halo : halo + E]
        acc = jnp.zeros((LANES, E), jnp.int16)
        for c in range(16):
            base = pltpu.roll(ext, 16 * c + 1, 1)
            ch = jnp.zeros((LANES, E), jnp.int16)
            for t in range(16):
                rolled = base[:, halo - t : halo - t + E]
                ch = ch | jnp.where(key == rolled, jnp.int16(1 << t), jnp.int16(0))
            acc = acc ^ ch
        o_ref[0] = acc

    def run_variant(name, kern, dtype):
        ext = jnp.asarray(ext_np.astype(dtype))
        f = jax.jit(lambda e: pl.pallas_call(
            functools.partial(kern, halo=window),
            grid=(B,),
            out_shape=jax.ShapeDtypeStruct((B, LANES, E), jnp.dtype(dtype) if dtype != np.int32 else jnp.uint32),
            in_specs=[pl.BlockSpec((1, LANES, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, LANES, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )(e))
        try:
            dt = timeit(f, ext)
            log(f"{name:50s} {dt*1e3:7.2f} ms  ({B*N/dt/1e9:.3f} GB/s input)")
        except Exception as e:
            log(f"{name:50s} FAIL {type(e).__name__}: {str(e)[:160]}")

    run_variant("v0 u32 dyn-roll/distance (current)", kern_v0, np.int32)
    run_variant("v1 u32 hoisted roll + static slices", kern_v1, np.int32)
    run_variant("v2 i8 channels", kern_v2, np.int8)
    run_variant("v3 i16 channels", kern_v3, np.int16)


if __name__ == "__main__":
    main()
