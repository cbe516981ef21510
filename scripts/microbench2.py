"""Clean primitive timings: lane-gather vs add-only vs matmul vs roll."""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    np.asarray(x.reshape(-1)[:1])


def bench(name, kernel_body, shapes_in, out_shape, reps_in=8192, n_units=1):
    """kernel_body(refs..., o_ref) loops reps_in times internally."""
    f = pl.pallas_call(
        functools.partial(kernel_body, reps=reps_in),
        out_shape=jax.ShapeDtypeStruct(*out_shape),
    )
    fj = jax.jit(lambda *a: f(*a))
    args = []
    rng = np.random.default_rng(0)
    for shp, dt, hi in shapes_in:
        args.append(jnp.asarray(rng.integers(0, hi, shp).astype(dt)))
    try:
        out = fj(*args)
        _sync(out)
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:100]}", flush=True)
        return
    t0 = time.perf_counter()
    N = 5
    for _ in range(N):
        out = fj(*args)
    _sync(out)
    dt_ = (time.perf_counter() - t0) / N / reps_in / n_units
    print(f"{name}: {dt_*1e6:8.3f} us/unit", flush=True)


def gather_loop(x_ref, idx_ref, o_ref, *, reps):
    x = x_ref[...]
    idx = idx_ref[...]

    def body(_, c):
        g = jnp.take_along_axis(x, c, axis=1)
        return (g + idx) & 127

    o_ref[...] = jax.lax.fori_loop(0, reps, body, idx)


def add_loop(x_ref, idx_ref, o_ref, *, reps):
    x = x_ref[...]
    idx = idx_ref[...]

    def body(_, c):
        return ((x + c) + idx) & 127

    o_ref[...] = jax.lax.fori_loop(0, reps, body, idx)


def mm_loop_16(a_ref, b_ref, o_ref, *, reps):
    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)

    def body(_, c):
        g = jnp.dot(c.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return g * 0.001 + a

    o_ref[...] = jax.lax.fori_loop(0, reps, body, a).astype(jnp.int32)


def mm_loop_2x(a_ref, b_ref, o_ref, *, reps):
    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.bfloat16)

    def body(_, c):
        g = jnp.dot(c.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32)
        g2 = jnp.dot(g.astype(jnp.bfloat16), b.T, preferred_element_type=jnp.float32)
        return g2 * 0.001 + a

    o_ref[...] = jax.lax.fori_loop(0, reps, body, a).astype(jnp.int32)


def roll_loop(x_ref, o_ref, *, reps):
    x = x_ref[...]

    def body(_, c):
        return pltpu.roll(c, 1, 1) + x

    o_ref[...] = jax.lax.fori_loop(0, reps, body, x)


def while_sync_loop(x_ref, o_ref, *, reps):
    x = x_ref[...]

    def cond(c):
        v, r = c
        return jnp.any(v > 0) & (r < reps)

    def body(c):
        v, r = c
        return v + x, r + 1

    v, _ = jax.lax.while_loop(cond, body, (x, jnp.int32(0)))
    o_ref[...] = v


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for shp in ((512, 128), (2048, 128), (64, 128)):
        bench(f"lane-gather {shp}", gather_loop,
              [(shp, np.int32, 128), (shp, np.int32, 128)],
              (shp, jnp.int32))
        bench(f"add3      {shp}", add_loop,
              [(shp, np.int32, 128), (shp, np.int32, 128)],
              (shp, jnp.int32))
    bench("mm (16,128)@(128,128)", mm_loop_16,
          [((16, 128), np.int32, 100), ((128, 128), np.int32, 2)],
          ((16, 128), jnp.int32), reps_in=16384)
    bench("mm (512,128)@(128,128)", mm_loop_16,
          [((512, 128), np.int32, 100), ((128, 128), np.int32, 2)],
          ((512, 128), jnp.int32), reps_in=4096)
    bench("mm2x (512,512)@(512,128)@(128,512)", mm_loop_2x,
          [((512, 512), np.int32, 100), ((512, 128), np.int32, 2)],
          ((512, 512), jnp.int32), reps_in=1024)
    bench("roll (2048,128)", roll_loop,
          [((2048, 128), np.int32, 128)], ((2048, 128), jnp.int32))
    bench("roll (128,896)", roll_loop,
          [((128, 896), np.int32, 128)], ((128, 896), jnp.int32))
    bench("while-sync (512,128)", while_sync_loop,
          [((512, 128), np.int32, 128)], ((512, 128), jnp.int32),
          reps_in=8192)
