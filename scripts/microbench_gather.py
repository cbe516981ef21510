"""Empirical probe: tpu.dynamic_gather support + primitive costs on v5e.

Tests which take_along_axis shapes lower in Mosaic, verifies semantics
vs numpy, and times a chained-gather loop for throughput.  Also times
small-matmul issue rate and pltpu.roll for comparison.
"""

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


def gather_kernel(x_ref, idx_ref, o_ref, *, axis, reps):
    x = x_ref[...]
    idx = idx_ref[...]
    n = x.shape[axis]

    def body(_, carry):
        g = jnp.take_along_axis(x, carry, axis=axis)
        return (g + idx) % n

    out = jax.lax.fori_loop(0, reps, body, idx)
    o_ref[...] = out


def try_gather(shape, axis, reps=1):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 20, shape).astype(np.int32) % shape[axis]
    idx = rng.integers(0, shape[axis], shape).astype(np.int32)
    f = pl.pallas_call(
        functools.partial(gather_kernel, axis=axis, reps=reps),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )
    fj = jax.jit(lambda a, b: f(a, b))
    try:
        out = fj(jnp.asarray(x), jnp.asarray(idx))
        out_h = np.asarray(out)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"gather {shape} axis={axis}: FAIL {type(e).__name__}: {msg}",
              flush=True)
        return None
    # replicate semantics on host
    ref = idx.copy()
    for _ in range(reps):
        ref = (np.take_along_axis(x, ref, axis=axis) + idx) % shape[axis]
    ok = (out_h == ref).all()
    print(f"gather {shape} axis={axis}: OK correct={ok}", flush=True)
    if not ok:
        bad = np.argwhere(out_h != ref)[:3]
        print(f"  first bad {bad}", flush=True)
    return fj


def time_gather(shape, axis, reps=64):
    rng = np.random.default_rng(0)
    x = (rng.integers(0, 1 << 20, shape).astype(np.int32)) % shape[axis]
    idx = rng.integers(0, shape[axis], shape).astype(np.int32)
    f = pl.pallas_call(
        functools.partial(gather_kernel, axis=axis, reps=reps),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )
    fj = jax.jit(lambda a, b: f(a, b))
    xa, ia = jnp.asarray(x), jnp.asarray(idx)
    out = fj(xa, ia); _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fj(xa, ia)
    _sync(out)
    dt = (time.perf_counter() - t0) / 3 / reps
    n = shape[0] * shape[1]
    print(f"time gather {shape} axis={axis}: {dt*1e6:.2f} us/gather "
          f"({n/dt/1e9:.2f} Gelem/s)", flush=True)


def matmul_kernel(a_ref, b_ref, o_ref, *, reps, bat):
    a = a_ref[...]
    b = b_ref[...]

    def body(_, c):
        if bat:
            g = jax.lax.dot_general(
                c, b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            g = jnp.dot(c, b, preferred_element_type=jnp.float32)
        return g * 0.5 + c * 0.5

    o_ref[...] = jax.lax.fori_loop(0, reps, body, a)


def time_matmul(sa, sb, reps=64, bat=False):
    rng = np.random.default_rng(0)
    a = rng.standard_normal(sa).astype(np.float32)
    b = rng.standard_normal(sb).astype(np.float32)
    f = pl.pallas_call(
        functools.partial(matmul_kernel, reps=reps, bat=bat),
        out_shape=jax.ShapeDtypeStruct(sa, jnp.float32),
    )
    fj = jax.jit(lambda x, y: f(x, y))
    try:
        out = fj(jnp.asarray(a), jnp.asarray(b)); _sync(out)
    except Exception as e:
        print(f"matmul {sa}@{sb} bat={bat}: FAIL {str(e).splitlines()[0][:100]}",
              flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(3):
        out = fj(jnp.asarray(a), jnp.asarray(b))
    _sync(out)
    dt = (time.perf_counter() - t0) / 3 / reps
    macs = np.prod(sa) * sb[-1]
    print(f"time matmul {sa}@{sb} bat={bat}: {dt*1e6:.2f} us "
          f"({macs/dt/1e12:.2f} TMAC/s)", flush=True)


def roll_kernel(x_ref, o_ref, *, reps):
    x = x_ref[...]

    def body(i, c):
        return pltpu.roll(c, 1, 1) + x

    o_ref[...] = jax.lax.fori_loop(0, reps, body, x)


def time_roll(shape, reps=128):
    x = np.arange(np.prod(shape), dtype=np.int32).reshape(shape)
    f = pl.pallas_call(
        functools.partial(roll_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
    )
    fj = jax.jit(lambda a: f(a))
    out = fj(jnp.asarray(x)); _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fj(jnp.asarray(x))
    _sync(out)
    dt = (time.perf_counter() - t0) / 3 / reps
    print(f"time roll {shape}: {dt*1e6:.2f} us/roll", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    # --- support matrix ---
    try_gather((8, 128), 1)
    try_gather((16, 128), 1)
    try_gather((256, 128), 1)
    try_gather((8, 256), 1)
    try_gather((8, 512), 1)
    try_gather((8, 1024), 1)
    try_gather((8, 128), 0)
    try_gather((16, 128), 0)
    try_gather((32, 128), 0)
    try_gather((64, 128), 0)
    try_gather((256, 128), 0)
    try_gather((2048, 128), 0)
    # --- throughput ---
    time_gather((16, 128), 1)
    time_gather((256, 128), 1)
    time_gather((2048, 128), 1)
    time_gather((32, 128), 0)
    time_gather((256, 128), 0)
    time_gather((2048, 128), 0)
    # --- matmul issue rates ---
    time_matmul((16, 128), (128, 128))
    time_matmul((128, 128), (128, 128))
    time_matmul((2048, 128), (128, 128))
    time_matmul((2048, 32), (32, 128))
    time_matmul((128, 2048, 24), (128, 24, 128), reps=8, bat=True)
    # --- roll ---
    time_roll((128, 896))
    time_roll((2048, 128))
