"""Probe Mosaic support for the primitives the fused tokenize kernel needs.

Diagnostics only.  Run on the real TPU: python scripts/mosaic_probe.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(name, fn):
    try:
        out = fn()
        log(f"{name:40s} OK   {np.asarray(out).reshape(-1)[:4]}")
        return True
    except Exception as e:
        log(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:160]}")
        return False


T = 4352  # 34 * 128


def k_repeat(x_ref, o_ref):
    # pltpu.repeat along lanes: (8, T//8) -> (8, T)
    o_ref[:, :] = pltpu.repeat(x_ref[:, : T // 8], 8, axis=1)


def k_repeat_sub(x_ref, o_ref):
    # repeat along sublanes: (8, T) -> (64, T)
    o_ref[:, :] = pltpu.repeat(x_ref[:, :], 8, axis=0)


def k_dynroll(x_ref, s_ref, o_ref):
    # dynamic-amount lane roll
    o_ref[:, :] = pltpu.roll(x_ref[:, :], s_ref[0], 1)


def k_while(x_ref, o_ref):
    def cond(c):
        i, x = c
        return (i < 10) & jnp.any(x[0, :] < 100)

    def body(c):
        i, x = c
        return i + 1, x + 1

    _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x_ref[:, :]))
    o_ref[:, :] = x


def k_scalar_read(x_ref, o_ref):
    # dynamic scalar read from VMEM via fori carry
    def body(t, e):
        return x_ref[e, t % 8].astype(jnp.int32) & 63

    e = jax.lax.fori_loop(0, 64, body, jnp.int32(0))
    o_ref[:, :] = jnp.broadcast_to(e, o_ref.shape)


def k_reshape(x_ref, o_ref):
    # (64, T) -> pack rows 4/int32 via strided slice x[0::4]
    m = x_ref[:, :]
    o_ref[:, :] = m[0::4] | (m[1::4] << 8) | (m[2::4] << 16) | (m[3::4] << 24)


def k_transpose(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].T


def run(kern, out_shape, *args, scratch=None):
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        scratch_shapes=scratch or [],
    )(*args)


def main():
    x8 = jnp.arange(8 * T, dtype=jnp.int32).reshape(8, T)
    x64 = jnp.arange(64 * T, dtype=jnp.int32).reshape(64, T) % 97
    s = jnp.array([3], jnp.int32)

    probe("repeat lanes (8,T/8)->(8,T)", lambda: run(
        k_repeat, jax.ShapeDtypeStruct((8, T), jnp.int32), x8))
    probe("repeat sublanes (8,T)->(64,T)", lambda: run(
        k_repeat_sub, jax.ShapeDtypeStruct((64, T), jnp.int32), x8))
    probe("dynamic lane roll", lambda: pl.pallas_call(
        k_dynroll,
        out_shape=jax.ShapeDtypeStruct((8, T), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x8, s))
    probe("while_loop vector carry", lambda: run(
        k_while, jax.ShapeDtypeStruct((8, T), jnp.int32), x8 % 90))
    probe("dynamic scalar VMEM read", lambda: run(
        k_scalar_read, jax.ShapeDtypeStruct((8, 128), jnp.int32), x64))
    probe("strided row slice pack", lambda: run(
        k_reshape, jax.ShapeDtypeStruct((16, T), jnp.int32), x64))
    probe("transpose (64,T)->(T,64)", lambda: run(
        k_transpose, jax.ShapeDtypeStruct((T, 64), jnp.int32), x64))


if __name__ == "__main__":
    main()
