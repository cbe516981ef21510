"""Probe Mosaic lowerings for even/odd lane deinterleave variants."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(name, fn, expect=None):
    try:
        out = np.asarray(fn())
        ok = "" if expect is None else ("  CORRECT" if np.array_equal(out.reshape(-1)[:8], expect) else f"  WRONG {out.reshape(-1)[:8]}")
        log(f"{name:44s} OK{ok}")
        return True
    except Exception as e:
        log(f"{name:44s} FAIL {type(e).__name__}: {str(e)[:140]}")
        return False


T = 8192
R = 48


def run(kern, out_shape, *args):
    return pl.pallas_call(kern, out_shape=out_shape)(*args)


def main():
    x = (jnp.arange(R * T, dtype=jnp.int32).reshape(R, T)) % 251
    xnp = np.asarray(x)
    even = xnp[:, 0::2]

    def k_lane_stride(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :][:, 0::2]

    probe("lane stride x[:, 0::2]", lambda: run(
        k_lane_stride, jax.ShapeDtypeStruct((R, T // 2), jnp.int32), x),
        even.reshape(-1)[:8])

    def k_lax_slice(x_ref, o_ref):
        o_ref[:, :] = jax.lax.slice(x_ref[:, :], (0, 0), (R, T), (1, 2))

    probe("lax.slice stride 2 lanes", lambda: run(
        k_lax_slice, jax.ShapeDtypeStruct((R, T // 2), jnp.int32), x),
        even.reshape(-1)[:8])

    def k_reshape_minor(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].reshape(R, T // 2, 2)[:, :, 0]

    probe("reshape (R,T/2,2)[...,0]", lambda: run(
        k_reshape_minor, jax.ShapeDtypeStruct((R, T // 2), jnp.int32), x),
        even.reshape(-1)[:8])

    # interleave (the descent direction): (R,T/2),(R,T/2) -> (R,T)
    a = x[:, : T // 2]
    b = x[:, T // 2:]
    ref = np.empty((R, T), np.int32)
    ref[:, 0::2] = np.asarray(a)
    ref[:, 1::2] = np.asarray(b)

    def k_interleave(a_ref, b_ref, o_ref):
        st = jnp.stack([a_ref[:, :], b_ref[:, :]], axis=-1)  # (R, T/2, 2)
        o_ref[:, :] = st.reshape(R, T)

    probe("interleave via stack+reshape", lambda: run(
        k_interleave, jax.ShapeDtypeStruct((R, T), jnp.int32), a, b),
        ref.reshape(-1)[:8])

    # sublane stride via slice
    def k_sub_stride(x_ref, o_ref):
        o_ref[:, :] = jax.lax.slice(x_ref[:, :], (0, 0), (R, T), (2, 1))

    probe("sublane stride lax.slice", lambda: run(
        k_sub_stride, jax.ShapeDtypeStruct((R // 2, T), jnp.int32), x),
        xnp[0::2].reshape(-1)[:8])


if __name__ == "__main__":
    main()
