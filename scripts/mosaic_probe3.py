"""Probe Mosaic support for the fused tokenize kernel's remaining patterns:
dynamic lane-tile slices, static row reads of traced arrays, K2's scan
iteration, and per-source-row one-hot scatter matmuls."""

import functools
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
        ok = ""
        if expect is not None:
            ok = "  CORRECT" if np.array_equal(out.reshape(-1)[:6], expect) else f"  WRONG {out.reshape(-1)[:6]} want {expect}"
        log(f"{name:44s} OK{ok}")
        return True
    except Exception as e:
        log(f"{name:44s} FAIL {type(e).__name__}: {str(e)[:140]}")
        return False


def run(kern, out_shape, *args, scratch=None):
    return pl.pallas_call(kern, out_shape=out_shape,
                          scratch_shapes=scratch or [])(*args)


def main():
    T = 8192
    x = (jnp.arange(9 * T, dtype=jnp.int32).reshape(9, T)) % 251
    xnp = np.asarray(x)

    # 1. dynamic lane-tile slice via fori + multiple_of
    def k_lane_tile(x_ref, o_ref):
        def body(i, acc):
            idx = pl.multiple_of(i * 128, 128)
            return acc + jnp.sum(x_ref[:, pl.ds(idx, 128)])

        o_ref[0, 0] = jax.lax.fori_loop(0, T // 128, body, jnp.int32(0))

    probe("dyn lane-tile slice (multiple_of)", lambda: run(
        k_lane_tile, jax.ShapeDtypeStruct((1, 1), jnp.int32), x),
        np.array([xnp.sum() % (1 << 32)], np.int64).astype(np.int32)[:1])

    # 2. static row read of a traced value array
    def k_row_read(x_ref, o_ref):
        v = x_ref[:, :] * 2
        acc = v[0]
        for g in range(1, 9):
            acc = acc + v[g]
        o_ref[0, :] = acc

    probe("static row slice of traced array", lambda: run(
        k_row_read, jax.ShapeDtypeStruct((1, T), jnp.int32), x),
        (2 * xnp.sum(0))[:6])

    # 3. K2 scan pattern: fori + dynamic majormost ref read (3D block)
    TS = 512
    phi = (jnp.arange(TS * 12 * 128, dtype=jnp.int32).reshape(TS, 12, 128)) % 48

    def k_scan(phi_ref, o_ref, e_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            e_scr[0, :] = jnp.full((128,), 3, jnp.int32)

        def body(i, _):
            E = e_scr[0, :]
            o_ref[i, :] = E
            g = jnp.clip(E >> 2, 0, 11)
            acc = jnp.zeros((128,), jnp.int32)
            for v in range(12):
                acc = jnp.where(g == v, phi_ref[i, v, :], acc)
            nE = (acc >> ((E & 3) << 3)) & 0xFF
            e_scr[0, :] = jnp.where(E < 64, nE, E)
            return 0

        jax.lax.fori_loop(0, TS, body, 0)

    def run_scan():
        return pl.pallas_call(
            k_scan,
            grid=(1,),
            out_shape=jax.ShapeDtypeStruct((TS, 128), jnp.int32),
            in_specs=[pl.BlockSpec((TS, 12, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TS, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        )(phi)

    # emulate on host
    phin = np.asarray(phi)
    E = np.full(128, 3, np.int64)
    ref = np.zeros((TS, 128), np.int64)
    for i in range(TS):
        ref[i] = E
        acc = phin[i, np.clip(E >> 2, 0, 11), np.arange(128)]
        nE = (acc >> ((E & 3) << 3)) & 0xFF
        E = np.where(E < 64, nE, E)
    probe("K2 scan fori + dyn 3D ref read", run_scan, ref.reshape(-1)[:6])

    # 4. per-source-row one-hot scatter: (WR,128)@(128,128) bf16 matmul
    WR = 11
    tgt = jnp.sort(jnp.arange(128, dtype=jnp.int32) * 9 % (WR * 128 - 1))
    val = (jnp.arange(128, dtype=jnp.int32) * 7) % 256

    def k_scatter(t_ref, v_ref, o_ref):
        t = t_ref[0, :]
        v = v_ref[0, :]
        wi = jax.lax.broadcasted_iota(jnp.int32, (WR, 128), 1)
        ohr = ((t[None, :] >> 7) == jax.lax.broadcasted_iota(
            jnp.int32, (WR, 128), 0)).astype(jnp.bfloat16)
        li = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        ohl = (((t & 127)[:, None] == li) * v[:, None]).astype(jnp.bfloat16)
        o_ref[:, :] = jnp.dot(ohr, ohl, preferred_element_type=jnp.float32
                              ).astype(jnp.int32)

    def run_scatter():
        return run(k_scatter, jax.ShapeDtypeStruct((WR, 128), jnp.int32),
                   tgt[None], val[None])

    refsc = np.zeros((WR * 128,), np.int32)
    np.add.at(refsc, np.asarray(tgt), np.asarray(val))
    probe("per-row one-hot scatter matmul", run_scatter,
          refsc.reshape(WR, 128).reshape(-1)[:6])

    # 5. transposed-table one-hot gather: (2048,128)@(128,WR) bf16
    WT = 19
    q = (jnp.arange(2048, dtype=jnp.int32) * 37) % (WT * 128)
    tab = (jnp.arange(WT * 128, dtype=jnp.int32).reshape(WT, 128)) % 199

    def k_gather(q_ref, tab_ref, o_ref):
        qq = q_ref[:, :]  # (16, 128)
        tT = tab_ref[:, :].astype(jnp.bfloat16).T  # (128, WT)
        out = jnp.zeros((16, 128), jnp.int32)
        for r in range(16):
            qrow = qq[r]  # (128,)
            li = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            ohl = ((qrow & 127)[:, None] == li).astype(jnp.bfloat16)
            g = jnp.dot(ohl, tT, preferred_element_type=jnp.float32)  # (128, WT)
            wi = jax.lax.broadcasted_iota(jnp.int32, (128, WT), 1)
            pick = jnp.sum(jnp.where((qrow >> 7)[:, None] == wi, g, 0.0),
                           axis=1).astype(jnp.int32)
            out = out.at[r].set(pick) if False else jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) == r,
                pick[None, :], out)
        o_ref[:, :] = out

    refg = np.asarray(tab).reshape(-1)[np.asarray(q)].reshape(16, 128)
    probe("transposed-table one-hot gather", lambda: run(
        k_gather, jax.ShapeDtypeStruct((16, 128), jnp.int32),
        q.reshape(16, 128), tab), refg.reshape(-1)[:6])


if __name__ == "__main__":
    main()
