"""Phase split of the REAL match2 kernel at production shape (B=128).

Variants: sweep-only, sweep+selection, full (selection+extension), to
locate the 28.9 ms.  Same layout/specs as kernels/match2.py.
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
B, N = 128, 65536
seg = N // LANES
window, max_match = 256, 10
E = -(-(seg + max_match) // 128) * 128
L = -(-(window + E) // 128) * 128
halo = window
nch = 8


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


def make_kern(phase):
    def kern(n_ref, ext_ref, dl_ref, ch_ref):
        b = pl.program_id(0)
        n = n_ref[b]
        ext = ext_ref[0]
        key = ext[:, halo : halo + E]
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, seg), 0) * seg
            + jax.lax.broadcasted_iota(jnp.int32, (LANES, seg), 1)
        )
        posok = pos + 3 <= n
        best_d = jnp.zeros((LANES, seg), jnp.int32)
        found = jnp.zeros((LANES, seg), bool)
        length = jnp.zeros((LANES, seg), jnp.int32)
        for c in range(nch):
            def body(t, ch):
                d = 32 * c + 1 + t
                rolled = pltpu.roll(ext, d, 1)[:, halo : halo + E]
                eqb = (key == rolled).astype(jnp.uint32)
                return ch | (eqb << ((d - 1) & 31))

            ch_ref[...] = jax.lax.fori_loop(
                0, 32, body, jnp.zeros((LANES, E), jnp.uint32))
            chc = ch_ref[...]
            if phase == 0:
                length = length + chc[:, :seg].astype(jnp.int32)
                continue
            mc = chc[:, :seg] & chc[:, 1 : seg + 1] & chc[:, 2 : seg + 2]
            lsb = mc & (~mc + jnp.uint32(1))
            k = (31 - jax.lax.clz(lsb)).astype(jnp.int32)
            has_c = mc != 0
            new = ~found & has_c
            d_c = 32 * c + k + 1
            best_d = jnp.where(new, d_c, best_d)
            found = found | has_c
            if phase >= 2:
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

    return kern


def main():
    log("device:", jax.devices()[0])
    rng = np.random.default_rng(1)
    ext_np = rng.integers(0, 8, (B, LANES, L), dtype=np.int32)
    ext = jnp.asarray(ext_np)
    nn = jnp.full((B,), N, jnp.int32)

    for phase, name in [(0, "sweep only"), (1, "sweep+selection"),
                        (2, "full (=current)")]:
        f = jax.jit(lambda nv, e, ph=phase: pl.pallas_call(
            make_kern(ph), grid=(B,),
            out_shape=jax.ShapeDtypeStruct((B, LANES, seg), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, LANES, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, LANES, seg), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((LANES, E), jnp.uint32)],
        )(nv, e))
        try:
            dt = timeit(f, nn, ext)
            log(f"{name:30s} {dt*1e3:7.2f} ms  ({B*N/dt/1e9:.3f} GB/s)")
        except Exception as e:
            log(f"{name:30s} FAIL {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
