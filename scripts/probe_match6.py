"""Structural variants of the full match2 kernel at production shape.

probe5 split the current kernel: sweep 14.3 / selection +6.1 /
extension +4.0 ms (B=128).  Variants here keep element semantics but vary
codegen structure:

  v0  current (dynamic-roll fori sweep, scratch channel round-trip)
  v1  SSA channel (no scratch write/read)
  v2  unrolled STATIC-amount rolls (256 independent rolls), SSA channel
  v3  v2 + extension via precomputed seed-AND ladder on the packed plane
      (no variable shift: extension bit extracted once per channel via
      variable shift, then the ladder ANDs single-bit planes)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
B, N = 128, 65536
seg = N // LANES          # 512
window, max_match = 256, 10
E = -(-(seg + max_match) // 128) * 128    # 640
L = -(-(window + E) // 128) * 128         # 896
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


def make_kern(variant):
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
            if variant >= 2:
                chc = jnp.zeros((LANES, E), jnp.uint32)
                for t in range(32):
                    d = 32 * c + 1 + t
                    rolled = pltpu.roll(ext, d, 1)[:, halo : halo + E]
                    eqb = (key == rolled).astype(jnp.uint32)
                    chc = chc | (eqb << t)
            else:
                def body(t, ch):
                    d = 32 * c + 1 + t
                    rolled = pltpu.roll(ext, d, 1)[:, halo : halo + E]
                    eqb = (key == rolled).astype(jnp.uint32)
                    return ch | (eqb << t)

                chc = jax.lax.fori_loop(
                    0, 32, body, jnp.zeros((LANES, E), jnp.uint32))
                if variant == 0:
                    ch_ref[...] = chc
                    chc = ch_ref[...]
            mc = chc[:, :seg] & chc[:, 1 : seg + 1] & chc[:, 2 : seg + 2]
            lsb = mc & (~mc + jnp.uint32(1))
            k = (31 - jax.lax.clz(lsb)).astype(jnp.int32)
            has_c = mc != 0
            new = ~found & has_c
            d_c = 32 * c + k + 1
            best_d = jnp.where(new, d_c, best_d)
            found = found | has_c
            if variant == 3:
                # single-bit planes: sel = lsb replicated along the row —
                # extension checks (chc & lsb_at_that_byte) != 0
                alive = new & posok & (d_c <= pos)
                len_c = jnp.zeros((LANES, seg), jnp.int32)
                for kk in range(3, max_match):
                    hit = (chc[:, kk : seg + kk] & lsb) != 0
                    alive = alive & hit
                    len_c = len_c + alive.astype(jnp.int32)
                length = length + len_c
            else:
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

    ref = None
    for variant, name in [(0, "v0 current"), (1, "v1 SSA channel"),
                          (2, "v2 static rolls + SSA"),
                          (3, "v3 static rolls + lsb-AND ladder")]:
        f = jax.jit(lambda nv, e, va=variant: pl.pallas_call(
            make_kern(va), grid=(B,),
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
            out = np.asarray(f(nn, ext))
            okstr = ""
            if ref is None:
                ref = out
            else:
                okstr = "EQ" if (out == ref).all() else "** MISMATCH **"
            log(f"{name:38s} {dt*1e3:7.2f} ms  ({B*N/dt/1e9:.3f} GB/s) {okstr}")
        except Exception as e:
            log(f"{name:38s} FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
