"""Stage-level TPU profiler for the encode/decode pipelines.

Times each pipeline stage separately (steady-state, jitted) on the real
corpus so optimization effort lands where the milliseconds are.  Usage:

    python scripts/profile_stages.py [encode] [decode] [MB]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(out):
    # block_until_ready does not force completion through the axon
    # tunnel; a 1-element fetch does (data-dependent round trip)
    x = out
    while isinstance(x, tuple):
        x = x[0]
    np.asarray(x.reshape(-1)[:1])


def timed(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return out, (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from bench import load_corpus
    from tpu_deflate.config import DeflateConfig

    args = set(sys.argv[1:])
    mb = 8
    for a in list(args):
        if a.isdigit():
            mb = int(a)
            args.discard(a)
    do_enc = not args or "encode" in args
    do_dec = not args or "decode" in args

    size = mb << 20
    chunk = 1 << 16
    cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk)
    data = load_corpus(size)
    nchunks = size // chunk
    darr = jnp.asarray(np.frombuffer(data, np.uint8).reshape(nchunks, chunk))
    dlens = jnp.asarray(np.full(nchunks, chunk, np.int32))
    finals = np.zeros(nchunks, bool)
    finals[-1] = True
    dfinals = jnp.asarray(finals)
    print(f"profile: {mb} MiB, B={nchunks}, device {jax.devices()[0]}",
          file=sys.stderr, flush=True)

    def rep(name, secs):
        print(f"{name:38s} {secs * 1e3:8.2f} ms  {size / secs / 1e9:7.3f} GB/s",
              flush=True)

    if do_enc:
        from tpu_deflate.kernels.match2 import match_bitplane_batch
        from tpu_deflate.kernels.monotone import SLAB, mono_scatter_add
        from tpu_deflate.ops import encode as E

        # stage 1+2: matcher kernel.  Standalone at B=128 the compiled
        # program hits the scoped-vmem edge (it fits inside the full
        # encode program); time at B/2 and scale.
        m = jax.jit(lambda d, l: match_bitplane_batch(d, l, 256, 10))
        half = nchunks // 2
        (dh, lh), t = timed(m, darr[:half], dlens[:half])
        rep("enc match_bitplane_batch (x2 est)", t * 2)
        dists = jnp.concatenate([dh, dh], axis=0)
        lens2 = jnp.concatenate([lh, lh], axis=0)
        dists, lens2 = m(darr, dlens) if False else (dists, lens2)
        # recompute true match arrays via the full-batch call only if it
        # compiles; otherwise the doubled halves are correct for timing
        # downstream stages but NOT for values — recompute per half:
        d2, l2 = m(darr[half:], dlens[half:])
        dists = jnp.concatenate([dh, d2], axis=0)
        lens2 = jnp.concatenate([lh, l2], axis=0)

        # stage 3+4: parse + emissions (vmapped XLA)
        f = functools.partial(
            E._encode_emissions, window=256, max_match=10,
            use_sort_matcher=False, lazy=False,
            dynamic_encode=False)

        def emis(d, n_, fin, pd, pl_):
            return jax.vmap(
                lambda a, b, c, x, y: f(a, b, c, pre_dist=x, pre_length=y)
            )(d, n_, fin, pd, pl_)

        emis_j = jax.jit(emis)
        (vals, nbs, offs, total_bits, ntok), t = timed(
            emis_j, darr, dlens, dfinals, dists, lens2)
        rep("enc parse+emissions (XLA)", t)

        # stage 5: bit pack (channel build + mono scatter + reassembly)
        M = E.max_output_bytes(chunk)

        def pack(vals, nbs, offs):
            live = nbs > 0
            s = offs & 7
            byte_idx = offs >> 3
            K = vals.shape[1]
            Kp = -(-K // SLAB) * SLAB
            pad = Kp - K
            byte_idx = jnp.pad(byte_idx, ((0, 0), (0, pad)), constant_values=M)
            c0 = ((vals & 0xFFFF) << s) & 0xFFFF
            c1 = (vals >> (16 - s)) & 0xFFFF
            c2 = (vals >> 16) >> (16 - s)
            ch = jnp.stack([jnp.where(live, c, 0) for c in (c0, c1, c2)], axis=1)
            ch = jnp.pad(ch, ((0, 0), (0, 0), (0, pad)))
            packed = mono_scatter_add(byte_idx, ch, M + 8)
            out = (packed[:, 0, :M] & 0xFF) + jnp.pad(
                (packed[:, 0, : M - 1] >> 8) & 0xFF, ((0, 0), (1, 0)))
            for c, disp in ((1, 2), (2, 4)):
                out = out + jnp.pad(
                    packed[:, c, : M - disp] & 0xFF, ((0, 0), (disp, 0)))
                out = out + jnp.pad(
                    (packed[:, c, : M - disp - 1] >> 8) & 0xFF,
                    ((0, 0), (disp + 1, 0)))
            return out

        pack_j = jax.jit(pack)
        out, t = timed(pack_j, vals, nbs, offs)
        rep("enc bit-pack (mono + reassembly)", t)

        fin_j = jax.jit(jax.vmap(functools.partial(E._finalize_block, M=M)))
        _, t = timed(fin_j, darr, dlens, dfinals, out, total_bits)
        rep("enc finalize", t)

        enc = jax.jit(functools.partial(E.encode_blocks_batch, config=cfg))
        (outE, sizesE, _), t = timed(enc, darr, dlens, dfinals)
        rep("enc TOTAL", t)

    if do_dec:
        from tpu_deflate.kernels.expand2 import expand_fused2
        from tpu_deflate.kernels.tokenize import tokenize_static_batch
        from tpu_deflate.ops import decode as D
        from tpu_deflate.ops.encode import encode_blocks_batch

        enc = jax.jit(functools.partial(encode_blocks_batch, config=cfg))
        outE, sizesE, _ = enc(darr, dlens, dfinals)
        jax.block_until_ready(outE)
        dends = (8 * sizesE).astype(jnp.int32)
        pw = D._fused_pw(chunk)

        tok_j = jax.jit(functools.partial(tokenize_static_batch, pw=pw))
        (tok, ntok, _tot, _pos, err), t = timed(tok_j, outE, dends)
        rep("dec tokenize fused (K1+K2+K3)", t)
        assert (np.asarray(err) == 0).all()

        # glue: unpack + offsets + searchsorted prep (inside expand wrapper)
        def glue(tok, ntok):
            tk = (tok >> 26) & 3
            ta = (tok >> 17) & 0x1FF
            tb = tok & 0x1FFFF
            TOK = tk.shape[-1]
            live = jnp.arange(TOK) < ntok[..., None]
            out_len_tok = jnp.where(live, jnp.where(tk == 0, 1, ta), 0)
            off = (jnp.cumsum(out_len_tok, axis=-1) - out_len_tok).astype(jnp.int32)
            total = jnp.sum(out_len_tok, axis=-1).astype(jnp.int32)
            c1 = ((tk & 3) << 9) | (ta & 0x1FF)
            return off, c1, tb, total

        glue_j = jax.jit(glue)
        (off, c1, tb, total), t = timed(glue_j, tok, ntok)
        rep("dec glue (unpack+cumsum)", t)

        exp_j = jax.jit(functools.partial(
            expand_fused2, out_cap=chunk, max_dist=2048))
        outD, t = timed(exp_j, off, c1, tb, ntok, total)
        rep("dec expand_fused2", t)
        got = np.asarray(outD).astype(np.uint8).reshape(-1)[:size]
        assert got.tobytes() == data, "expand mismatch"

        dec = jax.jit(lambda rows, ee: D.decode_rows_batch(
            rows, ee, out_cap=chunk, tok_cap=chunk + 16, static_only=True))
        _, t = timed(dec, outE, dends)
        rep("dec TOTAL", t)
