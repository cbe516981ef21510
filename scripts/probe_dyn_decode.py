"""Probe: stage split of dynamic-container decode on the real TPU.

Times (a) the full XLA dynamic decode_rows_batch, (b) encode prep, and
(c) isolated sub-stages via the kill-switch envs, to size the fused
dynamic tokenizer's budget.  Diagnostics only — not a component.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from tpu_deflate.config import DeflateConfig
    from tpu_deflate.ops.decode import decode_rows_batch
    from tpu_deflate.ops.encode import encode_blocks_batch
    from bench import load_corpus

    size = 8 << 20
    chunk = 1 << 16
    data = load_corpus(size)
    n = size // chunk
    darr = jnp.asarray(np.frombuffer(data, np.uint8).reshape(n, chunk))
    dlens = jnp.full(n, chunk, jnp.int32)
    finals = np.zeros(n, bool)
    finals[-1] = True

    cfg = DeflateConfig(window=256, max_match=10, chunk_size=chunk,
                        dynamic_encode=True)
    enc = jax.jit(functools.partial(encode_blocks_batch, config=cfg))
    out, sizes, _ = enc(darr, dlens, jnp.asarray(finals))
    np.asarray(sizes)
    dends = (8 * sizes).astype(jnp.int32)
    print("encoded; mean csize", float(jnp.mean(sizes)), file=sys.stderr)

    dec = jax.jit(lambda rows, ee: decode_rows_batch(
        rows, ee, out_cap=chunk, tok_cap=chunk + 16, static_only=False))
    o, t, e = dec(out, dends)
    assert (np.asarray(e) == 0).all()
    got = np.asarray(o).reshape(-1)[:size]
    assert got.tobytes() == data
    t0 = time.perf_counter()
    for _ in range(5):
        o, t, e = dec(out, dends)
    np.asarray(o[0, :1])
    dt = (time.perf_counter() - t0) / 5
    print(f"full dynamic decode: {dt*1e3:.1f} ms -> {size/dt/1e9:.4f} GB/s")


if __name__ == "__main__":
    main()
