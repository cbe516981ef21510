"""Sharding-layer tests on a virtual 8-device CPU mesh.

These validate the multi-chip story the reference doesn't have (SURVEY.md
section 2.3): DP over independent blocks, ICI size/checksum exchange, and
ordered ragged assembly."""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deflate.config import DeflateConfig
from tpu_deflate.parallel.shard import (
    assemble_ragged,
    decode_sharded,
    encode_sharded,
    make_mesh,
)
from tests.corpora import corpus

CFG = DeflateConfig(window=256, max_match=10, chunk_size=2048)


def _chunk_batch(data: bytes, chunk: int, multiple: int):
    n = len(data)
    nchunks = max(1, -(-n // chunk))
    b = -(-nchunks // multiple) * multiple
    arr = np.zeros((b, chunk), np.uint8)
    flat = np.frombuffer(data, np.uint8)
    for i in range(nchunks):
        part = flat[i * chunk : (i + 1) * chunk]
        arr[i, : len(part)] = part
    lens = np.clip(n - np.arange(b) * chunk, 0, chunk).astype(np.int32)
    finals = np.zeros(b, bool)
    finals[nchunks - 1] = True
    return arr, lens, finals, nchunks


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8


class TestShardedEncode:
    def test_sharded_encode_valid_stream(self):
        mesh = make_mesh()
        data = b"".join(corpus(m, 4000) for m in [0, 1, 2, 3])
        arr, lens, finals, nchunks = _chunk_batch(data, 2048, len(jax.devices()))
        out, sizes, adler = encode_sharded(
            jnp.asarray(arr), jnp.asarray(lens), jnp.asarray(finals), mesh, CFG
        )
        out = np.asarray(out)[:nchunks]
        sizes = np.asarray(sizes)[:nchunks]
        body = b"".join(out[i, : sizes[i]].tobytes() for i in range(nchunks))
        stream = b"\x78\x9c" + body + int(adler).to_bytes(4, "big")
        assert zlib.decompress(stream) == data

    def test_adler_collective_matches_zlib(self):
        mesh = make_mesh()
        data = corpus(2, 30000)
        arr, lens, finals, nchunks = _chunk_batch(data, 2048, len(jax.devices()))
        _, _, adler = encode_sharded(
            jnp.asarray(arr), jnp.asarray(lens), jnp.asarray(finals), mesh, CFG
        )
        assert int(adler) == zlib.adler32(data)

    def test_adler_fold_large_chunks_no_overflow(self):
        """Regression: the (a,b,len) combine's rem*(a1-1) product exceeds
        int32 at chunk lengths >= ~16 KiB (32768 * 65520 + b ≈ 2^31); the
        split-multiply form must match zlib for 32 KiB chunks."""
        from tpu_deflate.config import DeflateConfig

        mesh = make_mesh()
        # adversarial content: drive the running a-state high before the
        # fold so (a1-1) % 65521 is large at every chunk boundary
        rng = np.random.default_rng(65521)
        data = rng.integers(128, 256, 4 * 32768, np.uint8).tobytes()
        cfg = DeflateConfig(window=256, max_match=10, chunk_size=32768)
        arr, lens, finals, nchunks = _chunk_batch(
            data, 32768, len(jax.devices())
        )
        _, _, adler = encode_sharded(
            jnp.asarray(arr), jnp.asarray(lens), jnp.asarray(finals), mesh, cfg
        )
        assert int(adler) == zlib.adler32(data)

    def test_device_side_assembly(self):
        mesh = make_mesh()
        data = b"".join(corpus(m, 3000) for m in [1, 2, 4, 6])
        arr, lens, finals, nchunks = _chunk_batch(data, 2048, len(jax.devices()))
        out, sizes, adler = encode_sharded(
            jnp.asarray(arr), jnp.asarray(lens), jnp.asarray(finals), mesh, CFG
        )
        sizes = jnp.where(jnp.arange(sizes.shape[0]) < nchunks, sizes, 0)
        cap = int(out.shape[0] * out.shape[1])
        stream, total = jax.jit(assemble_ragged, static_argnames="total_cap")(
            out, sizes, total_cap=cap
        )
        body = np.asarray(stream)[: int(total)].tobytes()
        full = b"\x78\x9c" + body + int(adler).to_bytes(4, "big")
        assert zlib.decompress(full) == data


class TestShardedDecode:
    def test_chunk_parallel_decode(self):
        """Encode with chunk index, decode chunks in parallel lanes."""
        from tpu_deflate import api

        mesh = make_mesh()
        cfg = DeflateConfig(window=256, max_match=10, chunk_size=2048)
        data = b"".join(corpus(m, 4000) for m in [0, 1, 2, 4])
        out, out_lens, adler = api.deflate_device(data, cfg)
        nchunks = out.shape[0]
        D = len(jax.devices())
        b = -(-nchunks // D) * D

        # chunk byte offsets within the raw deflate body
        offsets = np.zeros(b, np.int64)
        ends = np.zeros(b, np.int64)
        pos = 0
        for i in range(nchunks):
            offsets[i] = pos
            pos += int(out_lens[i])
            ends[i] = pos
        # padding lanes: empty range at stream end
        offsets[nchunks:] = pos
        ends[nchunks:] = pos

        body = b"".join(out[i, : out_lens[i]].tobytes() for i in range(nchunks))
        m_pad = 1 << int(np.ceil(np.log2(max(len(body), 2))))
        stream = np.zeros(m_pad, np.uint8)
        stream[: len(body)] = np.frombuffer(body, np.uint8)

        for static_only in (False, True):
            outs, totals, errs = decode_sharded(
                jnp.asarray(stream),
                jnp.asarray(8 * offsets, jnp.int32),
                jnp.asarray(8 * ends, jnp.int32),
                mesh,
                chunk_out_size=2048,
                static_only=static_only,
            )
            outs_h = np.asarray(outs)[:nchunks]
            totals_h = np.asarray(totals)[:nchunks]
            errs_h = np.asarray(errs)[:nchunks]
            assert (errs_h == 0).all(), (static_only, errs_h)
            got = b"".join(
                outs_h[i, : totals_h[i]].tobytes() for i in range(nchunks)
            )
            assert got == data


class TestMultihost:
    """Multi-host glue degenerates correctly on one process."""

    def test_initialize_noop_single_host(self):
        from tpu_deflate.parallel import multihost

        assert multihost.initialize() is False

    def test_global_mesh_all_devices(self):
        from tpu_deflate.parallel import multihost

        mesh = multihost.global_mesh()
        assert mesh.devices.size == len(jax.devices())

    def test_host_shard_bounds(self):
        from tpu_deflate.parallel import multihost

        s, e = multihost.host_shard_bounds(16)
        assert (s, e) == (0, 16)

    def test_make_global_batch_sharded_encode(self):
        import numpy as np

        from tpu_deflate.parallel import multihost
        from tpu_deflate.parallel.shard import encode_sharded

        mesh = multihost.global_mesh()
        D = mesh.devices.size
        data = b"".join(corpus(m, 2000) for m in [0, 1])
        arr, lens, finals, nchunks = _chunk_batch(data, 1024, D)
        garr = multihost.make_global_batch(arr, arr.shape[0], mesh)
        out, sizes, adler = encode_sharded(
            garr, jnp.asarray(lens), jnp.asarray(finals), mesh, CFG
        )
        out = np.asarray(out)[:nchunks]
        sizes = np.asarray(sizes)[:nchunks]
        body = b"".join(out[i, : sizes[i]].tobytes() for i in range(nchunks))
        stream = b"\x78\x9c" + body + int(adler).to_bytes(4, "big")
        assert zlib.decompress(stream) == data
