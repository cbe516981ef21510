"""Top-level compress/decompress API over the TPU kernels.

The byte-level protocol the reference exposes (host writes bytes / polls
progress counters, /root/reference/test_deflate.py:142-174) becomes a
block-chunked array API here: input is split into fixed-size chunks, every
chunk is encoded as an independent byte-aligned DEFLATE block run on
device (batched), and the chunks concatenate bytewise into one RFC 1950
stream whose Adler-32 is folded from per-chunk states with the combine
rule.  Decode mirrors it.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu_deflate.config import DeflateConfig
from tpu_deflate.ops.checksum import adler32_state
from tpu_deflate.ops.encode import encode_blocks_batch, max_output_bytes
from tpu_deflate.spec.checksum import ADLER_MOD, adler32_combine, crc32


def _chunk(data: bytes, chunk_size: int):
    """Split into fixed-size chunks, pad the last; returns (array[B, C],
    lengths[B])."""
    n = len(data)
    nchunks = max(1, -(-n // chunk_size))
    padded = np.zeros((nchunks, chunk_size), dtype=np.uint8)
    flat = np.frombuffer(data, dtype=np.uint8)
    for i in range(nchunks):
        part = flat[i * chunk_size : (i + 1) * chunk_size]
        padded[i, : len(part)] = part
    lengths = np.minimum(
        np.maximum(n - np.arange(nchunks) * chunk_size, 0), chunk_size
    ).astype(np.int32)
    return padded, lengths


def deflate_device(data: bytes, config: DeflateConfig = DeflateConfig()):
    """Encode on device; returns (chunks uint8[B, M], out_lens[B], adler).

    The batch is padded to a power of two with empty blocks (trailing,
    dropped on assembly) so compiled programs are reused across sizes.
    """
    arr, lengths = _chunk(data, config.chunk_size)
    nchunks = arr.shape[0]
    bpad = max(1, 1 << int(np.ceil(np.log2(nchunks))))
    if bpad > nchunks:
        arr = np.pad(arr, ((0, bpad - nchunks), (0, 0)))
        lengths = np.pad(lengths, (0, bpad - nchunks))
    finals = np.zeros(bpad, dtype=bool)
    finals[nchunks - 1] = True
    out, out_lens, _ = encode_blocks_batch(
        jnp.asarray(arr), jnp.asarray(lengths), jnp.asarray(finals), config
    )
    # per-chunk adler folded on host (cheap: B states); padded chunks have
    # length 0 and contribute the identity state (1, 0)
    a, b = jax.vmap(adler32_state)(jnp.asarray(arr), jnp.asarray(lengths))
    a = np.asarray(a)
    b = np.asarray(b)
    out = np.asarray(out)[:nchunks]
    out_lens = np.asarray(out_lens)[:nchunks]
    lengths = lengths[:nchunks]
    adler = 1
    for i in range(nchunks):
        chunk_ad = (int(b[i]) << 16) | int(a[i])
        adler = adler32_combine(adler, chunk_ad, int(lengths[i]))
    return np.asarray(out), np.asarray(out_lens), adler


def compress(data: bytes, config: DeflateConfig = DeflateConfig()) -> bytes:
    """zlib-compatible compress using the TPU encode path."""
    if not config.compress:
        raise ValueError("config disables compress")
    out, out_lens, adler = deflate_device(data, config)
    body = b"".join(
        out[i, : out_lens[i]].tobytes() for i in range(out.shape[0])
    )
    return b"\x78\x9c" + body + int(adler).to_bytes(4, "big")


def compress_gzip(data: bytes, config: DeflateConfig = DeflateConfig()) -> bytes:
    """gzip (RFC 1952) compress using the TPU encode path."""
    out, out_lens, _ = deflate_device(data, config)
    body = b"".join(
        out[i, : out_lens[i]].tobytes() for i in range(out.shape[0])
    )
    header = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
    trailer = crc32(data).to_bytes(4, "little") + (
        len(data) & 0xFFFFFFFF
    ).to_bytes(4, "little")
    return header + body + trailer


def decompress(data: bytes, config: DeflateConfig = DeflateConfig()) -> bytes:
    """zlib-compatible decompress.

    Uses the device decoder for streams it can map (see ops/decode.py);
    falls back to the host reference decoder otherwise.
    """
    if not config.decompress:
        raise ValueError("config disables decompress")
    from tpu_deflate.ops import decode as ddec

    return ddec.zlib_decompress_device(data, config)
