"""Reference (host numpy) codec tests, zlib as the golden model in both
directions — the same strategy as the reference testbench
(/root/reference/test_deflate.py:90-296)."""

import zlib

import pytest

from tpu_deflate.config import DeflateConfig
from tpu_deflate.ref.deflate import deflate_raw, gzip_compress, zlib_compress
from tpu_deflate.ref.inflate import (
    DeflateError,
    gzip_decompress,
    inflate_raw,
    zlib_decompress,
)
from tests.corpora import ALL_MODES, corpus


class TestInflate:
    """Our decoder on zlib-produced streams (all three block methods)."""

    @pytest.mark.parametrize("mode", ALL_MODES)
    @pytest.mark.parametrize("level", [0, 1, 6, 9])
    def test_decode_zlib_streams(self, mode, level):
        data = corpus(mode, 3000)
        comp = zlib.compress(data, level)
        assert zlib_decompress(comp) == data

    @pytest.mark.parametrize("mode", [0, 1, 3])
    def test_decode_static_tree_streams(self, mode):
        """Z_FIXED forces static-Huffman blocks (the trick the reference
        tests use, test_deflate.py:76-79)."""
        data = corpus(mode, 3000)
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 8, zlib.Z_FIXED)
        comp = co.compress(data) + co.flush()
        assert zlib_decompress(comp) == data

    def test_decode_stored_blocks(self):
        data = corpus(3, 2000)  # random: level 0 stores
        comp = zlib.compress(data, 0)
        assert zlib_decompress(comp) == data

    def test_multi_block_stream(self):
        """Sync flushes force multiple blocks (incl. empty stored)."""
        co = zlib.compressobj(6)
        parts = []
        data = b""
        for mode in [0, 1, 3]:
            chunk = corpus(mode, 1500)
            data += chunk
            parts.append(co.compress(chunk))
            parts.append(co.flush(zlib.Z_SYNC_FLUSH))
        parts.append(co.flush())
        assert zlib_decompress(b"".join(parts)) == data

    def test_full_window_backrefs(self):
        """Back-references up to 32 KB (reference needs OBSIZE=32768 for
        this, README.md:20-22)."""
        data = corpus(0, 40000) + corpus(0, 100)  # far repeats
        comp = zlib.compress(data, 9)
        assert zlib_decompress(comp) == data

    def test_adler_mismatch_detected(self):
        comp = bytearray(zlib.compress(b"hello world"))
        comp[-1] ^= 0xFF
        with pytest.raises(DeflateError):
            zlib_decompress(bytes(comp))

    def test_gzip_roundtrip_zlib_golden(self):
        import gzip as gz

        data = corpus(1, 5000)
        assert gzip_decompress(gz.compress(data)) == data

    def test_gzip_multimember(self):
        import gzip as gz

        d1, d2 = corpus(0, 1000), corpus(2, 1000)
        assert gzip_decompress(gz.compress(d1) + gz.compress(d2)) == d1 + d2


class TestDeflate:
    """Our encoder's output must be decodable by stock zlib."""

    @pytest.mark.parametrize("mode", ALL_MODES)
    def test_static_encode_zlib_decodable(self, mode):
        data = corpus(mode, 3000)
        comp = zlib_compress(data, DeflateConfig(window=256, max_match=10))
        assert zlib.decompress(comp) == data

    @pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, 6])
    def test_full_window_encode(self, mode):
        data = corpus(mode, 3000)
        cfg = DeflateConfig(window=32768, max_match=258)
        comp = zlib_compress(data, cfg)
        assert zlib.decompress(comp) == data

    @pytest.mark.parametrize("mode", [0, 1, 2, 3])
    def test_dynamic_encode_zlib_decodable(self, mode):
        data = corpus(mode, 3000)
        cfg = DeflateConfig(window=32768, max_match=258, dynamic_encode=True)
        comp = zlib_compress(data, cfg)
        assert zlib.decompress(comp) == data

    def test_fast_config(self):
        """FAST: 32-byte window, matches the reference's smallest build."""
        data = corpus(1, 2200)
        comp = zlib_compress(data, DeflateConfig(fast=True))
        assert zlib.decompress(comp) == data

    def test_empty_input(self):
        comp = zlib_compress(b"")
        assert zlib.decompress(comp) == b""

    def test_own_roundtrip(self):
        data = corpus(2, 5000)
        assert zlib_decompress(zlib_compress(data)) == data

    def test_gzip_compress(self):
        import gzip as gz

        data = corpus(1, 4000)
        assert gz.decompress(gzip_compress(data)) == data

    def test_compression_ratio_beats_reference_parity(self):
        """The reference compresses its 2.2 KB bench corpus to 271 bytes at
        CWINDOW=256 (test_deflate.py:547-548).  Our window-256/match-10
        config on a similar numbered-text corpus must do at least as well
        relative to zlib Z_FIXED with the same constraints."""
        data = corpus(1, 2200)
        ours = len(zlib_compress(data, DeflateConfig(window=256, max_match=10)))
        # zlib with full window/length as a sanity lower bound
        zbest = len(zlib.compress(data, 9))
        assert ours < len(data) // 2  # compresses decently
        assert ours >= zbest  # can't beat zlib's full search, sanity

    def test_chunked_byte_aligned_concat(self):
        """Data-parallel container: independent chunks, bytewise concat,
        one zlib stream."""
        from tpu_deflate.spec.checksum import adler32

        cfg = DeflateConfig(window=256, max_match=10)
        chunks = [corpus(m, 1500) for m in [0, 1, 2, 3]]
        body = b"".join(
            deflate_raw(c, cfg, final=(i == len(chunks) - 1), byte_align=True)
            for i, c in enumerate(chunks)
        )
        data = b"".join(chunks)
        stream = b"\x78\x9c" + body + adler32(data).to_bytes(4, "big")
        assert zlib.decompress(stream) == data
