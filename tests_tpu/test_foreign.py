"""Foreign-stream device loop on real hardware (ops/foreign.py).

zlib is the oracle: streams IT produced (all block types, flush
boundaries, cross-block back-references) must round-trip through the
device-paced per-block walk; streams outside the kernels' gates must
fall back cleanly, never mis-decode.  CPU can't exercise this (the loop
is built from compiled Pallas kernels), hence the TPU lane.
"""

import zlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus():
    from bench import load_corpus

    return load_corpus(3 << 20)


class TestForeignLoop:
    def test_single_stream_levels(self, corpus):
        from tpu_deflate.ops.foreign import inflate_foreign_device

        data = corpus[: 1 << 20]
        for lvl in (6, 9):
            s = zlib.compress(data, lvl)[2:-4]
            r = inflate_foreign_device(s, 0)
            assert r is not None, f"level {lvl} fell back"
            out, total, _pos = r
            assert out[:total].tobytes() == data

    def test_flush_boundaries_and_stored_mix(self, corpus):
        from tpu_deflate.ops.foreign import inflate_foreign_device

        data = corpus
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        parts = []
        pos = 0
        segs = [500000, 300000, 900000, 200000, 1000000,
                len(data) - 2900000]
        for i, n in enumerate(segs):
            parts.append(co.compress(data[pos : pos + n]))
            pos += n
            if i % 2 == 0:
                parts.append(co.flush(zlib.Z_FULL_FLUSH))
        parts.append(co.flush())
        s = b"".join(parts)
        r = inflate_foreign_device(s, 0)
        assert r is not None, "multi-flush stream fell back"
        out, total, _pos = r
        assert out[:total].tobytes() == data

        # stored (level-0) run spliced between dynamic runs
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        a = co.compress(data[:600000]) + co.flush(zlib.Z_FULL_FLUSH)
        co0 = zlib.compressobj(0, zlib.DEFLATED, -15)
        b = co0.compress(data[600000:1200000]) + co0.flush(zlib.Z_FULL_FLUSH)
        co2 = zlib.compressobj(6, zlib.DEFLATED, -15)
        c = co2.compress(data[1200000:1800000]) + co2.flush()
        r = inflate_foreign_device(a + b + c, 0)
        assert r is not None
        out, total, _pos = r
        assert out[:total].tobytes() == data[:1800000]

    def test_fallback_path_still_decodes(self, corpus):
        """A stream with a sub-2-bit... i.e. degenerate one-symbol block
        must fall back (or be handled) and inflate_device must still
        produce correct output via the XLA pipeline."""
        from tpu_deflate.ops.decode import inflate_device

        data = corpus[:200000]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        s = (
            co.compress(data)
            + co.flush(zlib.Z_FULL_FLUSH)
            + co.compress(b"a" * 50)
            + co.flush(zlib.Z_FULL_FLUSH)
            + co.compress(data[:100000])
            + co.flush()
        )
        out, total, _pos = inflate_device(s, 0)
        assert out[:total].tobytes() == data + b"a" * 50 + data[:100000]

    def test_api_zlib_gzip(self, corpus):
        import gzip

        import tpu_deflate

        data = corpus[: 2 << 20]
        z = zlib.compress(data, 6)
        assert tpu_deflate.decompress(z) == data
        g = gzip.compress(data, 6)
        assert tpu_deflate.decompress_gzip(g) == data
        bad = bytearray(z)
        bad[300] ^= 0x55
        with pytest.raises(Exception):
            tpu_deflate.decompress(bytes(bad))

    def test_segmented_expand_boundaries(self, corpus):
        """Output > SEG exercises the segmented device expansion; matches
        crossing segment boundaries and window reuse must be exact."""
        from tpu_deflate.ops.foreign import SEG, inflate_foreign_device

        data = corpus[: SEG * 2 + 100000]  # 3 segments, ragged tail
        s = zlib.compress(data, 6)[2:-4]
        r = inflate_foreign_device(s, 0)
        assert r is not None
        out, total, _pos = r
        assert total == len(data)
        assert out[:total].tobytes() == data
