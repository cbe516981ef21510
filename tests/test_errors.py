"""Malformed-stream error taxonomy: every decoder error path must raise a
typed error, never return wrong output (the reference's `raise Error` ->
$finish analog, SURVEY.md section 5)."""

import zlib

import pytest

from tpu_deflate import api
from tpu_deflate.ref.inflate import DeflateError, zlib_decompress
from tpu_deflate.spec.bitstream import BitWriter
from tests.corpora import corpus


def _wrap(body: bytes, payload: bytes = b"") -> bytes:
    import zlib as z

    return b"\x78\x9c" + body + z.adler32(payload).to_bytes(4, "big")


class TestMalformedStreams:
    def test_reserved_btype(self):
        bw = BitWriter()
        bw.write_bits(1, 1)  # BFINAL
        bw.write_bits(3, 2)  # reserved method
        stream = _wrap(bw.getvalue())
        with pytest.raises(ValueError):
            api.decompress(stream)
        with pytest.raises(DeflateError):
            zlib_decompress(stream)

    def test_stored_len_nlen_mismatch(self):
        bw = BitWriter()
        bw.write_bits(1, 1)
        bw.write_bits(0, 2)
        bw.align_to_byte()
        bw.write_bytes(b"\x05\x00\x00\x00")  # NLEN != ~LEN
        stream = _wrap(bw.getvalue() + b"xxxxx")
        with pytest.raises(ValueError):
            api.decompress(stream)
        with pytest.raises(DeflateError):
            zlib_decompress(stream)

    def test_distance_before_start(self):
        # static block: length code then a distance reaching before output 0
        bw = BitWriter()
        bw.write_bits(1, 1)
        bw.write_bits(1, 2)
        from tpu_deflate.spec import tables as T
        from tpu_deflate.spec.huffman import reverse_bits

        sym = 257  # length 3
        bw.write_bits(
            int(T.STATIC_LITLEN_CODES_REV[sym]), int(T.STATIC_LITLEN_LENGTHS[sym])
        )
        bw.write_bits(reverse_bits(4, 5), 5)  # dist sym 4 -> distance 5 > 0 out
        bw.write_bits(0, 1)
        stream = _wrap(bw.getvalue())
        with pytest.raises(ValueError):
            api.decompress(stream)
        with pytest.raises(DeflateError):
            zlib_decompress(stream)

    def test_bad_zlib_header_check(self):
        comp = bytearray(zlib.compress(b"data"))
        comp[1] ^= 0x01  # break FCHECK
        with pytest.raises(ValueError):
            api.decompress(bytes(comp))

    def test_adler_trailer_mismatch(self):
        comp = bytearray(zlib.compress(corpus(1, 300)))
        comp[-1] ^= 0xFF
        with pytest.raises(ValueError):
            api.decompress(bytes(comp))

    def test_truncated_everywhere(self):
        comp = zlib.compress(corpus(0, 400))
        for cut in [1, 2, 5, len(comp) // 2, len(comp) - 5]:
            with pytest.raises((ValueError, EOFError)):
                api.decompress(comp[:cut])

    def test_garbage(self):
        with pytest.raises((ValueError, EOFError)):
            api.decompress(b"\xde\xad\xbe\xef" * 100)


class TestPropertyRoundTrip:
    """Seeded random property test: any byte string round-trips through
    every config family (the reference fuzzes unseeded; we keep seeds)."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_random_structures(self, seed):
        import numpy as np

        from tpu_deflate.config import DeflateConfig

        rng = np.random.default_rng(seed)
        parts = []
        for _ in range(rng.integers(1, 6)):
            kind = rng.integers(0, 4)
            n = int(rng.integers(0, 3000))
            if kind == 0:
                parts.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
            elif kind == 1:
                parts.append(bytes([int(rng.integers(0, 256))]) * n)
            elif kind == 2:
                parts.append(bytes(rng.integers(97, 123, n, dtype=np.uint8)))
            else:
                seqlen = max(1, int(rng.integers(1, 30)))
                seq = rng.integers(0, 256, seqlen, dtype=np.uint8).tobytes()
                parts.append((seq * (n // seqlen + 1))[:n])
        data = b"".join(parts)
        cfg = DeflateConfig(
            window=32768, max_match=258, chunk_size=4096,
            lazy=bool(seed % 2), dynamic_encode=bool(seed % 2),
        )
        comp = api.compress(data, cfg)
        assert zlib.decompress(comp) == data
        assert api.decompress(comp) == data


class TestAdversarialContainers:
    """Corrupt containers must raise typed errors, never return wrong
    bytes (checksums gate every assembled output)."""

    def _payload(self):
        return (b"adversarial robustness %d " * 800) % tuple(range(800))

    def test_indexed_bit_flips_detected(self, rng):
        from tpu_deflate import api
        from tpu_deflate.config import DeflateConfig

        cfg = DeflateConfig(chunk_size=4096)
        data = self._payload()
        stream, idx = api.compress_indexed(data, cfg)
        for _ in range(4):
            s = bytearray(stream)
            pos = int(rng.integers(2, len(s) - 4))
            s[pos] ^= 1 << int(rng.integers(0, 8))
            try:
                out = api.decompress_indexed(bytes(s), idx, cfg)
                assert out == data  # flip landed in dead padding
            except ValueError:
                pass

    def test_indexed_truncation_and_bad_index(self):
        import pytest

        from tpu_deflate import api
        from tpu_deflate.config import DeflateConfig

        cfg = DeflateConfig(chunk_size=4096)
        data = self._payload()
        stream, idx = api.compress_indexed(data, cfg)
        with pytest.raises(ValueError):
            api.decompress_indexed(stream[: len(stream) // 2], idx, cfg)
        bad = idx.copy()
        bad[0] += 3
        bad[1] -= 3
        with pytest.raises(ValueError):
            api.decompress_indexed(stream, bad, cfg)

    def test_gzip_member_crc_corruption(self):
        import pytest

        from tpu_deflate import api

        gm = bytearray(api.compress_gzip_members(self._payload()))
        gm[-6] ^= 0xFF
        with pytest.raises(ValueError):
            api.decompress_gzip(bytes(gm))
