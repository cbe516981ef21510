"""Spec-layer tests: RFC tables, Huffman construction, bitstream, checksums.

The golden model is zlib throughout, following the reference's test
strategy (/root/reference/test_deflate.py:38-85, zlib both directions).
"""

import zlib

import numpy as np
import pytest

from tpu_deflate.spec import tables as T
from tpu_deflate.spec.bitstream import BitReader, BitWriter
from tpu_deflate.spec.checksum import adler32, adler32_combine, crc32
from tpu_deflate.spec.huffman import (
    build_decode_table,
    canonical_codes,
    code_lengths_from_freqs,
    leaf_nbits,
    leaf_symbol,
    reverse_bits,
)


class TestTables:
    def test_length_table_rfc_values(self):
        # RFC 1951 3.2.5 spot checks
        assert T.LENGTH_BASE[0] == 3
        assert T.LENGTH_BASE[8] == 11
        assert T.LENGTH_BASE[27] == 227
        assert T.LENGTH_BASE[28] == 258
        assert T.LENGTH_EXTRA_BITS[27] == 5
        assert T.LENGTH_EXTRA_BITS[28] == 0

    def test_dist_table_rfc_values(self):
        assert T.DIST_BASE[0] == 1
        assert T.DIST_BASE[4] == 5
        assert T.DIST_BASE[29] == 24577
        assert T.DIST_EXTRA_BITS[29] == 13

    def test_len_to_sym_roundtrip(self):
        for ln in range(3, 259):
            s = T.LEN_TO_SYM[ln]
            base = T.LENGTH_BASE[s]
            extra = T.LEN_TO_EXTRA[ln]
            assert base + extra == ln
            assert extra < (1 << T.LENGTH_EXTRA_BITS[s]) or T.LENGTH_EXTRA_BITS[s] == 0
        assert T.LEN_TO_SYM[258] == 28

    def test_dist_to_sym_roundtrip(self):
        for d in [1, 2, 3, 4, 5, 7, 24, 255, 256, 257, 32767, 32768]:
            s = T.DIST_TO_SYM[d]
            assert T.DIST_BASE[s] + T.DIST_TO_EXTRA[d] == d

    def test_static_codes_against_rfc(self):
        # RFC 1951 3.2.6: lit 0 -> 00110000 (8b), 143 -> 10111111,
        # 144 -> 110010000 (9b), 256 -> 0000000 (7b), 280 -> 11000000 (8b)
        assert T.STATIC_LITLEN_CODES[0] == 0b00110000
        assert T.STATIC_LITLEN_CODES[143] == 0b10111111
        assert T.STATIC_LITLEN_CODES[144] == 0b110010000
        assert T.STATIC_LITLEN_CODES[255] == 0b111111111
        assert T.STATIC_LITLEN_CODES[256] == 0
        assert T.STATIC_LITLEN_CODES[279] == 0b0010111
        assert T.STATIC_LITLEN_CODES[280] == 0b11000000
        assert T.STATIC_LITLEN_CODES[287] == 0b11000111


class TestHuffman:
    def test_reverse_bits(self):
        assert reverse_bits(0b1, 1) == 0b1
        assert reverse_bits(0b110, 3) == 0b011
        assert reverse_bits(0b10000000, 8) == 0b00000001

    def test_canonical_simple(self):
        # lengths {a:2, b:1, c:3, d:3} -> codes b=0, a=10, c=110, d=111
        lengths = np.array([2, 1, 3, 3])
        codes = canonical_codes(lengths)
        assert list(codes) == [0b10, 0b0, 0b110, 0b111]

    def test_decode_table_inverts_codes(self):
        rng = np.random.default_rng(0)
        freqs = rng.integers(0, 1000, 64)
        lengths = code_lengths_from_freqs(freqs, 15)
        codes = canonical_codes(lengths)
        bits = int(lengths.max())
        table = build_decode_table(lengths, bits)
        for sym, (c, n) in enumerate(zip(codes, lengths)):
            if n == 0:
                continue
            idx = reverse_bits(int(c), int(n))
            leaf = int(table[idx])
            assert leaf_symbol(leaf) == sym
            assert leaf_nbits(leaf) == n

    def test_static_decode_table_parity(self):
        """Verify 512-entry static decode table semantics against the
        reference's stat_leaves construction (deflate.py:151-216) by
        checking every 9-bit index decodes to the right symbol."""
        table = build_decode_table(T.STATIC_LITLEN_LENGTHS, 9)
        for idx in range(512):
            leaf = int(table[idx])
            sym, n = leaf_symbol(leaf), leaf_nbits(leaf)
            assert n > 0
            # re-encode: the low n bits of idx reversed must equal the code
            code = reverse_bits(idx & ((1 << n) - 1), n)
            assert code == T.STATIC_LITLEN_CODES[sym]

    def test_kraft_complete(self):
        rng = np.random.default_rng(7)
        for trial in range(20):
            nsym = int(rng.integers(2, 300))
            freqs = rng.integers(0, 100, nsym)
            if freqs.sum() == 0:
                freqs[0] = 1
            lengths = code_lengths_from_freqs(freqs, 15)
            nz = lengths[lengths > 0]
            if len(nz) == 1:
                continue
            kraft = np.sum(2.0 ** (-nz.astype(np.float64)))
            assert abs(kraft - 1.0) < 1e-9, f"trial {trial}: kraft={kraft}"
            assert lengths.max() <= 15


class TestBitstream:
    def test_roundtrip(self, rng):
        bw = BitWriter()
        vals = []
        for _ in range(1000):
            n = int(rng.integers(1, 17))
            v = int(rng.integers(0, 1 << n))
            vals.append((v, n))
            bw.write_bits(v, n)
        data = bw.getvalue()
        br = BitReader(data)
        for v, n in vals:
            assert br.read_bits(v.bit_length() and n or n) == v

    def test_lsb_first_order(self):
        bw = BitWriter()
        bw.write_bits(0b1, 1)
        bw.write_bits(0b0, 1)
        bw.write_bits(0b11, 2)
        bw.write_bits(0b1010, 4)
        assert bw.getvalue() == bytes([0b10101101])

    def test_align_and_bytes(self):
        bw = BitWriter()
        bw.write_bits(0x5, 3)
        bw.write_bytes(b"\xaa\xbb")
        data = bw.getvalue()
        br = BitReader(data)
        assert br.read_bits(3) == 0x5
        assert br.read_bytes(2) == b"\xaa\xbb"


class TestChecksum:
    @pytest.mark.parametrize("size", [0, 1, 100, 5551, 5552, 5553, 100000])
    def test_adler_vs_zlib(self, rng, size):
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert adler32(data) == zlib.adler32(data)

    def test_adler_combine(self, rng):
        a = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
        b = rng.integers(0, 256, 2345, dtype=np.uint8).tobytes()
        combined = adler32_combine(adler32(a), adler32(b), len(b))
        assert combined == zlib.adler32(a + b)

    def test_crc_vs_zlib(self, rng):
        data = rng.integers(0, 256, 10000, dtype=np.uint8).tobytes()
        assert crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)
