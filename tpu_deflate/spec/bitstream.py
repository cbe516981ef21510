"""LSB-first bitstream reader/writer (numpy reference implementations).

DEFLATE packs bits LSB-first within bytes (RFC 1951 section 3.1.1).  These
are the host-side reference analogs of the reference design's bit-getter
``get4``/``adv`` (/root/reference/deflate.py:517-533) and bit-putter
``put``/``do_flush`` (/root/reference/deflate.py:535-567).  The TPU encode
path replaces the writer with a prefix-sum + scatter pack kernel
(tpu_deflate/ops/bitpack.py); these classes are the oracle they are tested
against.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    """Accumulates bits LSB-first into a bytearray."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0  # pending bits, LSB-first
        self._nacc = 0

    @property
    def bit_length(self) -> int:
        return 8 * len(self._buf) + self._nacc

    def write_bits(self, value: int, nbits: int) -> None:
        if nbits < 0 or value < 0 or (nbits < 64 and value >> nbits):
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        self._acc |= value << self._nacc
        self._nacc += nbits
        while self._nacc >= 8:
            self._buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nacc -= 8

    def align_to_byte(self) -> None:
        if self._nacc:
            self._buf.append(self._acc & 0xFF)
            self._acc = 0
            self._nacc = 0

    def write_bytes(self, data: bytes) -> None:
        self.align_to_byte()
        self._buf.extend(data)

    def getvalue(self) -> bytes:
        self.align_to_byte()
        return bytes(self._buf)


class BitReader:
    """Reads bits LSB-first from a byte buffer."""

    def __init__(self, data: bytes | bytearray | np.ndarray, start_bit: int = 0) -> None:
        self._data = np.frombuffer(bytes(data), dtype=np.uint8)
        self._pos = start_bit  # absolute bit cursor

    @property
    def bit_position(self) -> int:
        return self._pos

    @property
    def byte_position(self) -> int:
        """Byte index of the next unread bit (rounded up)."""
        return (self._pos + 7) // 8

    def read_bits(self, nbits: int) -> int:
        v = self.peek_bits(nbits)
        self._pos += nbits
        return v

    def peek_bits(self, nbits: int) -> int:
        """Peek up to 32 bits; out-of-range bits read as 0 (like the
        reference, which relies on the host not reading past the end)."""
        byte0 = self._pos >> 3
        shift = self._pos & 7
        acc = 0
        need = shift + nbits
        nbytes = (need + 7) // 8
        for k in range(nbytes):
            idx = byte0 + k
            b = int(self._data[idx]) if idx < len(self._data) else 0
            acc |= b << (8 * k)
        return (acc >> shift) & ((1 << nbits) - 1)

    def align_to_byte(self) -> None:
        self._pos = (self._pos + 7) & ~7

    def read_bytes(self, n: int) -> bytes:
        self.align_to_byte()
        byte0 = self._pos >> 3
        if byte0 + n > len(self._data):
            raise EOFError("read past end of stream")
        self._pos += 8 * n
        return self._data[byte0 : byte0 + n].tobytes()

    @property
    def bits_remaining(self) -> int:
        return 8 * len(self._data) - self._pos
