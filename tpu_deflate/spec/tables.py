"""RFC 1951 constant tables, generated programmatically (never copied).

Behavioral parity targets in the reference (tomtor/HDL-deflate):
  - CodeLengthOrder / CopyLength / ExtraLengthBits / CopyDistance /
    ExtraDistanceBits: /root/reference/deflate.py:97-110
  - static literal/length ENCODE table (``out_codes``):
    /root/reference/deflate.py:112-149
  - static DECODE table (``stat_leaves``, 512-entry 9-bit instant lookup):
    /root/reference/deflate.py:151-216

Everything here is derived from the RFC 1951 rules (section 3.2.5/3.2.6):
bases are cumulative sums of ``1 << extra_bits`` and the static Huffman code
assignment follows the canonical-code construction, so no table literals are
transcribed from the reference.
"""

from __future__ import annotations

import numpy as np

from tpu_deflate.spec.huffman import canonical_codes, reverse_bits

# ---------------------------------------------------------------------------
# RFC 1951 section 3.2.7: order in which code-length-code lengths appear in a
# dynamic block header.
# ---------------------------------------------------------------------------
CODE_LENGTH_ORDER = np.array(
    [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15],
    dtype=np.int32,
)

# ---------------------------------------------------------------------------
# RFC 1951 section 3.2.5: length codes 257..285 (index 0..28 here).
# Base lengths are the cumulative sums of 1 << extra_bits starting at 3;
# the final code (285) is the special case "length 258, 0 extra bits".
# ---------------------------------------------------------------------------
LENGTH_EXTRA_BITS = np.array(
    [0] * 8 + [1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5] + [0],
    dtype=np.int32,
)
_len_base = np.empty(29, dtype=np.int32)
_len_base[0] = 3
for _i in range(28):
    _len_base[_i + 1] = _len_base[_i] + (1 << LENGTH_EXTRA_BITS[_i])
_len_base[28] = 258  # RFC: code 285 means exactly 258
LENGTH_BASE = _len_base

# RFC 1951 section 3.2.5: distance codes 0..29.
DIST_EXTRA_BITS = np.array(
    [max(0, (_i // 2) - 1) for _i in range(30)], dtype=np.int32
)
_dist_base = np.empty(30, dtype=np.int32)
_dist_base[0] = 1
for _i in range(29):
    _dist_base[_i + 1] = _dist_base[_i] + (1 << DIST_EXTRA_BITS[_i])
DIST_BASE = _dist_base

MAX_MATCH = 258
MIN_MATCH = 3
MAX_DISTANCE = 32768
WINDOW_SIZE = 32768

# ---------------------------------------------------------------------------
# Inverse maps: length (3..258) -> symbol index 0..28 / extra value,
# distance (1..32768) -> symbol 0..29 / extra value.  These drive the
# length/distance ENCODER (reference: DISTANCE state, deflate.py:836-882,
# which does the same bucket search one entry per cycle).
# ---------------------------------------------------------------------------
_lens = np.arange(3, MAX_MATCH + 1, dtype=np.int32)
LEN_TO_SYM = np.zeros(MAX_MATCH + 1, dtype=np.int32)  # index by raw length
LEN_TO_SYM[3:] = np.searchsorted(LENGTH_BASE, _lens, side="right") - 1
# length 258 must map to the special code 28 (sym 285), not bucket 27+4 extra
LEN_TO_SYM[258] = 28
LEN_TO_EXTRA = np.zeros(MAX_MATCH + 1, dtype=np.int32)
LEN_TO_EXTRA[3:] = _lens - LENGTH_BASE[LEN_TO_SYM[3:]]

_dists = np.arange(1, MAX_DISTANCE + 1, dtype=np.int32)
DIST_TO_SYM = np.zeros(MAX_DISTANCE + 1, dtype=np.int32)
DIST_TO_SYM[1:] = np.searchsorted(DIST_BASE, _dists, side="right") - 1
DIST_TO_EXTRA = np.zeros(MAX_DISTANCE + 1, dtype=np.int32)
DIST_TO_EXTRA[1:] = _dists - DIST_BASE[DIST_TO_SYM[1:]]

# ---------------------------------------------------------------------------
# RFC 1951 section 3.2.6: the fixed (static) Huffman trees.
#   literal/length: syms 0-143 -> 8 bits, 144-255 -> 9, 256-279 -> 7,
#                   280-287 -> 8;  distance: 32 syms, all 5 bits.
# Codes are canonical; DEFLATE transmits Huffman codes MSB-first while the
# byte stream packs LSB-first, so we precompute bit-REVERSED codes that an
# LSB-first writer can emit directly (reference pre-reverses the same way,
# deflate.py:112-149 and rev_bits deflate.py:569-584).
# ---------------------------------------------------------------------------
STATIC_LITLEN_LENGTHS = np.array(
    [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8, dtype=np.int32
)
STATIC_LITLEN_CODES = canonical_codes(STATIC_LITLEN_LENGTHS)
STATIC_LITLEN_CODES_REV = np.array(
    [
        reverse_bits(int(c), int(n)) if n else 0
        for c, n in zip(STATIC_LITLEN_CODES, STATIC_LITLEN_LENGTHS)
    ],
    dtype=np.int32,
)

STATIC_DIST_LENGTHS = np.full(32, 5, dtype=np.int32)
STATIC_DIST_CODES = canonical_codes(STATIC_DIST_LENGTHS)
STATIC_DIST_CODES_REV = np.array(
    [reverse_bits(int(c), 5) for c in STATIC_DIST_CODES], dtype=np.int32
)
