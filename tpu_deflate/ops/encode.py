"""TPU-native block DEFLATE encoder (jittable, static shapes).

Reinterprets the reference's one-byte-per-cycle encode FSM
(/root/reference/deflate.py:734-1062) as four data-parallel stages that map
onto the VPU:

  1. match-find   — every position's nearest previous 3-byte occurrence,
                    computed for ALL positions at once.  This generalizes
                    the FAST mode's 32 combinational comparators
                    (deflate.py:407-421,979-994) from "whole window per
                    cycle" to "whole block per launch": a windowed compare
                    sweep for reference-parity windows (32/256) and a
                    stable-sort previous-occurrence matcher for the full
                    32 KB RFC window.
  2. extend       — vectorized match extension to max_match (5/10/258),
                    the SEARCHF/SEARCH10 ladder (deflate.py:899-964) across
                    all positions simultaneously.
  3. parse        — greedy LZ77 tokenization.  Sequential by nature
                    (token starts depend on match lengths); solved in
                    O(log N) pointer-doubling rounds instead of O(N) cycles.
  4. bit-pack     — Huffman codes + extra bits for every token, bit offsets
                    by prefix sum, then a scatter-add byte pack.  This
                    replaces the serial put()/outcarry path
                    (deflate.py:535-567,875-880).

Output blocks are bit-exact valid DEFLATE; with ``final=False`` each block
run ends byte-aligned via an empty stored block so independently encoded
chunks concatenate bytewise into one stream (the data-parallel container).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_deflate.config import DeflateConfig
from tpu_deflate.spec import tables as T

# Upper bound on compressed size of one block, bytes: static-tree worst case
# is 9 bits per literal + 3-bit header + 7-bit EOB + stored-block alignment
# tail (5 bytes) + slack.


def max_output_bytes(n: int) -> int:
    return n + (n >> 3) + 64


def _match_candidates_window(key3: jax.Array, window: int) -> jax.Array:
    """Nearest-match distances via windowed compare sweep.

    For every position i, the smallest d in [1, window] with
    key3[i] == key3[i-d], else 0.  Parity with the reference's
    priority-encoded matcher (nearest match wins, deflate.py:985-994).
    """
    N = key3.shape[0]
    kpad = jnp.concatenate([jnp.full((window,), -1, jnp.int32), key3])

    def body(t, best):
        d = window - t  # sweep d = window..1 so the last writer is nearest
        shifted = jax.lax.dynamic_slice(kpad, (window - d,), (N,))
        return jnp.where(key3 == shifted, d, best)

    return jax.lax.fori_loop(0, window, body, jnp.zeros((N,), jnp.int32))


def _match_candidates_sorted(key3: jax.Array, window: int) -> jax.Array:
    """Nearest-match distances via stable sort (full 32 KB window).

    Stable-sorting positions by their exact 24-bit 3-byte key places every
    position next to the previous occurrence of the same string; the gap is
    the nearest match distance.  O(N log N) with no serial hash chains.
    """
    N = key3.shape[0]
    order = jnp.argsort(key3, stable=True)
    prev_pos = jnp.concatenate([jnp.full((1,), -1, jnp.int32), order[:-1]])
    same = jnp.concatenate(
        [jnp.zeros((1,), bool), key3[order[1:]] == key3[order[:-1]]]
    )
    cand = jnp.where(same, prev_pos, -1)
    prev = jnp.zeros((N,), jnp.int32).at[order].set(cand)
    idx = jnp.arange(N, dtype=jnp.int32)
    dist = idx - prev
    return jnp.where((prev >= 0) & (dist <= window), dist, 0)


def _extend_matches(
    b: jax.Array, dist: jax.Array, n, max_match: int
) -> jax.Array:
    """Match lengths for every position given candidate distances.

    b: int32[N] byte values; dist: int32[N] (0 = no candidate).
    Returns length[N] (0 or >= 3).  Overlapping sources (dist < length)
    compare raw input bytes, which is exactly the run-detection the
    reference gets from its off1/off2 handling on the decode side.
    """
    N = b.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    has = dist > 0
    # verify the 3-byte seed (window sweep guarantees it; sort matcher too,
    # since keys are exact 24-bit values) and bounds: match fits in [0, n)
    has = has & (idx + 3 <= n) & (dist <= idx)

    def body(k, carry):
        alive, length = carry
        src = jnp.clip(idx - dist + k, 0, N - 1)
        tgt = jnp.clip(idx + k, 0, N - 1)
        ok = alive & (idx + k < n) & (b[src] == b[tgt])
        return ok, length + ok.astype(jnp.int32)

    alive0 = has
    length0 = jnp.zeros((N,), jnp.int32)
    # bytes 0..2 are already known equal; extend from k=3
    _, ext = jax.lax.fori_loop(
        3, max_match, body, (alive0, length0)
    )
    length = jnp.where(has, 3 + ext, 0)
    return jnp.minimum(length, jnp.maximum(n - idx, 0))


def _greedy_parse(length: jax.Array, n) -> jax.Array:
    """Token-start mask by pointer doubling over next[i] = i + step[i].

    The reference walks this chain one token per FSM visit
    (CSTATIC -> SEARCH -> ... -> CSTATIC); we close it in log2(N) rounds.
    """
    N = length.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    step = jnp.where(length >= 3, length, 1)
    nxt = jnp.minimum(idx + step, N)
    J = jnp.concatenate([nxt, jnp.array([N], jnp.int32)])
    r = jnp.zeros((N + 1,), jnp.int32).at[0].set(1)
    rounds = max(1, int(np.ceil(np.log2(max(N, 2)))) + 1)
    for _ in range(rounds):
        r = jnp.maximum(r, jnp.zeros_like(r).at[J].max(r))
        J = J[J]
    return (r[:N] == 1) & (idx < n)


@functools.partial(
    jax.jit,
    static_argnames=("window", "max_match", "use_sort_matcher", "use_pallas"),
)
def encode_block_bits(
    data: jax.Array,
    n: jax.Array,
    final: jax.Array,
    window: int,
    max_match: int,
    use_sort_matcher: bool,
    use_pallas: bool = False,
):
    """Encode one block: uint8[N] -> (out_bytes uint8[M], out_len, nbits).

    Emits: 3-bit block header (BFINAL=final, BTYPE=static), token codes,
    EOB; when final is false, appends an empty stored block so the output
    ends byte-aligned (bytewise-concatenatable chunks).
    Returns (bytes, byte_len, token_count) — byte_len includes alignment.
    """
    N = data.shape[0]
    M = max_output_bytes(N)
    b = data.astype(jnp.int32)
    n = jnp.asarray(n, jnp.int32)
    final = jnp.asarray(final, bool)
    idx = jnp.arange(N, dtype=jnp.int32)

    # --- stage 1: match candidates --------------------------------------
    b1 = jnp.concatenate([b[1:], jnp.zeros((1,), jnp.int32)])
    b2 = jnp.concatenate([b[2:], jnp.zeros((2,), jnp.int32)])
    key3 = b | (b1 << 8) | (b2 << 16)
    # make positions whose 3-byte window crosses n unique so they never match
    key3 = jnp.where(idx + 3 <= n, key3, (1 << 24) + idx)
    if use_pallas and not use_sort_matcher and N % 128 == 0:
        # fused VMEM kernel for stages 1+2 (the FAST matcher analog)
        from tpu_deflate.kernels.match import find_matches_pallas

        dist, length = find_matches_pallas(
            key3, n, window=window, max_match=max_match
        )
        has = (dist > 0) & (idx + 3 <= n) & (dist <= idx)
        dist = jnp.where(has, dist, 0)
        length = jnp.where(has, length, 0)
        length = jnp.minimum(length, jnp.maximum(n - idx, 0))
    else:
        if use_sort_matcher:
            dist = _match_candidates_sorted(key3, window)
        else:
            dist = _match_candidates_window(key3, window)

        # --- stage 2: extension -----------------------------------------
        length = _extend_matches(b, dist, n, max_match)

    # --- stage 3: greedy parse ------------------------------------------
    start = _greedy_parse(length, n)
    is_match = start & (length >= 3)
    is_lit = start & ~(length >= 3)

    # --- stage 4: per-token emissions -----------------------------------
    lit_code = jnp.asarray(T.STATIC_LITLEN_CODES_REV)
    lit_len = jnp.asarray(T.STATIC_LITLEN_LENGTHS)
    dist_code = jnp.asarray(T.STATIC_DIST_CODES_REV)
    len_to_sym = jnp.asarray(T.LEN_TO_SYM)
    len_to_extra = jnp.asarray(T.LEN_TO_EXTRA)
    len_ebits = jnp.asarray(T.LENGTH_EXTRA_BITS)
    dist_to_sym = jnp.asarray(T.DIST_TO_SYM)
    dist_to_extra = jnp.asarray(T.DIST_TO_EXTRA)
    dist_ebits = jnp.asarray(T.DIST_EXTRA_BITS)

    ln = jnp.clip(length, 0, 258)
    lsym = len_to_sym[ln]  # 0..28
    lit_sym = b
    # emission 0: literal code OR length code + length extra bits
    e0_code = jnp.where(is_lit, lit_code[lit_sym], lit_code[257 + lsym])
    e0_clen = jnp.where(is_lit, lit_len[lit_sym], lit_len[257 + lsym])
    e0_extra = jnp.where(is_match, len_to_extra[ln], 0)
    e0_ebits = jnp.where(is_match, len_ebits[lsym], 0)
    e0_val = e0_code | (e0_extra << e0_clen)
    e0_nb = jnp.where(start, e0_clen + e0_ebits, 0)
    # emission 1: distance code (5 bits static)
    d = jnp.clip(dist, 0, 32768)
    dsym = dist_to_sym[d]
    e1_val = jnp.where(is_match, dist_code[dsym], 0)
    e1_nb = jnp.where(is_match, 5, 0)
    # emission 2: distance extra bits
    e2_val = jnp.where(is_match, dist_to_extra[d], 0)
    e2_nb = jnp.where(is_match, dist_ebits[dsym], 0)

    vals = jnp.stack([e0_val, e1_val, e2_val], axis=1).reshape(-1)
    nbs = jnp.stack([e0_nb, e1_nb, e2_nb], axis=1).reshape(-1)

    # --- bit offsets: header(3) + tokens + EOB(7) -----------------------
    csum = jnp.cumsum(nbs)
    offs = 3 + csum - nbs  # exclusive prefix + header offset
    token_bits = csum[-1]
    eob_off = 3 + token_bits
    total_bits = eob_off + 7  # EOB code for sym 256 is 7 zero bits

    hdr_val = jnp.where(final, jnp.int32(1), jnp.int32(0)) | 2  # BTYPE=01
    all_vals = jnp.concatenate([hdr_val[None], vals, jnp.zeros((1,), jnp.int32)])
    all_nbs = jnp.concatenate([jnp.full((1,), 3, jnp.int32), nbs, jnp.full((1,), 7, jnp.int32)])
    all_offs = jnp.concatenate([jnp.zeros((1,), jnp.int32), offs, eob_off[None]])

    # --- scatter-add byte pack ------------------------------------------
    byte_idx = all_offs >> 3
    shift = all_offs & 7
    v = (all_vals << shift).astype(jnp.int32)  # <= 27 bits, fits int32
    out = jnp.zeros((M,), jnp.int32)
    live = all_nbs > 0
    for k in range(4):
        contrib = jnp.where(live, (v >> (8 * k)) & 0xFF, 0)
        tgt = jnp.clip(byte_idx + k, 0, M - 1)
        out = out.at[tgt].add(contrib)

    # --- tail: byte alignment -------------------------------------------
    # final: pad to byte with zero bits (nothing to write)
    # non-final: 3-bit stored header (000) -> align -> LEN=0 NLEN=FFFF
    final_len = (total_bits + 7) >> 3
    aligned = (total_bits + 3 + 7) >> 3
    out = out.at[jnp.clip(aligned + 2, 0, M - 1)].add(
        jnp.where(final, 0, 0xFF)
    )
    out = out.at[jnp.clip(aligned + 3, 0, M - 1)].add(
        jnp.where(final, 0, 0xFF)
    )
    out_len = jnp.where(final, final_len, aligned + 4)

    # --- stored-block fallback ------------------------------------------
    # Incompressible chunks are emitted as method-0 stored blocks
    # (RFC 1951 3.2.4; the reference decodes these at deflate.py:1603-1626
    # but its encoder cannot emit them — ours picks whichever is smaller).
    out_s, out_len_s = _stored_output(data, n, final, M)
    use_stored = out_len_s < out_len
    out = jnp.where(use_stored, out_s, out)
    out_len = jnp.where(use_stored, out_len_s, out_len)

    ntokens = jnp.sum(start.astype(jnp.int32))
    return out.astype(jnp.uint8), out_len, ntokens


_STORED_MAX = 65535


def _stored_output(data: jax.Array, n: jax.Array, final: jax.Array, M: int):
    """Stored-block encoding of data[:n]: ceil(n/65535) method-0 blocks,
    each 5-byte header + raw bytes; always byte-aligned."""
    N = data.shape[0]
    nblocks = max(1, -(-N // _STORED_MAX))
    # oversized scratch so full-window dynamic_update_slice never clamps
    M_big = max(M, nblocks * (_STORED_MAX + 5) + 8)
    out = jnp.zeros((M_big,), jnp.int32)
    d = data.astype(jnp.int32)
    nb_live = jnp.maximum((n + _STORED_MAX - 1) // _STORED_MAX, 1)
    for sb in range(nblocks):
        off = sb * (_STORED_MAX + 5)
        live = (sb == 0) | (n > sb * _STORED_MAX)
        sb_len = jnp.clip(n - sb * _STORED_MAX, 0, _STORED_MAX)
        is_last = sb + 1 >= nb_live
        hdr = jnp.where(final & is_last, 1, 0)
        nlen = sb_len ^ 0xFFFF
        hdr_vals = jnp.stack(
            [hdr, sb_len & 0xFF, sb_len >> 8, nlen & 0xFF, nlen >> 8]
        )
        hdr_vals = jnp.where(live, hdr_vals, 0)
        out = jax.lax.dynamic_update_slice(out, hdr_vals, (off,))
        seg = jax.lax.dynamic_slice(
            jnp.pad(d, (0, _STORED_MAX)), (sb * _STORED_MAX,), (_STORED_MAX,)
        )
        j = jnp.arange(_STORED_MAX, dtype=jnp.int32)
        seg = jnp.where(live & (j < sb_len), seg, 0)
        out = jax.lax.dynamic_update_slice(out, seg, (off + 5,))
    out_len = nb_live * 5 + n
    return out[:M], out_len


def encode_block(
    data: jax.Array,
    n: jax.Array,
    final: jax.Array,
    config: DeflateConfig = DeflateConfig(),
):
    """Config-driven wrapper choosing the matcher strategy."""
    use_sort = config.window > 256
    return encode_block_bits(
        data,
        n,
        final,
        window=config.window,
        max_match=config.max_match,
        use_sort_matcher=use_sort,
        use_pallas=config.use_pallas,
    )


def encode_blocks_batch(data, lengths, finals, config: DeflateConfig = DeflateConfig()):
    """vmapped multi-block encode: data uint8[B, N]."""
    use_sort = config.window > 256
    f = functools.partial(
        encode_block_bits,
        window=config.window,
        max_match=config.max_match,
        use_sort_matcher=use_sort,
        use_pallas=config.use_pallas,
    )
    return jax.vmap(f)(data, lengths, finals)
