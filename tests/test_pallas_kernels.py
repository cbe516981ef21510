"""Pallas kernel tests (interpret mode on CPU).

Every kernel must agree exactly with its XLA reference stage — same
nearest-priority, same extension rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.corpora import corpus


def test_encode_fast_config_end_to_end():
    """Full encode path at the FAST preset produces valid streams (the
    batched Pallas bitplane matcher runs on TPU; XLA bitplane on CPU)."""
    import zlib

    from tpu_deflate import api
    from tpu_deflate.config import DeflateConfig

    cfg = DeflateConfig(fast=True, chunk_size=4096)
    data = b"".join(corpus(m, 3000) for m in [0, 1, 3])
    comp = api.compress(data, cfg)
    assert zlib.decompress(comp) == data


# ---------------------------------------------------------------------------
# Fused expand kernel (kernels/expand.py, interpret mode)
# ---------------------------------------------------------------------------


def _ref_expand(tokens, out_cap):
    """Numpy reference: sequential token expansion."""
    out = np.zeros(out_cap, np.uint8)
    pos = 0
    for kind, a, b in tokens:
        if kind == 0:  # literal
            out[pos] = a
            pos += 1
        else:  # match: copy a bytes from distance b (byte-at-a-time)
            for _ in range(a):
                out[pos] = out[pos - b]
                pos += 1
    return out, pos


def _random_tokens(rng, target_bytes, max_match=258, max_dist=2048):
    toks = []
    pos = 0
    while pos < target_bytes:
        if pos >= 3 and rng.random() < 0.45:
            ln = int(rng.integers(3, min(max_match, target_bytes - pos + 3) + 1))
            d = int(rng.integers(1, min(max_dist, pos) + 1))
            toks.append((1, ln, d))
            pos += ln
        else:
            toks.append((0, int(rng.integers(0, 256)), 0))
            pos += 1
    return toks


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_expand_fused_matches_reference(seed):
    from tpu_deflate.kernels.expand import OTILE, expand_fused

    rng = np.random.default_rng(seed)
    out_cap = 4 * OTILE
    B = 2
    K = out_cap + 16
    offs = np.zeros((B, K), np.int32)
    c1s = np.zeros((B, K), np.int32)
    tbs = np.zeros((B, K), np.int32)
    tps = np.zeros(B, np.int32)
    tots = np.zeros(B, np.int32)
    refs = []
    for b in range(B):
        toks = _random_tokens(rng, out_cap - int(rng.integers(0, 900)))
        ref, total = _ref_expand(toks, out_cap)
        refs.append(ref)
        tps[b] = len(toks)
        tots[b] = total
        pos = 0
        for e, (kind, a, d) in enumerate(toks):
            offs[b, e] = pos
            c1s[b, e] = (kind << 9) | (a if kind == 0 else a & 0x1FF)
            tbs[b, e] = d
            pos += 1 if kind == 0 else a
        offs[b, len(toks):] = total
    # NOTE: match lengths > 511 don't fit c1's 9-bit ta field; the token
    # generator caps at 258 (the RFC max), which fits.
    out = expand_fused(
        jnp.asarray(offs), jnp.asarray(c1s), jnp.asarray(tbs),
        jnp.asarray(tps), jnp.asarray(tots), out_cap=out_cap, interpret=True,
    )
    out = np.asarray(out).astype(np.uint8)
    for b in range(B):
        np.testing.assert_array_equal(out[b, : tots[b]], refs[b][: tots[b]])


def test_expand_fused_overlap_runs():
    """dist<len runs (the off1/off2 cases) and cross-tile references."""
    from tpu_deflate.kernels.expand import OTILE, expand_fused

    out_cap = 4 * OTILE
    toks = [(0, 65, 0), (0, 66, 0), (1, 258, 1), (1, 258, 2), (1, 100, 3)]
    # long dist-1 run crossing the tile boundary (ta holds 9 bits, so the
    # run is a chain of RFC-max 258-byte matches, exactly as tokenize emits)
    toks += [(0, 67, 0)] + [(1, 258, 1)] * ((OTILE + 300) // 258 + 1)
    toks += [(1, 258, OTILE // 2)]
    ref, total = _ref_expand(toks, out_cap)
    K = 128
    offs = np.full((1, K), 0, np.int32)
    c1s = np.zeros((1, K), np.int32)
    tbs = np.zeros((1, K), np.int32)
    pos = 0
    for e, (kind, a, d) in enumerate(toks):
        offs[0, e] = pos
        c1s[0, e] = (kind << 9) | (a & 0x1FF)
        tbs[0, e] = d
        pos += 1 if kind == 0 else a
    offs[0, len(toks):] = total
    out = expand_fused(
        jnp.asarray(offs), jnp.asarray(c1s), jnp.asarray(tbs),
        jnp.asarray([len(toks)], np.int32), jnp.asarray([total], np.int32),
        out_cap=out_cap, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out)[0, :total].astype(np.uint8), ref[:total])


# ---------------------------------------------------------------------------
# Monotone compaction kernel (kernels/monotone.py mono_compact)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_mono_compact_matches_scatter(seed):
    from tpu_deflate.kernels.monotone import mono_compact

    rng = np.random.default_rng(seed)
    K, size = 6144, 4096
    live = rng.random(K) < 0.3
    rank = np.cumsum(live) - live
    idx = np.where(live, rank, size).astype(np.int32)  # dead interleaved
    vals = np.stack(
        [
            np.where(live, rng.integers(0, 1 << 14, K), 0),
            np.where(live, rng.integers(0, 1 << 14, K), 0),
        ]
    ).astype(np.int32)
    got = np.asarray(
        mono_compact(jnp.asarray(idx), jnp.asarray(vals), size, interpret=True)
    )
    exp = np.zeros((2, size), np.int32)
    for c in range(2):
        np.add.at(exp[c], idx[live], vals[c][live])
    np.testing.assert_array_equal(got, exp)


def test_mono_compact_all_dead_slabs():
    """Deterministic coverage of the has_live skip branch: live entries
    confined to slab 0, slabs 1 and 2 (including the tail slab) entirely
    dead, with a dead idx exactly at the size boundary.  The skip must be
    behavior-preserving even for dead entries carrying NONZERO values,
    which land at out index >= size and fall to the [:size] trim."""
    from tpu_deflate.kernels.monotone import CSLAB, mono_compact

    K, size = 3 * CSLAB, 4096
    nlive = 100
    idx = np.full(K, size, np.int32)
    idx[:nlive] = np.arange(nlive, dtype=np.int32)  # live: slab 0 only
    idx[nlive] = size  # dead exactly at the size boundary
    idx[CSLAB:] = size + np.arange(2 * CSLAB, dtype=np.int32) % 7
    rng = np.random.default_rng(3)
    vals = rng.integers(1, 1 << 14, (2, K)).astype(np.int32)  # dead != 0
    got = np.asarray(
        mono_compact(jnp.asarray(idx), jnp.asarray(vals), size, interpret=True)
    )
    exp = np.zeros((2, size), np.int32)
    for c in range(2):
        np.add.at(exp[c], idx[:nlive], vals[c][:nlive])
    np.testing.assert_array_equal(got, exp)


# ---------------------------------------------------------------------------
# Batched bitplane matcher kernel (kernels/match2.py, interpret mode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", [0, 1, 3, 6])
@pytest.mark.parametrize("window,maxm", [(32, 10), (256, 10), (256, 5)])
def test_match2_kernel_equals_xla_bitplane(mode, window, maxm):
    from tpu_deflate.kernels.match2 import match_bitplane_batch
    from tpu_deflate.ops.encode import _match_extend_bitplane

    N = 4096
    raw = np.frombuffer(corpus(mode, 3500), np.uint8)
    data = np.zeros((2, N), np.uint8)
    data[0, : len(raw)] = raw
    data[1, : len(raw)] = raw[::-1]
    ns = jnp.asarray([len(raw), len(raw) - 7], jnp.int32)
    d1, l1 = match_bitplane_batch(
        jnp.asarray(data), ns, window, maxm, interpret=True
    )
    for lane in range(2):
        d0, l0 = _match_extend_bitplane(
            jnp.asarray(data[lane]).astype(jnp.int32), ns[lane], window, maxm
        )
        np.testing.assert_array_equal(np.asarray(d1)[lane], np.asarray(d0))
        np.testing.assert_array_equal(np.asarray(l1)[lane], np.asarray(l0))


# ---------------------------------------------------------------------------
# Single-lane hierarchical chase (kernels/chase1.py, interpret mode)
# ---------------------------------------------------------------------------


def test_visited_from_adv_matches_chase_reach():
    from tpu_deflate.kernels.chase1 import visited_from_adv
    from tpu_deflate.ops.decode import chase_reach

    rng = np.random.default_rng(0)
    T = 128
    P = 64 * T
    for _ in range(3):
        adv = rng.integers(1, 15, P).astype(np.int32)
        term = rng.random(P) < 0.002
        ref = np.asarray(chase_reach(jnp.asarray(adv), jnp.asarray(term), P))
        advT = jnp.asarray(adv.reshape(T, 64).T.copy())
        termT = jnp.asarray(term.reshape(T, 64).T.astype(np.int32).copy())
        vis = np.asarray(
            visited_from_adv(advT, termT, jnp.int32(0), interpret=True)
        )
        np.testing.assert_array_equal(vis.T.reshape(-1) != 0, ref)


def test_ent_from_phi_matches_python_walk():
    from tpu_deflate.kernels.chase1 import ent_from_phi

    rng = np.random.default_rng(3)
    T2 = 256
    P2 = 64 * T2
    adv = rng.integers(1, 48, P2).astype(np.int32)
    term = rng.random(P2) < 0.001
    m0 = np.where(term, 255, (np.arange(P2) % 64) + adv)
    # python reference: chase from phase 5, record entry phase per tile
    ent_ref = np.full(T2, -1, np.int64)
    p = 5
    while p < P2:
        t, j = divmod(p, 64)
        if ent_ref[t] < 0:
            ent_ref[t] = j
        if term[p]:
            break
        p = p + adv[p]
    last_t = p // 64
    # build packed per-tile transfer maps exactly as K1d does
    m = m0.reshape(T2, 64).T.astype(np.int64).copy()
    for _ in range(6):
        nm = m.copy()
        for e in range(64):
            idx = m[e]
            ok = (idx >= 0) & (idx < 64)
            nm[e] = np.where(
                ok, m[np.clip(idx, 0, 63), np.arange(T2)], idx
            )
        m = nm
    phi = np.where(m >= 128, 191, m - 64)
    phiP = np.zeros((1, 16, T2), np.int32)
    for g in range(16):
        packed = (
            phi[4 * g] | (phi[4 * g + 1] << 8) | (phi[4 * g + 2] << 16)
            | (phi[4 * g + 3] << 24)
        )
        phiP[0, g] = packed.astype(np.uint32).astype(np.int64).astype(np.int32)
    ent = np.asarray(
        ent_from_phi(jnp.asarray(phiP), jnp.int32(5), interpret=True)
    )[0, 0]
    assert ent[0] == 5
    for t in range(T2):
        if ent_ref[t] >= 0:
            assert ent[t] == ent_ref[t], (t, ent[t], ent_ref[t])
        elif t > last_t:
            assert ent[t] == -1, (t, ent[t])
