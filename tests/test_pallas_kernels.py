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
