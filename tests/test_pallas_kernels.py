"""Pallas kernel tests (interpret mode on CPU).

The match kernel must agree exactly with the XLA reference stages
(ops.encode stages 1+2) — same nearest-priority, same extension rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deflate.kernels.match import find_matches_pallas
from tpu_deflate.ops.encode import _extend_matches, _match_candidates_window
from tests.corpora import corpus


def _keys(data: np.ndarray, n: int) -> jnp.ndarray:
    b = jnp.asarray(data).astype(jnp.int32)
    b1 = jnp.concatenate([b[1:], jnp.zeros((1,), jnp.int32)])
    b2 = jnp.concatenate([b[2:], jnp.zeros((2,), jnp.int32)])
    key3 = b | (b1 << 8) | (b2 << 16)
    idx = jnp.arange(b.shape[0], dtype=jnp.int32)
    return jnp.where(idx + 3 <= n, key3, (1 << 24) + idx)


@pytest.mark.parametrize("mode", [0, 1, 3, 6])
@pytest.mark.parametrize("window,maxm", [(32, 10), (32, 5), (64, 10)])
def test_match_kernel_equals_xla(mode, window, maxm):
    N = 4096
    data = np.zeros(N, np.uint8)
    raw = np.frombuffer(corpus(mode, 3500), np.uint8)
    data[: len(raw)] = raw
    n = len(raw)

    key3 = _keys(data, n)
    d_pl, l_pl = find_matches_pallas(
        key3, n, window=window, max_match=maxm, interpret=True
    )

    b = jnp.asarray(data).astype(jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    d_x = _match_candidates_window(key3, window)
    l_x = _extend_matches(b, d_x, jnp.int32(n), maxm)

    d_pl = np.asarray(d_pl)
    l_pl = np.asarray(l_pl)
    d_x = np.asarray(d_x)
    l_x = np.asarray(l_x)

    # compare on positions where both see a valid seed; near the block tail
    # the kernel's key-based extension can be up to 2 bytes shorter (keys
    # need 3 valid bytes) — exclude the last maxm positions of real data
    valid = (np.arange(N) + 3 <= n) & (d_x <= np.arange(N))
    core = valid & (np.arange(N) < n - maxm)
    np.testing.assert_array_equal(d_pl[core], d_x[core])
    np.testing.assert_array_equal(l_pl[core], np.asarray(l_x)[core])


def test_encode_with_pallas_matcher_end_to_end():
    """Full encode path with the Pallas matcher produces valid streams."""
    import zlib

    from tpu_deflate import api
    from tpu_deflate.config import DeflateConfig

    cfg = DeflateConfig(fast=True, chunk_size=4096, use_pallas=True)
    data = b"".join(corpus(m, 3000) for m in [0, 1, 3])
    comp = api.compress(data, cfg)
    assert zlib.decompress(comp) == data
