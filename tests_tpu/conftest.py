"""TPU-compiled test lane: runs kernel parity on REAL hardware.

tests/ forces a virtual CPU mesh (Pallas kernels only ever interpret
there); a Mosaic regression would pass that suite and break the bench.
This lane compiles the kernels for the real chip.  Skipped wholesale
when no TPU is attached.  Run: python -m pytest tests_tpu/ -q
"""

import numpy as np
import pytest


def _tpu_available():
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if not _tpu_available():
        skip = pytest.mark.skip(reason="no TPU attached")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1951)
