"""Top-level package surface: exports, CLI, self-test."""

import subprocess
import sys
import zlib

import pytest

from tests.corpora import corpus


def test_package_exports():
    import tpu_deflate

    data = corpus(1, 2000)
    comp = tpu_deflate.compress(data)
    assert zlib.decompress(comp) == data
    assert tpu_deflate.decompress(comp) == data
    assert tpu_deflate.__version__


def test_selftest_passes():
    from tpu_deflate.selftest import run_selftest

    assert run_selftest(verbose=False)


def test_cli_roundtrip(tmp_path):
    import jax

    data = corpus(0, 3000)
    src = tmp_path / "input.bin"
    src.write_bytes(data)
    env = {"PYTHONPATH": "/root/repo", "XLA_FLAGS": "", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/root"}
    # in-process CLI (subprocess would re-init jax; keep it cheap)
    from tpu_deflate.cli import main

    out = tmp_path / "c.zz"
    assert main([str(src), "-o", str(out)]) == 0
    assert zlib.decompress(out.read_bytes()) == data
    dec = tmp_path / "d.bin"
    assert main(["-d", str(out), "-o", str(dec)]) == 0
    assert dec.read_bytes() == data


class TestLargeChunkConfig:
    """BASELINE config 5 shape: 1MB-block data-parallel encode+decode
    (small corpus on CPU; the big-cap XLA expand path)."""

    def test_1mb_chunks_roundtrip(self):
        import zlib

        from tpu_deflate import api
        from tpu_deflate.config import DeflateConfig

        cfg = DeflateConfig(window=256, max_match=10, chunk_size=1 << 20)
        data = (b"block parallel %d " * 999) % tuple(range(999))
        stream, index = api.compress_indexed(data, cfg)
        assert zlib.decompress(stream) == data
        assert api.decompress_indexed(stream, index, cfg) == data

    def test_chunk_larger_than_input(self):
        import zlib

        from tpu_deflate import api
        from tpu_deflate.config import DeflateConfig

        cfg = DeflateConfig(chunk_size=1 << 16)
        data = b"tiny"
        comp = api.compress(data, cfg)
        assert zlib.decompress(comp) == data
        assert api.decompress(comp) == data
