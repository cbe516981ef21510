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
