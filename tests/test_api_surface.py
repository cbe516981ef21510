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


class TestConfigFlagWiring:
    """The DYNAMIC / ONEBLOCK / LOWLUT elaboration flags must change the
    compiled decode program, not just validate (reference
    deflate.py:21,25,28,275-286,415-421)."""

    def test_lowlut_decodes_static_stream(self):
        from tpu_deflate import api
        from tpu_deflate.config import LOWLUT, REFERENCE_PARITY

        data = corpus(1, 5000)
        comp = api.compress(data, REFERENCE_PARITY)  # static/stored blocks
        assert api.decompress(comp, LOWLUT) == data

    @pytest.mark.parametrize("preset", ["lowlut", "no_dynamic"])
    def test_dynamic_block_rejected(self, preset):
        from tpu_deflate import api
        from tpu_deflate.config import LOWLUT, DeflateConfig
        from tpu_deflate.ref.inflate import DeflateError

        cfg = (
            LOWLUT
            if preset == "lowlut"
            else DeflateConfig(compress=False, dynamic=False, match10=False)
        )
        data = corpus(1, 20000)
        comp = zlib.compress(data, 9)  # dynamic-tree blocks
        assert zlib.decompress(comp) == data
        with pytest.raises(DeflateError, match="dynamic"):
            api.decompress(comp, cfg)
        # the full decoder still accepts the same stream
        assert api.decompress(comp) == data

    def test_one_block_encode_single_block(self):
        from tpu_deflate import api
        from tpu_deflate.config import DeflateConfig

        cfg = DeflateConfig(one_block=True, chunk_size=4096)
        data = corpus(1, 30000)  # spans >1 default chunk
        comp = api.compress(data, cfg)
        assert zlib.decompress(comp) == data
        # single block: BFINAL set in the very first block header bit
        assert comp[2] & 1 == 1
        assert api.decompress(comp, cfg) == data

    def test_one_block_decode_stops_after_first_block(self):
        from tpu_deflate.ops.decode import inflate_device
        from tpu_deflate.ref.deflate import zlib_compress
        from tpu_deflate.config import DeflateConfig

        # two-chunk stream -> two DEFLATE blocks
        from tpu_deflate import api

        cfg2 = DeflateConfig(chunk_size=2048)
        data = corpus(3, 4096)
        comp = api.compress(data, cfg2)
        out, total, _pos = inflate_device(comp, start_bit=16, one_block=True)
        assert bytes(out[:total]) == data[:2048]  # first block only
