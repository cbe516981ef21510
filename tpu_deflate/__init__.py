"""tpu-deflate: a TPU-native lossless DEFLATE (RFC 1950/1951/1952) codec.

Brand-new JAX/Pallas reinterpretation of the capabilities of
tomtor/HDL-deflate (an FPGA MyHDL core): zlib-compatible compress and
decompress as data-parallel TPU programs rather than a byte-per-cycle
state machine.

Quick start::

    import tpu_deflate

    comp = tpu_deflate.compress(data)             # valid zlib stream
    out = tpu_deflate.decompress(comp)            # bit-exact round trip

    cfg = tpu_deflate.DeflateConfig(window=32768, max_match=258,
                                    dynamic_encode=True, lazy=True)
    comp = tpu_deflate.compress(data, cfg)
"""

import os as _os

# Persistent XLA compilation cache: first compiles through the TPU tunnel
# run 30s-10min; the cache makes every later process start warm.  Opt out
# with TPU_DEFLATE_NO_COMPILE_CACHE=1 or override via the standard
# JAX_COMPILATION_CACHE_DIR.
if not _os.environ.get("TPU_DEFLATE_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/tpu_deflate_xla"),
    )
    try:
        import jax as _jax

        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from tpu_deflate.api import (
    StreamCompressor,
    compress,
    compress_gzip,
    compress_gzip_members,
    compress_indexed,
    decompress,
    decompress_gzip,
    decompress_indexed,
    StreamDecompressor,
)
from tpu_deflate.ref.inflate import DeflateError
from tpu_deflate.config import (
    DEFAULT,
    DECOMPRESS_ONLY,
    FAST_CONFIG,
    FULL_WINDOW,
    LOWLUT,
    REFERENCE_PARITY,
    DeflateConfig,
)

__version__ = "0.1.0"

__all__ = [
    "DeflateConfig",
    "DeflateError",
    "DEFAULT",
    "DECOMPRESS_ONLY",
    "FAST_CONFIG",
    "FULL_WINDOW",
    "LOWLUT",
    "REFERENCE_PARITY",
    "StreamCompressor",
    "StreamDecompressor",
    "compress",
    "compress_gzip",
    "compress_gzip_members",
    "compress_indexed",
    "decompress",
    "decompress_gzip",
    "decompress_indexed",
    "__version__",
]
