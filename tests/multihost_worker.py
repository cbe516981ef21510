"""Worker process for the two-process multihost test.

Run as: python multihost_worker.py <process_id> <num_processes> <port>
Each process owns 4 virtual CPU devices; jax.distributed joins them into
one 8-device global mesh spanning 2 processes — the pod-slice bootstrap
(parallel/multihost.py) exercised for real, not just no-op-tested.
Exits 0 and prints MULTIHOST_OK on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["NUM_PROCESSES"] = str(nproc)
os.environ["PROCESS_ID"] = str(pid)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tpu_deflate.config import DeflateConfig  # noqa: E402
from tpu_deflate.parallel import multihost  # noqa: E402
from tpu_deflate.parallel.shard import encode_sharded  # noqa: E402

assert multihost.initialize(), "distributed init did not run"
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()

mesh = multihost.global_mesh()
cfg = DeflateConfig(window=256, max_match=10, chunk_size=4096)
chunk = cfg.chunk_size
nchunks = 8

rng = np.random.default_rng(1951)  # same corpus on every process
raw = (
    b"multihost pod-slice deflate " * 900
    + bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
)[: nchunks * chunk]
chunks = np.frombuffer(raw, np.uint8).reshape(nchunks, chunk)
lengths = np.full(nchunks, chunk, np.int32)
finals = np.zeros(nchunks, bool)
finals[-1] = True

# each process materializes ONLY its shard of the batch
lo, hi = multihost.host_shard_bounds(nchunks)
gdata = multihost.make_global_batch(chunks[lo:hi], nchunks, mesh)
glens = multihost.make_global_batch(lengths[lo:hi], nchunks, mesh)
gfin = multihost.make_global_batch(finals[lo:hi], nchunks, mesh)

out, sizes, adler = encode_sharded(gdata, glens, gfin, mesh, cfg)

# every process sees the replicated adler; assemble + verify on process 0
import zlib

sizes_h = np.asarray(jax.experimental.multihost_utils.process_allgather(
    sizes, tiled=True))
out_h = np.asarray(jax.experimental.multihost_utils.process_allgather(
    out, tiled=True))
if pid == 0:
    body = b"".join(out_h[i, : sizes_h[i]].tobytes() for i in range(nchunks))
    stream = b"\x78\x9c" + body + int(adler).to_bytes(4, "big")
    assert zlib.decompress(stream) == raw, "multihost round-trip failed"
    assert int(adler) == zlib.adler32(raw), "adler fold mismatch"
print(f"MULTIHOST_OK p{pid}", flush=True)
