"""Batched lane-parallel decoder: correctness on a CPU device mesh.

Runs in a subprocess with the axon site hook scrubbed (this container
hijacks JAX_PLATFORMS=cpu otherwise).  Covers single-chunk groups, the
multi-chunk state-carry path (reference-produced streams with 48KB
sub-chunks), and copy-chunk routing through the scheduler.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INNER = r"""
import sys
sys.path.insert(0, %(repo)r)
import subprocess
from tests.corpus import big_mixed, random_bytes
from lzma_sdk_zliblike_tpu.models.lzma2 import framing
from lzma_sdk_zliblike_tpu.parallel.scheduler import (BatchedLzma2Decoder,
                                                      BatchShape)

# our parallel encoder: single-chunk groups + copy groups (random data)
data = big_mixed(1 << 18) + random_bytes(1 << 15, seed=9)
stream, prop = framing.encode(data, dict_size=1 << 12, chunk_size=1 << 12)
dec = BatchedLzma2Decoder(BatchShape(n_lanes=32, pack_cap=1 << 12,
                                     dic_cap=1 << 12))
assert dec.decode(stream, prop) == data
print("PARALLEL_GROUPS_OK", flush=True)

# single-stream mode: one group, many chunks with state continuation
data2 = big_mixed(150_000, seed=5)
stream2, prop2 = framing.encode(data2, dict_size=1 << 17,
                                chunk_size=1 << 17, parallel_groups=False)
groups = framing.split_groups(framing.scan(stream2)[0])
assert len(groups) == 1 and len(groups[0]) > 1   # multi-chunk group
dec2 = BatchedLzma2Decoder(BatchShape(n_lanes=8, pack_cap=1 << 16,
                                      dic_cap=1 << 18))
assert dec2.decode(stream2, prop2) == data2
print("MULTICHUNK_OK", flush=True)
"""


@pytest.mark.slow
def test_batched_decoder_cpu_mesh():
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(p for p in env.get("PYTHONPATH", "").split(":")
                                 if ".axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, "build", "jax_cache"))
    r = subprocess.run([sys.executable, "-c", INNER % {"repo": REPO}],
                       capture_output=True, cwd=REPO, timeout=1200)
    assert r.returncode == 0, (r.stdout.decode()[-400:]
                               + r.stderr.decode()[-400:])
    assert b"PARALLEL_GROUPS_OK" in r.stdout
    assert b"MULTICHUNK_OK" in r.stdout
