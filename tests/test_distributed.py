"""Multi-process (N≥2 "hosts") decode over jax.distributed.

Runs a real 2-process CPU cluster (Gloo collectives) with the lane axis
sharded over the global mesh — the single-machine stand-in for the
N-host pod config (BASELINE config 5).
"""

import shutil
import sys

import pytest

from lzma_sdk_zliblike_tpu.parallel.distributed import run_local_cluster

INNER = r"""
import sys
sys.path.insert(0, %(repo)r)
from lzma_sdk_zliblike_tpu.parallel import distributed as D
D.initialize()
import jax
from lzma_sdk_zliblike_tpu.models.lzma2 import framing
from tests.corpus import big_mixed
# small shapes: the interpret-mode kernel steps its while-loop on CPU,
# so per-lane data size directly multiplies test wall-clock (the v14
# multilit kernel traced ~1.5x more ops and pushed the old 64 KB-per-
# lane shape past the CI budget).  parallel_groups=False yields ONE
# 4-chunk state-carry group (multi-chunk kernel path) at 32 KB/lane.
data = big_mixed(1 << 15)
stream, prop = framing.encode(data, dict_size=1<<14, chunk_size=1<<13,
                              parallel_groups=False, engine="native")
groups = framing.split_groups(framing.scan(stream)[0])
assert max(len(g) for g in groups) >= 2, [len(g) for g in groups]
out = D.decode_groups_distributed(stream, dict_prop=prop, lanes_per_device=2,
                                  pack_cap=1<<14, dic_cap=1<<15)
if jax.process_index() == 0:
    assert out == data
    print("DIST_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_decode():
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rs = run_local_cluster(2, INNER % {"repo": repo}, devices_per_proc=2,
                           timeout=1200)
    for r in rs:
        assert r.returncode == 0, r.stdout.decode()[-500:]
    assert b"DIST_OK" in rs[0].stdout


INNER_RT = r"""
import sys
sys.path.insert(0, %(repo)r)
from lzma_sdk_zliblike_tpu.parallel import distributed as D
D.initialize()
import jax
from lzma_sdk_zliblike_tpu.parallel.host_pool import encode_lzma2_mt
from tests.corpus import big_mixed
# small blocks: the decode leg runs the interpret-mode kernel on CPU,
# where per-lane data size directly multiplies wall-clock
data = big_mixed(1 << 17, seed=5)
# distributed encode: blocks sharded over both processes, ordered gather
stream, prop = D.encode_groups_distributed(data, dict_size=1<<14,
                                           chunk_size=1<<14)
# byte-identical to the single-host MT encoder (cluster size must not
# change the stream)
ref, rprop = encode_lzma2_mt(data, dict_size=1<<14, chunk_size=1<<14)
assert prop == rprop and stream == ref, (len(stream), len(ref))
# full round trip through the distributed decoder on the same cluster
out = D.decode_groups_distributed(stream, dict_prop=prop,
                                  lanes_per_device=2,
                                  pack_cap=1<<15, dic_cap=1<<14)
if jax.process_index() == 0:
    assert out == data
    print("DIST_RT_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_roundtrip():
    """Distributed ENCODE (MtCoder block sharding over the cluster) +
    distributed decode of the produced stream: BASELINE's round-trip
    north star needs both directions sharded (MtCoder.c:272-327)."""
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rs = run_local_cluster(2, INNER_RT % {"repo": repo}, devices_per_proc=2,
                           timeout=1200)
    for r in rs:
        assert r.returncode == 0, r.stdout.decode()[-500:]
    assert b"DIST_RT_OK" in rs[0].stdout
