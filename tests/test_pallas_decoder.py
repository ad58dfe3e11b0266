"""Pallas lane-parallel decoder: interpret-mode correctness on CPU.

The Mosaic kernel itself only compiles for a real TPU; interpret mode
executes the identical trace with jnp semantics, so bit-exactness here
pins the kernel logic (the TPU-compiled path is additionally exercised by
bench.py and dev runs on the chip).  Chunks are kept tiny: interpret mode
steps the while-loop in Python.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INNER = r"""
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
from tests.corpus import big_mixed, random_bytes
from lzma_sdk_zliblike_tpu.models.lzma2 import framing
from lzma_sdk_zliblike_tpu.ops import pallas_decode as P

CAP = 384
# mixed text/binary, RLE runs (dist-1 copies), periodic patterns (short
# dists), and incompressible bytes — the copy-phase corner cases
data = (big_mixed(CAP * 40) + b"A" * 700 + bytes(range(7)) * 300
        + random_bytes(CAP * 4, seed=3))
stream, prop = framing.encode(data, dict_size=4096, chunk_size=CAP)
chunks, _ = framing.scan(stream)
groups = framing.split_groups(chunks)
lz = [g for g in groups if len(g) == 1 and g[0].is_lzma]
assert len(lz) >= 8, f"corpus produced too few LZMA groups: {len(lz)}"
S = 8
sel = (lz * ((S // len(lz)) + 1))[:S]
src = np.zeros((S, CAP + 64), np.uint8)
pack = np.zeros(S, np.int32); unpack = np.zeros(S, np.int32)
act = np.zeros(S, np.int32)
exp = []
for i, g in enumerate(sel):
    c = g[0]
    src[i, :c.pack_size] = np.frombuffer(stream, np.uint8, c.pack_size,
                                         c.data_off)
    pack[i] = c.pack_size; unpack[i] = c.unpack_size; act[i] = 1
    exp.append(framing.decode_chunks(stream, g))
out, ok, consumed = P.decode_chunks(src, pack, unpack, act, dic_cap=CAP,
                                    interpret=True)
assert ok.all(), ok
assert (consumed == pack).all()
for i in range(S):
    assert out[i, :unpack[i]].tobytes() == exp[i], f"lane {i} mismatch"
# corrupt one lane: must flag, others unaffected
src[3, 7] ^= 0xFF
out2, ok2, _ = P.decode_chunks(src, pack, unpack, act, dic_cap=CAP,
                               interpret=True)
assert not ok2[3]
for i in range(S):
    if i != 3:
        assert out2[i, :unpack[i]].tobytes() == exp[i]

# end-to-end through the scheduler (engine="pallas"): full stream decode,
# incl. copy-group and fallback routing
import os
os.environ["LZT_PALLAS_INTERPRET"] = "1"
from lzma_sdk_zliblike_tpu.parallel.scheduler import (BatchedLzma2Decoder,
                                                      BatchShape)
dec = BatchedLzma2Decoder(BatchShape(n_lanes=8, pack_cap=CAP + 64,
                                     dic_cap=CAP), engine="pallas")
assert dec.decode(stream, prop) == data
print("PALLAS_INTERPRET_OK", flush=True)
"""


@pytest.mark.slow
def test_pallas_decoder_interpret_cpu():
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if ".axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, "build", "jax_cache"))
    r = subprocess.run([sys.executable, "-c", INNER % {"repo": REPO}],
                       capture_output=True, cwd=REPO, timeout=1800, env=env)
    assert r.returncode == 0, (r.stdout.decode()[-600:]
                               + r.stderr.decode()[-600:])
    assert b"PALLAS_INTERPRET_OK" in r.stdout
