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

# multi-chunk groups through the in-kernel chunk loop (Lzma2Dec.c:14-26):
# 4 state-carry sub-chunks sharing one dictionary, one mid-group state
# reset; decoded both via submit_groups directly and via the scheduler
from lzma_sdk_zliblike_tpu.models.lzma.spec import LzmaProps
from lzma_sdk_zliblike_tpu.models.lzma.encoder_ref import LzmaEncoder
P2 = LzmaProps(lc=3, lp=0, pb=2, dict_size=4096)
gdata = big_mixed(1408) + b"B" * 128
segs = [(0, 384), (384, 768), (768, 1152), (1152, 1536)]
enc2 = LzmaEncoder(P2)
mc = bytearray()
pe1 = []; ue1 = []; fl1 = []; bodies = bytearray()
for i, (a, b) in enumerate(segs):
    if i == 0:
        mode = framing.MODE_STATE_PROPS_DIC
    elif i == 2:
        enc2.reset_state()
        mode = framing.MODE_STATE
    else:
        mode = framing.MODE_NOTHING
    body = enc2.encode_segment(gdata, a, b, dic_start=0)
    assert len(body) < b - a, "segment must compress for an LZMA chunk"
    mc += framing._chunk_header(True, mode, b - a, len(body), P2, i == 0)
    mc += body
    bodies += body
    pe1.append(len(bodies)); ue1.append(b)
    fl1.append(1 | (2 if (i > 0 and mode >= framing.MODE_STATE) else 0))
mc.append(framing.CTRL_EOS)
mstream = bytes(mc)
mch, _ = framing.scan(mstream)
mgroups = framing.split_groups(mch)
assert [len(g) for g in mgroups] == [4]
assert framing.decode_chunks(mstream, mch) == gdata  # host path agrees
src3 = np.zeros((8, 2048), np.uint8)
src3[0, :len(bodies)] = np.frombuffer(bytes(bodies), np.uint8)
src3[1, :len(bodies)] = np.frombuffer(bytes(bodies), np.uint8)
src3[1, pe1[1] + 3] ^= 0xFF      # corrupt lane 1 inside chunk 2
pe3 = np.zeros((8, 4), np.int32); pe3[:2] = pe1
ue3 = np.zeros((8, 4), np.int32); ue3[:2] = ue1
fl3 = np.zeros((8, 4), np.int32); fl3[:2] = fl1
act3 = np.zeros(8, np.int32); act3[:2] = 1
out3, ok3, cons3 = P.finalize_chunks(
    P.submit_groups(src3, pe3, ue3, fl3, act3, dic_cap=1536,
                    interpret=True), dic_cap=1536)
assert ok3[0] and not ok3[1], ok3
assert cons3[0] == len(bodies)
assert out3[0, :1536].tobytes() == gdata
dec2 = BatchedLzma2Decoder(BatchShape(n_lanes=8, pack_cap=2048,
                                      dic_cap=2048), engine="pallas")
assert dec2.decode(mstream, prop) == gdata

# uncompressed copy chunks IN-KERNEL (phase 0.5 mover): compressible |
# incompressible | compressible produces mixed LZMA/copy groups via the
# encoder's copy fallback; the whole stream must decode on the pallas path
data4 = (big_mixed(CAP * 6) + random_bytes(CAP * 8, seed=9)
         + big_mixed(CAP * 6, seed=5))
# parallel_groups=False: ONE dict-sharing group whose incompressible
# middle falls back to copy chunks between LZMA chunks
stream4, prop4 = framing.encode(data4, dict_size=16384, chunk_size=CAP,
                                parallel_groups=False)
ch4, _ = framing.scan(stream4)
g4 = framing.split_groups(ch4)
cap4 = max(sum(c.unpack_size for c in g) for g in g4)
pk4 = max(sum(c.pack_size for c in g) for g in g4)
dec4 = BatchedLzma2Decoder(
    BatchShape(n_lanes=8, pack_cap=pk4 + 64, dic_cap=cap4),
    engine="pallas")
mixed = [g for g in g4 if any(c.is_lzma for c in g)
         and any(not c.is_lzma for c in g) and dec4._eligible(g)]
assert mixed, ("corpus produced no mixed LZMA/copy group",
               [[c.is_lzma for c in g] for g in g4])
assert dec4.decode(stream4, prop4) == data4
print("PALLAS_INTERPRET_OK", flush=True)
"""


def test_multi_group_lanes_interpret():
    """K dict-reset groups packed per lane (kernel flags bit3): the
    scheduler's multi-group batching decodes bit-exactly and a corrupt
    group still fails alone (host retry raises for it)."""
    import numpy as np  # noqa: F401
    from tests.corpus import big_mixed, random_bytes
    from lzma_sdk_zliblike_tpu.models.lzma2 import framing
    from lzma_sdk_zliblike_tpu.parallel.scheduler import (
        BatchedLzma2Decoder, BatchShape)
    from lzma_sdk_zliblike_tpu.utils.errors import DataError
    os.environ["LZT_PALLAS_INTERPRET"] = "1"

    chunk = 4 << 10
    data = (big_mixed(17 * chunk) + random_bytes(chunk, seed=4)
            + big_mixed(2 * chunk, seed=7))
    stream, prop = framing.encode(data, dict_size=chunk, chunk_size=chunk)
    groups = framing.split_groups(framing.scan(stream)[0])
    assert len(groups) > 8, len(groups)   # forces multi-group packing
    dec = BatchedLzma2Decoder(
        BatchShape(n_lanes=8, pack_cap=chunk + 2048, dic_cap=chunk),
        engine="pallas")
    if dec._multi_k(groups, list(range(len(groups)))) < 2:
        pytest.skip("default kernel tune lacks chunkflow")
    assert dec.decode(stream, prop) == data
    from lzma_sdk_zliblike_tpu.utils.trace import TRACE
    assert TRACE.snapshot().get("scheduler.pallas_multi_batches", 0) > 0

    bad = bytearray(stream)
    g3 = groups[3][0]
    bad[g3.data_off + g3.pack_size // 2] ^= 0x55
    with pytest.raises(DataError):
        dec.decode(bytes(bad), prop)


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


@pytest.mark.slow
def test_multilit_kernel_on_chip():
    """Bit-exactness of the DEFAULT (multilit) tune, on real hardware.

    The multilit trace is ~2x the light tune's ops; its interpret-mode
    XLA-CPU compile runs 25+ min even at opt level 0, so CI pins the
    light tune (conftest) and this test covers the default tune whenever
    a TPU-class platform is reachable (the tunneled axon chip in this
    container executes tools/mlit_check.py in under a minute).  Without
    hardware the same check is `make test-tpu` on a chip host.
    """
    axon = "/root/.axon_site"
    if not os.path.isdir(axon):
        pytest.skip("no TPU-class platform available (no axon site hook)")
    env = dict(os.environ)
    env["PYTHONPATH"] = axon + ":" + REPO
    env.pop("JAX_PLATFORMS", None)      # let the site hook pick the chip
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, "build", "jax_cache"))
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "mlit_check.py"),
             "pprev,stage2,chunkflow,mlit,litrow"],
            capture_output=True, cwd=REPO, timeout=900, env=env)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU platform unreachable (mlit check timed out)")
    if r.returncode != 0 and b"MLIT_CHECK_OK" not in r.stdout:
        tail = (r.stdout.decode()[-400:] + r.stderr.decode()[-400:])
        if b"axon" in r.stderr or b"RuntimeError: Unable to initialize" in r.stderr:
            pytest.skip(f"TPU platform failed to initialize: {tail}")
        raise AssertionError(tail)
    assert b"MLIT_CHECK_OK" in r.stdout
