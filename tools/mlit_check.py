"""Quick interpret-mode bit-exactness check for the mlit kernel variant.

Usage: JAX_PLATFORMS=cpu python tools/mlit_check.py [tune]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jax_cache"))
os.environ["LZT_TUNE"] = (sys.argv[1] if len(sys.argv) > 1
                          else "pprev,stage2,chunkflow,mlit")

import numpy as np  # noqa: E402

from tests.corpus import big_mixed, random_bytes  # noqa: E402
from lzma_sdk_zliblike_tpu.models.lzma2 import framing  # noqa: E402
from lzma_sdk_zliblike_tpu.ops import pallas_decode as P  # noqa: E402

CAP = 384
data = (big_mixed(CAP * 40) + b"A" * 700 + bytes(range(7)) * 300
        + random_bytes(CAP * 4, seed=3))
stream, prop = framing.encode(data, dict_size=4096, chunk_size=CAP)
chunks, _ = framing.scan(stream)
groups = framing.split_groups(chunks)
lz = [g for g in groups if len(g) == 1 and g[0].is_lzma]
S = 8
sel = (lz * ((S // len(lz)) + 1))[:S]
src = np.zeros((S, CAP + 64), np.uint8)
pack = np.zeros(S, np.int32)
unpack = np.zeros(S, np.int32)
act = np.zeros(S, np.int32)
exp = []
for i, g in enumerate(sel):
    c = g[0]
    src[i, :c.pack_size] = np.frombuffer(stream, np.uint8, c.pack_size,
                                         c.data_off)
    pack[i] = c.pack_size
    unpack[i] = c.unpack_size
    act[i] = 1
    exp.append(framing.decode_chunks(stream, g))
out, ok, consumed = P.decode_chunks(src, pack, unpack, act, dic_cap=CAP,
                                    interpret=True)
assert ok.all(), ok
assert (consumed == pack).all(), (consumed, pack)
for i in range(S):
    assert out[i, :unpack[i]].tobytes() == exp[i], f"lane {i} mismatch"
print("single-chunk OK")

# corrupt lane isolation
src[3, 7] ^= 0xFF
out2, ok2, _ = P.decode_chunks(src, pack, unpack, act, dic_cap=CAP,
                               interpret=True)
assert not ok2[3]
for i in range(S):
    if i != 3:
        assert out2[i, :unpack[i]].tobytes() == exp[i]
print("corrupt-lane OK")

# multi-chunk groups incl. state reset + page crossings (512B boundary in
# lit runs) — text-heavy data maximizes lit2/lit3 slots
text = (b"the quick brown fox jumps over the lazy dog. " * 60
        + big_mixed(1024, seed=11))
stream2, prop2 = framing.encode(text, dict_size=2048, chunk_size=512,
                                parallel_groups=False)
ch2, _ = framing.scan(stream2)
g2 = framing.split_groups(ch2)
pk = max(sum(c.pack_size for c in g) for g in g2)
ul = max(sum(c.unpack_size for c in g) for g in g2)
nch = max(len(g) for g in g2)
S2 = max(8, len(g2))
src2 = np.zeros((S2, pk + 64), np.uint8)
pe = np.zeros((S2, nch), np.int32)
ue = np.zeros((S2, nch), np.int32)
fl = np.zeros((S2, nch), np.int32)
act2 = np.zeros(S2, np.int32)
exp2 = []
for i, g in enumerate(g2):
    off = 0
    cum_p = cum_u = 0
    for j, c in enumerate(g):
        body = stream2[c.data_off:c.data_off + c.pack_size]
        src2[i, off:off + len(body)] = np.frombuffer(body, np.uint8)
        off += len(body)
        cum_p += c.pack_size
        cum_u += c.unpack_size
        pe[i, j] = cum_p
        ue[i, j] = cum_u
        fl[i, j] = 1 | (2 if (j > 0 and c.is_lzma
                              and c.mode >= framing.MODE_STATE) else 0) \
            | (4 if not c.is_lzma else 0)
    pe[i, len(g):] = cum_p
    ue[i, len(g):] = cum_u
    act2[i] = 1
    exp2.append(framing.decode_chunks(stream2, g))
out3, ok3, cons3 = P.finalize_chunks(
    P.submit_groups(src2, pe, ue, fl, act2, dic_cap=ul, interpret=True),
    dic_cap=ul)
for i, g in enumerate(g2):
    assert ok3[i], f"group {i} not ok"
    assert out3[i, :len(exp2[i])].tobytes() == exp2[i], f"group {i} data"
print("multi-chunk OK")
print("MLIT_CHECK_OK")
