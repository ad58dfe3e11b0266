"""Device batch filters vs the host reference implementations."""

import numpy as np
import pytest

from lzma_sdk_zliblike_tpu.ops import filters as F
from lzma_sdk_zliblike_tpu.ops import device_filters as DF
from tests.corpus import random_bytes

HOST = {"arm": F.arm_convert, "ppc": F.ppc_convert, "sparc": F.sparc_convert}


def _mk_batch(seed, S=5, L=4096):
    rng = np.random.default_rng(seed)
    data = np.frombuffer(random_bytes(S * L, seed=seed), np.uint8).reshape(
        S, L).copy()
    # salt in plausible branch opcodes so hits actually occur
    for s in range(S):
        for k in range(40):
            off = int(rng.integers(0, L - 4)) & ~3
            data[s, off + 3] = 0xEB            # ARM BL
            off = int(rng.integers(0, L - 4)) & ~3
            data[s, off] = 0x48                # PPC bl
            data[s, off + 3] |= 1
            off = int(rng.integers(0, L - 4)) & ~3
            data[s, off] = 0x40                # SPARC call
            data[s, off + 1] &= 0x3F
    valid = np.array([L, L - 4, L - 128, 8, 0][:S], np.int32)
    ip = np.array([0, 4096, 12345 & ~3, 0, 0][:S], np.uint32)
    return data, valid, ip


@pytest.mark.parametrize("name", ["arm", "ppc", "sparc"])
@pytest.mark.parametrize("encoding", [True, False])
def test_branch_batch_matches_host(name, encoding):
    data, valid, ip = _mk_batch(seed=hash(name) % 1000)
    out = DF.convert_batch(name, data, valid, ip, encoding=encoding)
    for s in range(len(valid)):
        n = int(valid[s])
        ref = HOST[name](data[s, :n].tobytes(), int(ip[s]),
                         encoding=encoding)
        assert out[s, :n].tobytes() == ref, (name, encoding, s)


@pytest.mark.parametrize("dist", [1, 2, 3, 4, 16, 255])
def test_delta_batch_roundtrip_and_host_parity(dist):
    S, L = 4, 3000
    data = np.frombuffer(random_bytes(S * L, seed=dist), np.uint8).reshape(
        S, L).copy()
    valid = np.array([L, L - 7, 13, 0], np.int32)
    enc = np.asarray(DF.delta_batch(data, valid, dist=dist, encoding=True))
    dec = np.asarray(DF.delta_batch(enc, valid, dist=dist, encoding=False))
    for s in range(S):
        n = int(valid[s])
        assert dec[s, :n].tobytes() == data[s, :n].tobytes()
        ref_enc, _st = F.delta_encode(data[s, :n].tobytes(), dist)
        assert enc[s, :n].tobytes() == ref_enc, (dist, s)
