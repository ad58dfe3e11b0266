"""Device batch filters vs the host reference implementations."""

import numpy as np
import pytest

from lzma_sdk_zliblike_tpu.ops import filters as F
from lzma_sdk_zliblike_tpu.ops import device_filters as DF
from tests.corpus import random_bytes

HOST = {"arm": F.arm_convert, "armt": F.armt_convert, "ppc": F.ppc_convert,
        "sparc": F.sparc_convert, "ia64": F.ia64_convert,
        "x86": lambda b, ip, encoding: F.x86_convert(
            b, ip, encoding=encoding)[0]}


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
            off = int(rng.integers(0, L - 4)) & ~1
            data[s, off + 1] = 0xF0 | (data[s, off + 1] & 7)   # ARMT BL pair
            data[s, off + 3] = 0xF8 | (data[s, off + 3] & 7)
            off = int(rng.integers(0, (L - 16) // 16)) * 16    # IA64 brl
            data[s, off] = 0x16                # template 22: all slots
            data[s, off + 1] &= 0x3F           # instr bits 14-16 clear
            data[s, off + 2] &= 0xFE
            data[s, off + 5] = (data[s, off + 5] & 0xC3) | 0x14  # op 5
            # x86 BCJ: convertible sites + clusters that exercise the
            # 3-bit prev-mask heuristic and the post-conversion skip
            off = int(rng.integers(0, L - 12))
            data[s, off] = 0xE8
            data[s, off + 4] = 0x00            # plain convertible call
            off = int(rng.integers(0, L - 12))
            data[s, off] = 0xE9
            data[s, off + 4] = 0xFF            # convertible jump
            off = int(rng.integers(0, L - 14))
            data[s, off] = 0xE8                # candidates 2 apart: mask
            data[s, off + 2] = 0xE8            # shift + allowed test
            data[s, off + 6] = 0xFF
            off = int(rng.integers(0, L - 14))
            data[s, off] = 0xE8                # dense run: skip chain +
            data[s, off + 1] = 0xE8            # conversion suppression
            data[s, off + 2] = 0xE8
            data[s, off + 5] = 0x00
            data[s, off + 6] = 0x00
    valid = np.array([L, L - 4, L - 128, 8, 0][:S], np.int32)
    ip = np.array([0, 4096, 12345 & ~3, 0, 0][:S], np.uint32)
    return data, valid, ip


@pytest.mark.parametrize("name", ["arm", "armt", "ppc", "sparc", "ia64",
                                  "x86"])
@pytest.mark.parametrize("encoding", [True, False])
def test_branch_batch_matches_host(name, encoding):
    data, valid, ip = _mk_batch(seed=hash(name) % 1000)
    out = DF.convert_batch(name, data, valid, ip, encoding=encoding)
    hits = int((out != data).sum())
    assert hits > 0, f"{name}: salt produced no conversions"
    for s in range(len(valid)):
        n = int(valid[s])
        ref = HOST[name](data[s, :n].tobytes(), int(ip[s]),
                         encoding=encoding)
        assert out[s, :n].tobytes() == ref, (name, encoding, s)


@pytest.mark.parametrize("name", ["arm", "armt", "ppc", "sparc", "ia64",
                                  "x86"])
def test_branch_batch_roundtrip(name):
    data, valid, ip = _mk_batch(seed=hash(name) % 997 + 7)
    # xz requires filter start offsets aligned to the instruction size;
    # ia64's >>4 truncation is only invertible at 16-aligned ip
    ip = ip & ~np.uint32(15)
    enc = DF.convert_batch(name, data, valid, ip, encoding=True)
    dec = DF.convert_batch(name, np.asarray(enc), valid, ip, encoding=False)
    assert np.array_equal(np.asarray(dec), data), name


def test_bcj2_decode_batch_matches_host():
    import jax.numpy as jnp
    S = 4
    rng = np.random.default_rng(11)
    datas, streams = [], []
    for s in range(S):
        d = bytearray(random_bytes(8192 + 512 * s, seed=100 + s))
        for _ in range(60):   # salt convertible call/jump/Jcc sites
            off = int(rng.integers(0, len(d) - 8))
            kind = int(rng.integers(0, 3))
            if kind == 0:
                d[off] = 0xE8
            elif kind == 1:
                d[off] = 0xE9
            else:
                d[off] = 0x0F
                d[off + 1] = 0x80 | int(rng.integers(0, 16))
            d[off + 5] = 0x00 if rng.integers(0, 2) else 0xFF
        data = bytes(d)
        main, call, jump, rcs = F.bcj2_encode(data)
        assert F.bcj2_decode(main, call, jump, rcs, len(data)) == data
        datas.append(data)
        streams.append((main, call, jump, rcs))

    def pad(bufs):
        cap = -(-max(len(b) for b in bufs) // 4) * 4
        arr = np.zeros((S, max(cap, 8)), np.uint8)
        for i, b in enumerate(bufs):
            arr[i, :len(b)] = np.frombuffer(b, np.uint8)
        return arr, np.array([len(b) for b in bufs], np.int32)

    m, ml = pad([t[0] for t in streams])
    c, cl = pad([t[1] for t in streams])
    j, jl = pad([t[2] for t in streams])
    r, rl = pad([t[3] for t in streams])
    osz = np.array([len(d) for d in datas], np.int32)
    out, ok = DF.bcj2_decode_batch(
        jnp.asarray(m), jnp.asarray(ml), jnp.asarray(c), jnp.asarray(cl),
        jnp.asarray(j), jnp.asarray(jl), jnp.asarray(r), jnp.asarray(rl),
        jnp.asarray(osz))
    out = np.asarray(out)
    assert np.asarray(ok).all()
    n_conv = sum(len(t[1]) + len(t[2]) for t in streams) // 4
    assert n_conv > 0, "salt produced no conversions"
    for s in range(S):
        assert out[s, :len(datas[s])].tobytes() == datas[s], s


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
