"""Branch/delta/BCJ2 filters: bit-exact parity with the reference SDK."""

import os
import subprocess

import pytest

from lzma_sdk_zliblike_tpu.ops import filters as F
from tests.corpus import x86_like, random_bytes, binary_structured

DATA = x86_like(30000) + random_bytes(5000) + binary_structured(5000)


def _oracle_filter(oracle, tmp_path, name, enc, ip, data):
    a, b = tmp_path / "a", tmp_path / "b"
    a.write_bytes(data)
    subprocess.run([oracle["oracle_driver"], "filter", name, str(int(enc)),
                    str(ip), str(a), str(b)], check=True, capture_output=True)
    return b.read_bytes()


@pytest.mark.parametrize("name,fn", [
    ("arm", F.arm_convert), ("armt", F.armt_convert), ("ppc", F.ppc_convert),
    ("sparc", F.sparc_convert), ("ia64", F.ia64_convert)])
@pytest.mark.parametrize("enc", [True, False])
@pytest.mark.parametrize("ip", [0, 0x4000])
def test_risc_filters_parity(oracle, tmp_path, name, fn, enc, ip):
    assert fn(DATA, ip, enc) == _oracle_filter(oracle, tmp_path, name, enc,
                                               ip, DATA)


@pytest.mark.parametrize("enc", [True, False])
@pytest.mark.parametrize("ip", [0, 0x1000])
def test_x86_parity(oracle, tmp_path, enc, ip):
    got, _state, _done = F.x86_convert(DATA, ip, enc)
    assert got == _oracle_filter(oracle, tmp_path, "x86", enc, ip, DATA)


@pytest.mark.parametrize("name,fn", [
    ("arm", F.arm_convert), ("armt", F.armt_convert), ("ppc", F.ppc_convert),
    ("sparc", F.sparc_convert), ("ia64", F.ia64_convert)])
def test_risc_roundtrip(name, fn):
    assert fn(fn(DATA, 128, True), 128, False) == DATA


# Canonical SPARC call words at nonzero ip: pins the Bra.c:124 bit-22
# sign-replication (bits 23-24 must NOT survive; round-3 advisor finding).
# Expected bytes computed with a scalar transliteration of Bra.c:99-133.
_SPARC_WORDS = bytes.fromhex(
    "401a4bf0400000017fffffff7fc0012340abcdef12345678403fffff7ffffe00")
_SPARC_VECTORS = {
    (0x0, True): "401a4bf040000002400000017fc0012640abcdef123456787fc000057ffffe07",
    (0x0, False): "401a4bf0400000007ffffffd7fc0012040abcdef12345678403ffff97ffffdf9",
    (0x1000, True): "401a4ff040000402400004017fc0052640abcdef123456787fc0040540000207",
    (0x1000, False): "401a47f07ffffc007ffffbfd403ffd2040abcdef12345678403ffbf97ffff9f9",
    (0xFF0000, True): "7fda0bf0403fc002403fc0017fffc12640abcdef123456787fffc005403fbe07",
    (0xFF0000, False): "7fda8bf07fc040007fc03ffd4000412040abcdef1234567840003ff97fc03df9",
}


@pytest.mark.parametrize("ip,enc", sorted(_SPARC_VECTORS))
def test_sparc_known_vectors(ip, enc):
    got = F.sparc_convert(_SPARC_WORDS, ip, enc)
    assert got.hex() == _SPARC_VECTORS[(ip, enc)]


def test_x86_roundtrip():
    conv, _s, _d = F.x86_convert(DATA, 0, True)
    back, _s, _d = F.x86_convert(conv, 0, False)
    assert back == DATA


@pytest.mark.parametrize("dist", [1, 2, 3, 4, 16, 255, 256])
def test_delta_parity_and_roundtrip(oracle, tmp_path, dist):
    data = DATA[:10000]
    enc, _ = F.delta_encode(data, dist)
    assert enc == _oracle_filter(oracle, tmp_path, f"delta{dist}", True, 0,
                                 data)
    dec, _ = F.delta_decode(enc, dist)
    assert dec == data


def test_delta_streaming_state():
    data = DATA[:9999]
    enc_full, _ = F.delta_encode(data, 7)
    a, st = F.delta_encode(data[:5000], 7)
    b, _ = F.delta_encode(data[5000:], 7, st)
    assert a + b == enc_full
    d1, st = F.delta_decode(enc_full[:1234], 7)
    d2, _ = F.delta_decode(enc_full[1234:], 7, st)
    assert d1 + d2 == data


def test_bcj2_roundtrip_and_oracle(oracle, tmp_path):
    data = DATA
    main, call, jump, rc = F.bcj2_encode(data)
    assert F.bcj2_decode(main, call, jump, rc, len(data)) == data
    paths = {}
    for n, b in [("m", main), ("c", call), ("j", jump), ("r", rc)]:
        p = tmp_path / n
        p.write_bytes(b)
        paths[n] = str(p)
    outp = tmp_path / "out"
    subprocess.run([oracle["oracle_driver"], "bcj2d", paths["m"], paths["c"],
                    paths["j"], paths["r"], str(outp), str(len(data))],
                   check=True, capture_output=True)
    assert outp.read_bytes() == data


@pytest.mark.parametrize("tail", [b"\xe8", b"\xe8\x01", b"\x0f\x85\x00\x00",
                                  b"\xe9\x00\x00\x00\x00", b""])
def test_bcj2_tail_edges(tail):
    data = DATA[:997] + tail
    streams = F.bcj2_encode(data)
    assert F.bcj2_decode(*streams, len(data)) == data
