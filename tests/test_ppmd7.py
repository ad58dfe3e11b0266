"""PPMd7 (var.H) codec: bit-exact parity with the reference, both directions."""

import subprocess

import pytest

from lzma_sdk_zliblike_tpu.models.ppmd7 import codec as P
from lzma_sdk_zliblike_tpu.containers import sevenzip as SZ
from lzma_sdk_zliblike_tpu.utils.errors import LzmaError, ParamError

ORDER, MEM = 6, 1 << 20


def _props():
    return bytes([ORDER]) + MEM.to_bytes(4, "little")


def _oracle_ppmd_encode(oracle, tmp_path, data, order=ORDER, mem=MEM):
    a, b = tmp_path / "in", tmp_path / "enc"
    a.write_bytes(data)
    subprocess.run([oracle["oracle_driver"], "ppmd7e", str(order), str(mem),
                    str(a), str(b)], check=True, capture_output=True)
    return b.read_bytes()


@pytest.mark.parametrize("name", ["text", "code", "binary", "x86", "repeat",
                                  "random", "tiny"])
def test_encode_parity_and_decode(oracle, corpus, tmp_path, name):
    data = corpus[name][:12000]
    ref = _oracle_ppmd_encode(oracle, tmp_path, data)
    mine, props = P.encode(data, ORDER, MEM)
    assert mine == ref
    assert P.decode(ref, props, len(data)) == data


@pytest.mark.parametrize("order,mem", [(2, 1 << 16), (4, 1 << 18),
                                       (10, 1 << 21), (16, 1 << 22)])
def test_orders_and_mem_sizes(oracle, corpus, tmp_path, order, mem):
    data = corpus["text"][:8000]
    ref = _oracle_ppmd_encode(oracle, tmp_path, data, order, mem)
    mine, props = P.encode(data, order, mem)
    assert mine == ref
    assert P.decode(mine, props, len(data)) == data


def test_oracle_decodes_ours(oracle, corpus, tmp_path):
    data = corpus["code"][:10000]
    mine, _props = P.encode(data, ORDER, MEM)
    enc = tmp_path / "menc"
    enc.write_bytes(mine)
    out = tmp_path / "dec"
    subprocess.run([oracle["oracle_driver"], "ppmd7d", str(ORDER), str(MEM),
                    str(len(data)), str(enc), str(out)], check=True,
                   capture_output=True)
    assert out.read_bytes() == data


def test_small_memory_restart_paths(oracle, corpus, tmp_path):
    """Tiny pool forces the allocator-pressure / restart paths."""
    data = corpus["text"][:20000]
    for mem in (1 << 11, 1 << 12, 1 << 14):
        ref = _oracle_ppmd_encode(oracle, tmp_path, data, 6, mem)
        mine, props = P.encode(data, 6, mem)
        assert mine == ref, f"mem={mem}"
        assert P.decode(mine, props, len(data)) == data


def test_7z_ppmd_folder(oracle, corpus, tmp_path):
    files = {"a.txt": corpus["text"][:10000], "b.bin": corpus["binary"][:5000]}
    img = SZ.write(files, method=SZ.M_PPMD, dict_size=1 << 20)
    assert SZ.extract(img) == files


def test_bad_params():
    with pytest.raises(ParamError):
        P.Ppmd7(1, 1 << 20)
    with pytest.raises(ParamError):
        P.Ppmd7(6, 100)


def test_corrupt_stream(corpus):
    data = corpus["text"][:2000]
    mine, props = P.encode(data, ORDER, MEM)
    bad = bytes([1]) + mine[1:]
    with pytest.raises(LzmaError):
        P.decode(bad, props, len(data))


def test_native_port_matches_python_engine():
    """native/lzt_ppmd7.cc must be byte-identical to the Python codec."""
    from lzma_sdk_zliblike_tpu import native
    if not native.ppmd7_available():
        import pytest
        pytest.skip("native library not built")
    from tests.corpus import big_mixed, random_bytes
    for order, mem in [(2, 1 << 16), (6, 1 << 20), (12, 1 << 14)]:
        data = big_mixed(24000, seed=order) + random_bytes(3000, seed=order)
        s_py, props = P.encode(data, order=order, mem_size=mem,
                               engine="python")
        s_nat, props2 = P.encode(data, order=order, mem_size=mem)
        assert props == props2 and s_nat == s_py
        assert P.decode(s_nat, props, len(data)) == data
        assert P.decode(s_nat, props, len(data), engine="python") == data
