"""Real-world-data validation (VERDICT r4 item 8).

The synthetic ``big_mixed`` corpus drives the perf numbers; this file
pins behavior on REAL data — x86-64 ELF machine code (BCJ-relevant
branch encodings), Python source text, and English prose — via the
checked-in deterministic fixture ``tests/fixtures/realdata.bin``
(libc.so.6 slice + python3.12 stdlib sources + common-licenses +
addr2line, composed in that order).
"""

import hashlib
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "realdata.bin")
SHA256 = "2dd6c2befdde68e109b4e3664a7305df25b6724df7c463d980916a71fb87b89b"


@pytest.fixture(scope="module")
def realdata():
    blob = open(FIXTURE, "rb").read()
    assert hashlib.sha256(blob).hexdigest() == SHA256
    return blob


def test_roundtrip_all_engines(realdata):
    import lzma_sdk_zliblike_tpu as lzt
    s, p = lzt.lzma2_compress(realdata, dict_size=1 << 20)
    assert lzt.lzma2_uncompress(s, p) == realdata
    assert lzt.lzma2_uncompress(s, p, threads=2) == realdata


def test_size_ratio_vs_oracle_fast(realdata, oracle, tmp_path):
    """Fast-parse size parity holds on real data, not just synthetic."""
    from lzma_sdk_zliblike_tpu import native
    src = tmp_path / "in.bin"
    src.write_bytes(realdata)
    out = tmp_path / "o.l2"
    subprocess.run([oracle["oracle_driver"], "lzma2e", str(1 << 20),
                    str(src), str(out), "1"], check=True,
                   capture_output=True)
    o_size = os.path.getsize(out) - 1
    s, _p = native.lzma2_encode(realdata, 1 << 20, 1 << 20, False, effort=9)
    ratio = len(s) / o_size
    assert ratio <= 1.02, (len(s), o_size)


def test_size_ratio_vs_oracle_opt(realdata, oracle, tmp_path):
    """Optimal-parse size parity on real data (reference level 9)."""
    from lzma_sdk_zliblike_tpu import native
    src = tmp_path / "in.bin"
    src.write_bytes(realdata)
    out = tmp_path / "o.l2"
    subprocess.run([oracle["oracle_driver"], "lzma2e", str(1 << 20),
                    str(src), str(out), "9"], check=True,
                   capture_output=True)
    o_size = os.path.getsize(out) - 1
    s, _p = native.lzma2_encode(realdata, 1 << 20, 1 << 20, False,
                                effort=10)
    ratio = len(s) / o_size
    assert ratio <= 1.01, (len(s), o_size)


def test_bcj_helps_on_real_x86(realdata):
    """The x86 BCJ filter must earn its keep on REAL machine code
    (Bra86.c semantics): filtered-then-compressed beats plain
    compression on the libc slice."""
    from lzma_sdk_zliblike_tpu import native
    from lzma_sdk_zliblike_tpu.ops import filters
    code = realdata[: 1 << 20]  # libc .text-heavy region
    plain, _ = native.lzma2_encode(code, 1 << 20, 1 << 20, False, effort=9)
    filt, _st, _done = filters.x86_convert(code, 0, True)
    fs, _ = native.lzma2_encode(bytes(filt), 1 << 20, 1 << 20, False,
                                effort=9)
    assert len(fs) < len(plain), (len(fs), len(plain))
    # and the filter round-trips
    back, _st2, _d2 = filters.x86_convert(bytes(filt), 0, False)
    assert bytes(back) == code


def test_xz_with_bcj_chain_real_elf(realdata, tmp_path):
    """xz container with the x86 filter chain on real ELF bytes is
    readable by system xz (the external interop surface)."""
    from lzma_sdk_zliblike_tpu.containers import xz
    code = realdata[: 512 << 10]
    img = xz.encode(code, filters=[xz.XzFilter(xz.FILTER_X86)])
    p = tmp_path / "a.xz"
    p.write_bytes(img)
    r = subprocess.run(["xz", "-dc", str(p)], capture_output=True)
    assert r.returncode == 0 and r.stdout == code
    assert xz.decode(img) == code


def test_7z_archive_real_members(realdata, oracle, tmp_path):
    """A 7z archive of the real files (ELF + source text) extracts
    bit-exactly by us AND by the reference oracle."""
    from lzma_sdk_zliblike_tpu.containers import sevenzip as SZ
    files = {
        "libc_slice.so": realdata[: 768 << 10],
        "src/stdlib.py": realdata[2 << 20: (2 << 20) + (256 << 10)],
        "LICENSE.txt": realdata[-(128 << 10):],
    }
    img = SZ.write(files, dict_size=1 << 18)
    assert SZ.extract(img) == files
    p = tmp_path / "r.7z"
    p.write_bytes(img)
    r = subprocess.run([oracle["oracle_7z"], "t", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "Everything is Ok" in r.stdout
