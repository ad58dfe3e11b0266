""".7z reader/writer/extractors vs the reference oracle binaries.

Covers: all writer folder shapes (Copy/LZMA/LZMA2, BCJ chain, the rigid
4-coder BCJ2 shape, encoded headers), the in-memory extractor, the
constant-memory streaming extractor, the embedded-archive carver, and the
fork's own streaming binary as an end-to-end oracle.
"""

import os
import subprocess
import tempfile

import pytest

from lzma_sdk_zliblike_tpu.containers import sevenzip as SZ
from lzma_sdk_zliblike_tpu.streams import extract7z
from lzma_sdk_zliblike_tpu.utils.errors import CrcError, LzmaError, NoArchiveError


@pytest.fixture()
def files(corpus):
    return {
        "docs/readme.txt": corpus["text"][:20000],
        "src/main.c": corpus["code"][:15000],
        "bin/app.exe": corpus["x86"][:12000],
        "rep.bin": corpus["repeat"][:9000],
        "empty.txt": b"",
    }


SHAPES = [
    ("copy", dict(method=SZ.M_COPY)),
    ("lzma", dict(method=SZ.M_LZMA)),
    ("lzma2", dict(method=SZ.M_LZMA2)),
    ("lzma2-nonsolid", dict(method=SZ.M_LZMA2, solid=False)),
    ("lzma2-bcj", dict(method=SZ.M_LZMA2, pre_filter=SZ.M_BCJ)),
    ("lzma-bcj2", dict(method=SZ.M_LZMA, pre_filter=SZ.M_BCJ2)),
    ("lzma2-enchdr", dict(method=SZ.M_LZMA2, encode_header=True)),
]


def _oracle_extract_ok(oracle, img, files):
    d = tempfile.mkdtemp()
    p = os.path.join(d, "t.7z")
    with open(p, "wb") as f:
        f.write(img)
    r = subprocess.run([oracle["oracle_7z"], "x", p], capture_output=True,
                       cwd=d)
    if r.returncode != 0:
        return False
    return all(open(os.path.join(d, nm), "rb").read() == b
               for nm, b in files.items())


@pytest.mark.parametrize("desc,kw", SHAPES)
def test_roundtrip_and_oracle(oracle, files, desc, kw):
    img = SZ.write(files, dict_size=1 << 16, **kw)
    assert SZ.extract(img) == files
    assert _oracle_extract_ok(oracle, img, files)


@pytest.mark.parametrize("desc,kw", SHAPES)
def test_streaming_extract(files, tmp_path, desc, kw):
    img = SZ.write(files, dict_size=1 << 16, **kw)
    p = tmp_path / "t.7z"
    p.write_bytes(img)
    out = tmp_path / "out"
    extract7z.extract_streaming(str(p), str(out))
    for nm, b in files.items():
        assert (out / nm).read_bytes() == b


def test_oracle_7z_t_command(oracle, files, tmp_path):
    img = SZ.write(files, dict_size=1 << 16)
    p = tmp_path / "t.7z"
    p.write_bytes(img)
    r = subprocess.run([oracle["oracle_7z"], "t", str(p)],
                       capture_output=True, text=True)
    assert r.returncode == 0 and "Everything is Ok" in r.stdout


def test_carve_and_fork_oracle(oracle, files, tmp_path):
    img = SZ.write(files, dict_size=1 << 16, pre_filter=SZ.M_BCJ)
    host = b"garbage" * 777 + img + b"trailer"
    assert SZ.extract(SZ.carve(host)) == files
    # the fork's own carve+streaming-extract binary on our archive
    d = tempfile.mkdtemp()
    hp = os.path.join(d, "host.bin")
    with open(hp, "wb") as f:
        f.write(host)
    r = subprocess.run([oracle["oracle_fork"], hp], capture_output=True,
                       cwd=d)
    assert r.returncode == 0
    for nm, b in files.items():
        assert open(os.path.join(d, nm), "rb").read() == b


def test_list_and_test_commands(files):
    img = SZ.write(files, dict_size=1 << 16)
    ents = SZ.list_files(img)
    assert {e.name for e in ents} == set(files)
    assert sorted(SZ.test(img)) == sorted(files)


def test_crc_verification_catches_corruption(files):
    img = bytearray(SZ.write(files, dict_size=1 << 16))
    # flip a byte inside the packed payload (after 32-byte start header)
    img[40] ^= 0xFF
    with pytest.raises(LzmaError):
        SZ.extract(bytes(img))


def test_no_signature():
    with pytest.raises(NoArchiveError):
        SZ.carve(b"not an archive at all")


def test_substream_crcs_multifile_folder(files):
    img = SZ.write(files, dict_size=1 << 16)
    ar = SZ.parse(img)
    nonempty = [f for f in ar.files if f.has_stream]
    assert all(f.crc is not None for f in nonempty)


def test_mtime_roundtrip_and_apply(tmp_path, files):
    # writer emits the kMTime vector; reader parses it; extraction applies
    # it to the output files (7zMain.c:438-475 parity)
    ticks = (11644473600 + 1_600_000_000) * 10**7   # 2020-09-13 UTC
    img = SZ.write(files, mtimes={"docs/readme.txt": ticks})
    ar = SZ.parse(img)
    got = {f.name: f.mtime for f in ar.files}
    assert got["docs/readme.txt"] == ticks
    assert got["src/main.c"] is None
    p = tmp_path / "t.7z"
    p.write_bytes(img)
    out = tmp_path / "out"
    extract7z.extract_streaming(str(p), str(out))
    st = os.stat(out / "docs/readme.txt")
    assert abs(st.st_mtime - 1_600_000_000) < 2


def test_streaming_extract_progress_and_abort(files, tmp_path):
    from lzma_sdk_zliblike_tpu.utils.errors import ProgressAborted
    img = SZ.write(files, dict_size=1 << 16)
    p = tmp_path / "t.7z"
    p.write_bytes(img)
    out = tmp_path / "out"
    seen = []
    extract7z.extract_streaming(str(p), str(out),
                                progress=lambda i, o: seen.append((i, o)))
    total = sum(len(b) for b in files.values())
    assert seen and seen[-1][1] == total
    assert all(a[1] <= b[1] for a, b in zip(seen, seen[1:]))
    # abort on the first callback: prompt ProgressAborted unwind
    out2 = tmp_path / "out2"
    with pytest.raises(ProgressAborted):
        extract7z.extract_streaming(str(p), str(out2),
                                    progress=lambda i, o: False)
