"""CLI layer driven end-to-end via subprocess (the user-facing surface)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(module, *args, cwd=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-m",
                           f"lzma_sdk_zliblike_tpu.cli.{module}", *args],
                          capture_output=True, text=True, cwd=cwd, env=env)


@pytest.fixture()
def sample(tmp_path, corpus):
    p = tmp_path / "in.bin"
    p.write_bytes(corpus["text"][:30000] + corpus["x86"][:10000])
    return p


def test_lzma_util_roundtrip(oracle, sample, tmp_path):
    enc = tmp_path / "a.lzma"
    dec = tmp_path / "a.out"
    assert run_cli("lzma_util", "e", str(sample), str(enc),
                   "--dict-size", "65536").returncode == 0
    # interop: reference CLI decodes our file
    ref = tmp_path / "ref.out"
    subprocess.run([oracle["oracle_lzma"], "d", str(enc), str(ref)],
                   check=True, capture_output=True)
    assert ref.read_bytes() == sample.read_bytes()
    assert run_cli("lzma_util", "d", str(enc), str(dec)).returncode == 0
    assert dec.read_bytes() == sample.read_bytes()


def test_lzma_util_error_paths(tmp_path, sample):
    r = run_cli("lzma_util", "d", str(sample), str(tmp_path / "x"))
    assert r.returncode != 0 and "error" in r.stderr
    r = run_cli("lzma_util", "e", str(tmp_path / "missing"), str(tmp_path / "x"))
    assert r.returncode == 8  # SZ_ERROR_READ convention for io errors


def test_sevenz_full_cycle(sample, tmp_path):
    arc = tmp_path / "t.7z"
    r = run_cli("sevenz", "a", str(arc), str(sample), "--dict-size", "65536",
                "--bcj2")
    assert r.returncode == 0
    r = run_cli("sevenz", "l", str(arc))
    assert r.returncode == 0 and "in.bin" in r.stdout
    r = run_cli("sevenz", "t", str(arc))
    assert r.returncode == 0 and "Everything is Ok" in r.stdout
    out = tmp_path / "out"
    r = run_cli("sevenz", "x", str(arc), "-o", str(out))
    assert r.returncode == 0
    assert (out / "in.bin").read_bytes() == sample.read_bytes()
    outs = tmp_path / "outs"
    r = run_cli("sevenz", "xs", str(arc), "-o", str(outs))
    assert r.returncode == 0
    assert (outs / "in.bin").read_bytes() == sample.read_bytes()


def test_sevenz_carve(sample, tmp_path):
    arc = tmp_path / "t.7z"
    run_cli("sevenz", "a", str(arc), str(sample), "--dict-size", "65536")
    host = tmp_path / "host.bin"
    host.write_bytes(b"junkjunk" * 99 + arc.read_bytes() + b"tail")
    r = run_cli("sevenz", "carve", str(host), "-o", str(tmp_path / "c.7z"))
    assert r.returncode == 0
    r = run_cli("sevenz", "t", str(tmp_path / "c.7z"))
    assert r.returncode == 0


def test_xz_util_cycle(sample, tmp_path):
    xzf = tmp_path / "t.xz"
    out = tmp_path / "t.out"
    assert run_cli("xz_util", "c", str(sample), str(xzf), "--check", "crc64",
                   "--dict-size", "65536", "--block-size", "16384").returncode == 0
    r = run_cli("xz_util", "l", str(xzf))
    assert r.returncode == 0 and "blocks=" in r.stdout
    assert run_cli("xz_util", "d", str(xzf), str(out)).returncode == 0
    assert out.read_bytes() == sample.read_bytes()
