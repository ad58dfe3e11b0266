"""Dev bench: device decode of ORACLE-produced LZMA2 streams (16MB dict).

Builds a corpus, splits it into dict-reset blocks, encodes every block with
the reference SDK (build/oracle_driver lzma2e, default props: BT4+optimal,
dict 16 MB) exactly the way the reference MtCoder would (one dict-reset
group per block, Lzma2Enc.c:223-233), concatenates the groups into one
LZMA2 stream, and decodes it with the Pallas scheduler path.

Env: LZT_MB (corpus MB, default 32), LZT_BLOCK (group bytes, default 1MB),
LZT_LANES (default = group count), LZT_REPS (default 3).
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jax_cache"))

import numpy as np  # noqa: E402


def oracle_lzma2_stream(data: bytes, block: int, cache_key: str) -> bytes:
    """Oracle-encode `data` as one LZMA2 stream of dict-reset groups."""
    cache = os.path.join(REPO, "build", f"bench_{cache_key}.l2")
    if os.path.exists(cache):
        return open(cache, "rb").read()
    import tempfile
    oracle = os.path.join(REPO, "build", "oracle_driver")
    d = tempfile.mkdtemp()
    parts = []
    for off in range(0, len(data), block):
        src = os.path.join(d, "b.bin")
        enc = os.path.join(d, "b.l2")
        with open(src, "wb") as f:
            f.write(data[off:off + block])
        subprocess.run([oracle, "lzma2e", str(1 << 24), src, enc],
                       check=True, capture_output=True)
        body = open(enc, "rb").read()[1:]      # strip dict-prop byte
        assert body.endswith(b"\x00")
        parts.append(body[:-1])                # strip EOS terminator
    stream = b"".join(parts) + b"\x00"
    with open(cache, "wb") as f:
        f.write(stream)
    return stream


def main():
    mb = int(os.environ.get("LZT_MB", "32"))
    block = int(os.environ.get("LZT_BLOCK", str(1 << 20)))
    reps = int(os.environ.get("LZT_REPS", "3"))

    from tests.corpus import big_mixed
    from lzma_sdk_zliblike_tpu.models.lzma2 import framing
    from lzma_sdk_zliblike_tpu.parallel.scheduler import (BatchedLzma2Decoder,
                                                          BatchShape)

    data = big_mixed(mb << 20)
    stream = oracle_lzma2_stream(data, block, f"{mb}m_{block // 1024}k")
    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    n_groups = len(groups)
    max_pack = max(sum(c.pack_size for c in g) for g in groups)
    max_chunks = max(len(g) for g in groups)
    print(f"corpus {len(data)} B, stream {len(stream)} B "
          f"(ratio {len(data)/len(stream):.2f}), {n_groups} groups, "
          f"max group pack {max_pack} B, max chunks/group {max_chunks}",
          flush=True)

    lanes = int(os.environ.get("LZT_LANES", str(n_groups)))
    pack_cap = -(-max_pack // 4096) * 4096
    shape = BatchShape(n_lanes=lanes, pack_cap=pack_cap, dic_cap=block)
    dec = BatchedLzma2Decoder(shape, engine="pallas")
    # oracle single-core baseline on the same stream
    import tempfile
    d = tempfile.mkdtemp()
    enc = os.path.join(d, "s.l2")
    out = os.path.join(d, "s.out")
    with open(enc, "wb") as f:
        f.write(bytes([framing.encode_dict_prop(1 << 24)]) + stream)
    oracle = os.path.join(REPO, "build", "oracle_driver")
    t = time.time()
    subprocess.run([oracle, "lzma2d", enc, out], check=True,
                   capture_output=True)
    base = len(data) / (time.time() - t) / 1e6
    assert open(out, "rb").read() == data
    print(f"oracle single-core decode: {base:.1f} MB/s", flush=True)

    t = time.time()
    res = dec.decode(stream, framing.encode_dict_prop(1 << 24))
    print(f"warmup(+compile): {time.time()-t:.1f}s bit-exact="
          f"{res == data}", flush=True)
    assert res == data
    best = 0.0
    for _ in range(reps):
        t = time.time()
        res = dec.decode(stream, framing.encode_dict_prop(1 << 24))
        dt = time.time() - t
        best = max(best, len(data) / dt / 1e6)
        print(f"device decode: {len(data)/dt/1e6:.2f} MB/s", flush=True)
    assert res == data
    print(f"BEST {best:.2f} MB/s  vs oracle x{best/base:.2f}", flush=True)


if __name__ == "__main__":
    main()
