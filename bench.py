"""Benchmark: LZMA2 decode throughput on ORACLE-produced streams.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N, ...}

The corpus is split into dict-reset blocks and each block is encoded by the
reference SDK itself (build/oracle_driver lzma2e — BT4+optimal parse,
16 MB dict prop) exactly as the reference MtCoder would (one dict-reset
group per block, Lzma2Enc.c:223-233).  baseline = the reference decoding
that same stream single-core on this host (per BASELINE.md the measured
local number is the baseline).  The device path is the Pallas group kernel
via the batched scheduler (HBM-resident dictionary, v8); the host path is
the block-parallel native decoder (MtCoder equivalent).  The better engine
is the headline metric; both engines' numbers are always reported.

Env knobs: LZT_BENCH_MB (corpus MB, default 32), LZT_BENCH_LANES (default
32), LZT_BENCH_BLOCK (group bytes, default 1MB), LZT_BENCH_TIMEOUT
(seconds, default 1500), LZT_BENCH_REPS (default 3).
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, "build", "jax_cache"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_oracle():
    oracle = os.path.join(REPO, "build", "oracle_driver")
    if not os.path.exists(oracle):
        subprocess.run(["make", "-C", REPO, "oracle"], check=True,
                       capture_output=True)
    return oracle


def oracle_stream(data: bytes, block: int, cache_key: str) -> bytes:
    """Oracle-encode `data` as one LZMA2 stream of dict-reset groups."""
    cache = os.path.join(REPO, "build", f"bench_{cache_key}.l2")
    if os.path.exists(cache):
        return open(cache, "rb").read()
    import tempfile
    oracle = build_oracle()
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
        parts.append(body[:-1])                # strip EOS
    stream = b"".join(parts) + b"\x00"
    with open(cache, "wb") as f:
        f.write(stream)
    return stream


def main() -> int:
    mb = int(os.environ.get("LZT_BENCH_MB", "32"))
    lanes = int(os.environ.get("LZT_BENCH_LANES", "32"))
    block = int(os.environ.get("LZT_BENCH_BLOCK", str(1 << 20)))
    reps = int(os.environ.get("LZT_BENCH_REPS", "3"))
    timeout_s = int(os.environ.get("LZT_BENCH_TIMEOUT", "1500"))

    from tests.corpus import big_mixed
    from lzma_sdk_zliblike_tpu.models.lzma2 import framing

    data = big_mixed(mb << 20)
    stream = oracle_stream(data, block, f"{mb}m_{block // 1024}k")
    prop = framing.encode_dict_prop(1 << 24)
    groups = framing.split_groups(framing.scan(stream)[0])
    max_pack = max(sum(c.pack_size for c in g) for g in groups)
    log(f"corpus {len(data)} B; oracle stream {len(stream)} B "
        f"(ratio {len(data)/len(stream):.2f}); {len(groups)} groups x "
        f"{block >> 20} MB, dict prop 16 MB, max chunks/group "
        f"{max(len(g) for g in groups)}")

    # baseline: the reference decoding its own stream, single core
    import tempfile
    oracle = build_oracle()
    d = tempfile.mkdtemp()
    enc = os.path.join(d, "s.l2")
    out = os.path.join(d, "s.out")
    with open(enc, "wb") as f:
        f.write(bytes([prop]) + stream)
    t = time.time()
    subprocess.run([oracle, "lzma2d", enc, out], check=True,
                   capture_output=True)
    baseline = len(data) / (time.time() - t) / 1e6
    assert open(out, "rb").read() == data
    log(f"oracle single-core decode baseline: {baseline:.1f} MB/s")

    result = {"metric": "lzma2_decode", "value": 0.0, "unit": "MB/s",
              "vs_baseline": 0.0, "oracle_mbs": round(baseline, 2),
              "host_mbs": 0.0, "tpu_mbs": 0.0,
              "corpus_mb": mb, "group_mb": block >> 20}

    def finish(value, tag):
        result["metric"] = f"lzma2_decode_{tag}"
        result["value"] = round(value, 2)
        result["vs_baseline"] = round(value / baseline, 3)
        print(json.dumps(result), flush=True)

    # host engine, block-parallel (MtCoder-equivalent path)
    from lzma_sdk_zliblike_tpu.parallel.host_pool import decode_lzma2_mt
    host_mbs = 0.0
    for _ in range(max(1, reps - 1)):
        t0 = time.time()
        outb = decode_lzma2_mt(stream, prop)
        host_mbs = max(host_mbs, len(data) / (time.time() - t0) / 1e6)
    assert outb == data
    result["host_mbs"] = round(host_mbs, 2)
    log(f"host MT decode: {host_mbs:.1f} MB/s")

    # device lane-parallel path under a watchdog (remote compiles can queue)
    def on_timeout(_sig, _frm):
        log("device path timed out; reporting host number")
        finish(host_mbs, "host_mt")
        os._exit(0)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(timeout_s)
    tpu_mbs = 0.0
    try:
        from lzma_sdk_zliblike_tpu.parallel.scheduler import (
            BatchedLzma2Decoder, BatchShape)
        pack_cap = -(-max_pack // 4096) * 4096
        shape = BatchShape(n_lanes=lanes, pack_cap=pack_cap, dic_cap=block)
        dec = BatchedLzma2Decoder(
            shape, engine=os.environ.get("LZT_BENCH_DEVICE_ENGINE", "pallas"))
        log("device warmup/compile...")
        t = time.time()
        warm = dec.decode(stream, prop)
        ok = warm == data
        log(f"device warmup: {time.time()-t:.1f}s bit-exact={ok}")
        if ok:
            for _ in range(reps):
                t = time.time()
                outd = dec.decode(stream, prop)
                tpu_mbs = max(tpu_mbs, len(data) / (time.time() - t) / 1e6)
            assert outd == data
        signal.alarm(0)
        log(f"device decode: {tpu_mbs:.2f} MB/s")
    except Exception as e:  # device path must never sink the bench
        signal.alarm(0)
        log(f"device path failed: {e!r}")
        tpu_mbs = 0.0
    result["tpu_mbs"] = round(tpu_mbs, 2)
    if tpu_mbs > host_mbs:
        finish(tpu_mbs, "tpu")
    else:
        finish(host_mbs, "host_mt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
