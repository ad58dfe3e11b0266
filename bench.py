"""Benchmark: LZMA2 round-trip on ORACLE-produced/oracle-verified streams.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N, ...}

Two stream configs, both oracle-encoded (build/oracle_driver lzma2e —
BT4+optimal parse, 16 MB dict prop):

* **1 MB groups** — the data-parallel shape our scheduler and the
  reference MtCoder both exploit; most engines are measured here.
* **64 MB blocks** (``bigblock_*``) — the reference's DEFAULT MT block of
  4 x dictSize (``Lzma2Enc.c:223-233``): few groups, 64 MB in-kernel
  dictionaries — the shape a stock reference archive actually has.  The
  1 MB-group numbers are shown alongside because that is the shape both
  frameworks would *choose* for parallel throughput, not a claim about
  stock archives.

Corpus: tests/corpus.big_mixed (synthetic text/binary/structured mix).
BASELINE.md names Silesia; this container has zero egress so Silesia
cannot be fetched — big_mixed is the documented stand-in.

baseline = the reference decoding its own 1 MB-group stream single-core
on this host (per BASELINE.md the measured local number is the baseline).

Decode engines, all bit-exact against the corpus:
  host_mt — block-parallel native decoder on all host cores (MtCoder
            equivalent, parallel/host_pool.py)
  tpu     — the Pallas group kernel via the batched scheduler (HBM-resident
            dictionary), end-to-end including D2H.  NOTE: on the tunneled
            dev chip D2H tops out ~25 MB/s (measured; PCIe on a real host
            is ~100x that), so the e2e tpu number here is transfer-bound,
            not compute-bound; tpu_compute_mbs reports the device wall
            time of a pre-packed resident batch.
  hybrid  — parallel/hybrid.py: host workers and the device feeder drain
            one group queue concurrently (the framework's full-machine
            decode path).

Encode/round-trip (the north star is round-trip):
  encode_mbs       — MT fast-parse encode (api.lzma2_compress, effort 9)
  roundtrip_mbs    — corpus -> our encoder -> our host_mt decoder, wall
  opt_size_ratio   — effort-10 (BT4 optimal parse) compressed size vs the
                     oracle on the same slice: <= 1.0 means we beat the
                     reference's size
  opt_encode_mbs   — single-thread effort-10 encode rate on that slice

The headline metric is the best decode engine; every number is reported.

Env knobs: LZT_BENCH_MB (corpus MB, default 128), LZT_BENCH_LANES (device
batch lanes, default 64), LZT_BENCH_BLOCK (group bytes, default 1MB),
LZT_BENCH_TIMEOUT (seconds, default 1400), LZT_BENCH_REPS (default 3),
LZT_BENCH_SKIP_BIGBLOCK=1 to skip the 64 MB-block config.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


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
    mb = int(os.environ.get("LZT_BENCH_MB", "128"))
    lanes = int(os.environ.get("LZT_BENCH_LANES", "64"))
    block = int(os.environ.get("LZT_BENCH_BLOCK", str(1 << 20)))
    reps = int(os.environ.get("LZT_BENCH_REPS", "3"))
    timeout_s = int(os.environ.get("LZT_BENCH_TIMEOUT", "1400"))

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

    t0_bench = time.time()
    # baseline: the reference decoding its own stream, single core
    import tempfile
    oracle = build_oracle()
    d = tempfile.mkdtemp()
    enc = os.path.join(d, "s.l2")
    out = os.path.join(d, "s.out")
    with open(enc, "wb") as f:
        f.write(bytes([prop]) + stream)
    baseline = 0.0
    for _ in range(2):
        t = time.time()
        subprocess.run([oracle, "lzma2d", enc, out], check=True,
                       capture_output=True)
        baseline = max(baseline, len(data) / (time.time() - t) / 1e6)
    assert open(out, "rb").read() == data
    log(f"oracle single-core decode baseline: {baseline:.1f} MB/s")

    result = {"metric": "lzma2_decode", "value": 0.0, "unit": "MB/s",
              "vs_baseline": 0.0, "oracle_mbs": round(baseline, 2),
              "host_mbs": 0.0, "tpu_mbs": 0.0, "tpu_compute_mbs": 0.0,
              "hybrid_mbs": 0.0, "encode_mbs": 0.0, "roundtrip_mbs": 0.0,
              "opt_size_ratio": 0.0, "opt_encode_mbs": 0.0,
              "oracle_enc_mbs": 0.0, "opt_enc_vs_oracle": 0.0,
              "enc_st_mbs": 0.0, "oracle_enc_fast_mbs": 0.0,
              "enc_fast_vs_oracle": 0.0, "enc_fast_size_ratio": 0.0,
              "oracle_enc_mt_mbs": 0.0, "enc_mt_vs_oracle": 0.0,
              "enc_mt_size_ratio": 0.0,
              "real_fast_size_ratio": 0.0, "real_opt_size_ratio": 0.0,
              "smallgroup_host_mbs": 0.0, "smallgroup_hybrid_mbs": 0.0,
              "bigblock_host_mbs": 0.0, "bigblock_tpu_mbs": 0.0,
              "bigblock_hybrid_mbs": 0.0,
              "encode_device_kernel_mbs": 0.0, "encode_device_mbs": 0.0,
              "encode_device_identical": 0,
              "corpus_mb": mb, "group_mb": block >> 20,
              "corpus": "big_mixed (Silesia not fetchable: zero egress)"}

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
    del outb
    result["host_mbs"] = round(host_mbs, 2)
    log(f"host MT decode: {host_mbs:.1f} MB/s")

    # --- encode + round-trip (north star is round-trip) -----------------
    from lzma_sdk_zliblike_tpu.api import lzma2_compress
    enc_mbs = 0.0
    t_enc_best = 1e18
    for _ in range(max(1, reps - 1)):
        t0 = time.time()
        enc_stream, enc_prop = lzma2_compress(
            data, dict_size=1 << 20, chunk_size=block,
            threads=os.cpu_count(), effort=9)
        dt = time.time() - t0
        t_enc_best = min(t_enc_best, dt)
        enc_mbs = max(enc_mbs, len(data) / dt / 1e6)
    t0 = time.time()
    rt = decode_lzma2_mt(enc_stream, enc_prop)
    t_dec_rt = time.time() - t0
    assert rt == data
    del rt
    result["encode_mbs"] = round(enc_mbs, 2)
    result["roundtrip_mbs"] = round(
        len(data) / (t_enc_best + t_dec_rt) / 1e6, 2)
    log(f"host MT encode: {enc_mbs:.1f} MB/s; round-trip: "
        f"{result['roundtrip_mbs']} MB/s "
        f"(our stream: {len(enc_stream)} B vs oracle {len(stream)} B)")
    our_mt_size = len(enc_stream)
    del enc_stream

    # --- oracle MT encode baseline: reference MtCoder + LzFindMt on the
    # pthread Threads shim (build/oracle_mt), same dict/block/threads as
    # the encode_mbs row and level 1 = the fast-parse work class
    omt = os.path.join(REPO, "build", "oracle_mt")
    if not os.path.exists(omt):
        subprocess.run(["make", "-C", REPO, "build/oracle_mt"],
                       check=True, capture_output=True)
    mt_src = os.path.join(d, "mt.bin")
    mt_out = os.path.join(d, "mt.l2")
    with open(mt_src, "wb") as f:
        f.write(data)
    o_mt_dt = 1e18
    for _ in range(max(1, reps - 1)):
        t0 = time.time()
        subprocess.run([omt, str(1 << 20), str(os.cpu_count()), "1",
                        mt_src, mt_out, str(block)],
                       check=True, capture_output=True)
        o_mt_dt = min(o_mt_dt, time.time() - t0)
    o_mt_size = os.path.getsize(mt_out) - 1
    o_mt_mbs = len(data) / o_mt_dt / 1e6
    result["oracle_enc_mt_mbs"] = round(o_mt_mbs, 2)
    result["enc_mt_vs_oracle"] = round(enc_mbs / o_mt_mbs, 3)
    result["enc_mt_size_ratio"] = round(our_mt_size / o_mt_size, 5)
    log(f"oracle MT encode (MtCoder x{os.cpu_count()}): "
        f"{result['oracle_enc_mt_mbs']} MB/s, {o_mt_size} B "
        f"(ours/oracle: speed {result['enc_mt_vs_oracle']}x, "
        f"size {result['enc_mt_size_ratio']})")

    # --- size parity: effort-10 optimal parse vs the oracle -------------
    from lzma_sdk_zliblike_tpu import native as lzt_native
    sl = data[:8 << 20]
    s_src = os.path.join(d, "sl.bin")
    s_enc = os.path.join(d, "sl.l2")
    with open(s_src, "wb") as f:
        f.write(sl)
    # oracle ST encode baselines on the same slice: level 9 (BT4 optimal
    # parse — the mode our effort-10 matches on size) and level 1 (HC4
    # fast parse — the mode our effort-9 fast path matches)
    # min-of-2 on every ST encode row (ours AND oracle's): single runs
    # showed ±15% wall variance on this host, enough to swing the
    # vs-oracle ratios either way
    o_opt_dt = 1e18
    for _ in range(2):
        t0 = time.time()
        subprocess.run([oracle, "lzma2e", str(1 << 24), s_src, s_enc],
                       check=True, capture_output=True)
        o_opt_dt = min(o_opt_dt, time.time() - t0)
    o_size = os.path.getsize(s_enc) - 1
    result["oracle_enc_mbs"] = round(len(sl) / o_opt_dt / 1e6, 2)
    o_fast_dt = 1e18
    for _ in range(2):
        t0 = time.time()
        subprocess.run([oracle, "lzma2e", str(1 << 24), s_src, s_enc, "1"],
                       check=True, capture_output=True)
        o_fast_dt = min(o_fast_dt, time.time() - t0)
    o_fast_size = os.path.getsize(s_enc) - 1
    result["oracle_enc_fast_mbs"] = round(len(sl) / o_fast_dt / 1e6, 2)
    opt_dt = 1e18
    for _ in range(2):
        t0 = time.time()
        opt_stream, _ = lzt_native.lzma2_encode(
            sl, dict_size=1 << 24, chunk_size=1 << 21, parallel=0,
            effort=10)
        opt_dt = min(opt_dt, time.time() - t0)
    result["opt_size_ratio"] = round(len(opt_stream) / o_size, 5)
    result["opt_encode_mbs"] = round(len(sl) / opt_dt / 1e6, 2)
    result["opt_enc_vs_oracle"] = round(o_opt_dt / opt_dt, 3)
    log(f"effort-10 size: {len(opt_stream)} vs oracle {o_size} "
        f"(ratio {result['opt_size_ratio']}) at "
        f"{result['opt_encode_mbs']} MB/s ST vs oracle "
        f"{result['oracle_enc_mbs']} MB/s (ratio "
        f"{result['opt_enc_vs_oracle']})")
    del opt_stream
    # our ST fast parse vs oracle level-1 fast parse, same slice
    fast_dt = 1e18
    for _ in range(2):
        t0 = time.time()
        fast_stream, _ = lzt_native.lzma2_encode(
            sl, dict_size=1 << 24, chunk_size=1 << 21, parallel=0,
            effort=9)
        fast_dt = min(fast_dt, time.time() - t0)
    result["enc_st_mbs"] = round(len(sl) / fast_dt / 1e6, 2)
    result["enc_fast_vs_oracle"] = round(o_fast_dt / fast_dt, 3)
    result["enc_fast_size_ratio"] = round(len(fast_stream) / o_fast_size, 5)
    log(f"fast-parse ST: {result['enc_st_mbs']} MB/s vs oracle level-1 "
        f"{result['oracle_enc_fast_mbs']} MB/s (speed ratio "
        f"{result['enc_fast_vs_oracle']}, size ratio "
        f"{result['enc_fast_size_ratio']})")
    del fast_stream

    # --- real-data size ratios (tests/fixtures/realdata.bin: x86-64 ELF
    # code + source text + prose — what the synthetic corpus can't show)
    rd_path = os.path.join(REPO, "tests", "fixtures", "realdata.bin")
    if os.path.exists(rd_path):
        rd = open(rd_path, "rb").read()
        r_src = os.path.join(d, "rd.bin")
        r_enc = os.path.join(d, "rd.l2")
        with open(r_src, "wb") as f:
            f.write(rd)
        subprocess.run([oracle, "lzma2e", str(1 << 20), r_src, r_enc, "1"],
                       check=True, capture_output=True)
        o_rf = os.path.getsize(r_enc) - 1
        subprocess.run([oracle, "lzma2e", str(1 << 20), r_src, r_enc],
                       check=True, capture_output=True)
        o_ro = os.path.getsize(r_enc) - 1
        rf, _ = lzt_native.lzma2_encode(rd, dict_size=1 << 20,
                                        chunk_size=1 << 20, parallel=0,
                                        effort=9)
        ro, _ = lzt_native.lzma2_encode(rd, dict_size=1 << 20,
                                        chunk_size=1 << 20, parallel=0,
                                        effort=10)
        result["real_fast_size_ratio"] = round(len(rf) / o_rf, 5)
        result["real_opt_size_ratio"] = round(len(ro) / o_ro, 5)
        log(f"real data ({len(rd)} B): fast size ratio "
            f"{result['real_fast_size_ratio']}, opt size ratio "
            f"{result['real_opt_size_ratio']}")
        del rf, ro

    # device + hybrid under a watchdog (remote compiles can queue)
    def on_timeout(_sig, _frm):
        log("device path timed out; reporting best host/device number")
        best = max(host_mbs, result["tpu_mbs"], result["hybrid_mbs"])
        tag = ("hybrid" if best == result["hybrid_mbs"] else
               "tpu" if best == result["tpu_mbs"] else "host_mt")
        finish(best, tag)
        os._exit(0)

    signal.signal(signal.SIGALRM, on_timeout)
    signal.alarm(timeout_s)
    tpu_mbs = hybrid_mbs = 0.0
    if os.environ.get("LZT_BENCH_SKIP_DEVICE") == "1":
        finish(host_mbs, "host_mt")
        return 0
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
        del warm
        if ok:
            for _ in range(reps):
                t = time.time()
                outd = dec.decode(stream, prop)
                tpu_mbs = max(tpu_mbs, len(data) / (time.time() - t) / 1e6)
            assert outd == data
            del outd
            result["tpu_mbs"] = round(tpu_mbs, 2)
            log(f"device decode (e2e incl D2H): {tpu_mbs:.2f} MB/s")
            # kernel-only rate from the iteration counters of one batch
            try:
                result["tpu_compute_mbs"] = round(
                    _compute_rate(stream, groups, shape), 2)
                log(f"device compute-only: {result['tpu_compute_mbs']} MB/s")
            except Exception as e:  # noqa: BLE001
                log(f"compute-rate probe failed: {e!r}")
            # hybrid: host workers + device feeder on one queue.  One
            # untimed warmup first (same treatment as the device path):
            # the first call pays the feeder's batch-shape jit traces and
            # seeds the rate cache — on few-core hosts that cold run
            # measures ~0.5x the steady state (docs/ROUND4.md)
            from lzma_sdk_zliblike_tpu.parallel.hybrid import (
                decode_lzma2_hybrid)
            warmh = decode_lzma2_hybrid(stream, prop, shape=shape)
            assert warmh == data
            del warmh
            for _ in range(reps):
                t = time.time()
                outh = decode_lzma2_hybrid(stream, prop, shape=shape)
                hybrid_mbs = max(hybrid_mbs,
                                 len(data) / (time.time() - t) / 1e6)
            assert outh == data
            del outh
            result["hybrid_mbs"] = round(hybrid_mbs, 2)
            log(f"hybrid decode: {hybrid_mbs:.2f} MB/s")
            # --- 256 KB groups: the shape where the chip can win races --
            # (device batch wall ~= group_size / per-lane kernel rate, so
            # 1 MB groups take longer than the hosts' whole drain on this
            # corpus; smaller groups let the device contribute steadily)
            sblock = 256 << 10
            s_stream = oracle_stream(data, sblock, f"{mb}m_{sblock >> 10}k")
            t = time.time()
            outs1 = decode_lzma2_mt(s_stream, prop)
            sb_host = len(data) / (time.time() - t) / 1e6
            assert outs1 == data
            del outs1
            result["smallgroup_host_mbs"] = round(sb_host, 2)
            s_groups = framing.split_groups(framing.scan(s_stream)[0])
            s_pack = max(sum(c.pack_size for c in g) for g in s_groups)
            s_shape = BatchShape(n_lanes=lanes,
                                 pack_cap=-(-s_pack // 4096) * 4096,
                                 dic_cap=sblock)
            sb_hyb = 0.0
            outs2 = decode_lzma2_hybrid(s_stream, prop, shape=s_shape)
            assert outs2 == data     # untimed warmup (shape jit + rates)
            del outs2
            for _ in range(reps):
                t = time.time()
                outs2 = decode_lzma2_hybrid(s_stream, prop, shape=s_shape)
                sb_hyb = max(sb_hyb, len(data) / (time.time() - t) / 1e6)
                assert outs2 == data
                del outs2
            result["smallgroup_hybrid_mbs"] = round(sb_hyb, 2)
            log(f"256KB groups: host {sb_host:.1f} MB/s, hybrid "
                f"{sb_hyb:.1f} MB/s")
            # --- reference-default 64 MB blocks (Lzma2Enc.c:223-233) ----
            # few groups, 64 MB in-kernel dictionaries: the shape a stock
            # reference archive has (dict 16 MB, block = 4 x dict)
            if os.environ.get("LZT_BENCH_SKIP_BIGBLOCK") != "1" and \
                    time.time() - t0_bench < timeout_s * 0.55:
                bblock = 64 << 20
                big_stream = oracle_stream(data, bblock,
                                           f"{mb}m_{bblock >> 10}k")
                t = time.time()
                outb2 = decode_lzma2_mt(big_stream, prop)
                bb_host = len(data) / (time.time() - t) / 1e6
                assert outb2 == data
                del outb2
                result["bigblock_host_mbs"] = round(bb_host, 2)
                from lzma_sdk_zliblike_tpu.models.lzma2 import framing
                from lzma_sdk_zliblike_tpu.utils.memory import (
                    shape_for_groups)
                bgroups = framing.split_groups(
                    framing.scan(big_stream)[0])
                bshape = shape_for_groups(
                    bgroups, max_lanes=max(1, min(4, len(bgroups))))
                bdec = BatchedLzma2Decoder(bshape, engine="pallas")
                t = time.time()
                outd2 = bdec.decode(big_stream, prop)
                bb_tpu = len(data) / (time.time() - t) / 1e6
                ok2 = outd2 == data
                del outd2
                if ok2:
                    result["bigblock_tpu_mbs"] = round(bb_tpu, 2)
                    # one timed rerun without the compile, time permitting
                    if time.time() - t0_bench < timeout_s * 0.7:
                        t = time.time()
                        outd2 = bdec.decode(big_stream, prop)
                        bb_tpu = max(bb_tpu,
                                     len(data) / (time.time() - t) / 1e6)
                        assert outd2 == data
                        del outd2
                        result["bigblock_tpu_mbs"] = round(bb_tpu, 2)
                log(f"bigblock (64MB groups x {len(bgroups)}): host "
                    f"{bb_host:.1f} MB/s, tpu "
                    f"{result['bigblock_tpu_mbs']} MB/s bit-exact={ok2}")
                # hybrid on the reference-default shape: must be >= host
                # (the feeder abstains when the device cannot win a group)
                bb_hyb = 0.0
                outh2 = decode_lzma2_hybrid(big_stream, prop, shape=bshape)
                assert outh2 == data   # untimed warmup (shape jit + rates)
                del outh2
                for _ in range(2):
                    t = time.time()
                    outh2 = decode_lzma2_hybrid(big_stream, prop,
                                                shape=bshape)
                    bb_hyb = max(bb_hyb,
                                 len(data) / (time.time() - t) / 1e6)
                    assert outh2 == data
                    del outh2
                result["bigblock_hybrid_mbs"] = round(bb_hyb, 2)
                log(f"bigblock hybrid: {bb_hyb:.1f} MB/s")
            # --- device range ENCODER (find->parse->code pipeline) ------
            # kernel-only rate on a pre-parsed resident batch, plus the
            # end-to-end device-coded stream vs the host MT encoder
            # (byte-identity is part of the measurement)
            if time.time() - t0_bench < timeout_s * 0.8:
                try:
                    _bench_device_encode(data, result, log)
                except Exception as e:  # noqa: BLE001
                    log(f"device encode bench failed: {e!r}")
        signal.alarm(0)
    except Exception as e:  # device path must never sink the bench
        signal.alarm(0)
        log(f"device path failed: {e!r}")
    best = max(host_mbs, tpu_mbs, hybrid_mbs)
    tag = ("hybrid" if best == hybrid_mbs and hybrid_mbs > 0 else
           "tpu" if best == tpu_mbs and tpu_mbs > 0 else "host_mt")
    finish(best, tag)
    return 0


def _bench_device_encode(data, result, log):
    """Device range-encode rows: kernel-only MB/s + e2e vs host MT."""
    import numpy as np
    from lzma_sdk_zliblike_tpu import native as lzt_native
    from lzma_sdk_zliblike_tpu.ops import pallas_encode as PE
    from lzma_sdk_zliblike_tpu.parallel.device_encode import (
        encode_lzma2_device_coded)
    from lzma_sdk_zliblike_tpu.parallel.host_pool import encode_lzma2_mt

    sl = data[:32 << 20]
    lanes = 32
    group = 1 << 20
    spans = [(i, min(i + group, len(sl)))
             for i in range(0, len(sl), group)][:lanes]
    lane_ops, lane_tabs = [], []
    for s, e in spans:
        o, t, _b = lzt_native.lzma2_group_ops(sl[s:e], 1 << 20)
        lane_ops.append(o)
        lane_tabs.append(t)
    ops_words, meta, out_pages, nch = PE.pack_ops_batch(lane_ops, lane_tabs)
    h = PE.submit_encode_groups(ops_words, meta, out_pages=out_pages)
    _bodies, ok = PE.finalize_encode(h, nch)
    if not ok.all():
        log(f"device encode warmup: {int(ok.sum())}/{len(spans)} lanes ok")
    best = 1e18
    for _ in range(2):
        t = time.time()
        h = PE.submit_encode_groups(ops_words, meta, out_pages=out_pages)
        np.asarray(h[1])
        best = min(best, time.time() - t)
    unpack = sum(e - s for s, e in spans)
    result["encode_device_kernel_mbs"] = round(unpack / best / 1e6, 2)
    log(f"device encode kernel: {result['encode_device_kernel_mbs']} MB/s "
        f"({len(spans)} lanes x 1 MB)")
    # e2e: parse (host threads) + device code + framing, vs host MT bytes
    ref, _p = encode_lzma2_mt(sl, dict_size=1 << 20, chunk_size=group)
    t = time.time()
    dev, _p2 = encode_lzma2_device_coded(sl, dict_size=1 << 20,
                                         chunk_size=group, lanes=lanes)
    dt = time.time() - t
    result["encode_device_mbs"] = round(len(sl) / dt / 1e6, 2)
    result["encode_device_identical"] = int(dev == ref)
    log(f"device-coded e2e: {result['encode_device_mbs']} MB/s, "
        f"byte-identical={bool(dev == ref)}")


def _compute_rate(stream, groups, shape):
    """Kernel-only MB/s: device wall time of one pre-packed batch.

    The packed arrays are built OUTSIDE the timed region and the call is
    dispatched on already-device-resident inputs, so the measurement is
    kernel execution (plus dispatch), not host-side numpy packing.
    """
    import numpy as np
    import jax.numpy as jnp
    from lzma_sdk_zliblike_tpu.ops import pallas_decode as P
    from lzma_sdk_zliblike_tpu.parallel.scheduler import BatchedLzma2Decoder

    dec = BatchedLzma2Decoder(shape, engine="pallas")
    eligible = [gi for gi, g in enumerate(groups) if dec._eligible(g)]
    k = dec._multi_k(groups, eligible)
    if k > 1:
        # mirror the production multi-group packing (K dict-reset groups
        # per lane): time ONE such batch on pre-packed resident inputs
        take = sorted(eligible,
                      key=lambda gi: -sum(c.pack_size
                                          for c in groups[gi]))
        take = take[:k * shape.n_lanes]
        lanes = [[] for _ in range(shape.n_lanes)]
        unp = [0] * shape.n_lanes
        for gi in take:
            li = min(range(shape.n_lanes), key=lambda i: unp[i])
            u = sum(c.unpack_size for c in groups[gi])
            if unp[li] + u > k * shape.dic_cap:
                continue
            lanes[li].append(gi)
            unp[li] += u
        src, pe, ue, fl, act, _n_chunks = dec._assemble_multi(
            stream, [[groups[gi] for gi in lane] for lane in lanes], k)
        meta, words, dims = P._prep_groups(src, pe, ue, fl, act,
                                           dic_cap=k * shape.dic_cap)
        lane_unpack = [sum(sum(c.unpack_size for c in groups[gi])
                           for gi in lane) for lane in lanes]
        unpack = sum(lane_unpack)
        n_check = sum(1 for lane in lanes if lane)
    else:
        lane_groups = [groups[gi] for gi in eligible][:shape.n_lanes]
        meta, words, dims = dec._pack_batch_pallas(stream, lane_groups)
        unpack = sum(sum(c.unpack_size for c in g) for g in lane_groups)
        n_check = len(lane_groups)
    n, in_pages, out_pages, n_chunks = dims
    meta_d = jnp.asarray(meta)
    words_d = jnp.asarray(words)

    has_copy = bool((np.asarray(meta[5]) & 4).any())

    def run():
        return P._decode_call(
            meta_d, words_d, n_streams=n, in_pages=in_pages,
            out_pages=out_pages, lc=shape.lc, lp=shape.lp, pb=shape.pb,
            n_chunks=n_chunks, interpret=P._resolve_interpret(None),
            has_copy=has_copy)

    np.asarray(run()[1])  # warm/sync
    t = time.time()
    status = np.asarray(run()[1])
    dt = time.time() - t
    assert (status[0, :n_check, 0] != 0).all()
    return unpack / dt / 1e6


if __name__ == "__main__":
    sys.exit(main())
