"""Device-assisted LZMA2 encoding: TPU match finding + native host coding.

The reference encoder's hot engine is the match finder (SURVEY §2.1,
``LzFind.c``); the range coder that consumes its output is serial and
cheap.  This module splits the pipeline accordingly, the TPU way:

* the **TPU** computes per-position match candidates for a whole batch of
  chunks at once (``ops/match_find.py`` — sorted-bucket finder, one
  ``lax.sort`` instead of a hash-chain walk),
* the **native host coder** runs the lazy fast parse + range coding over
  the candidates (``native/lzt_codec.cc lzt_lzma2_encode_ext``),
  re-measuring true match lengths with memcmp as it consumes them.

Chunks are LZMA2 dict-reset groups (``Lzma2Enc.c:324-327`` equivalent), so
candidates never cross chunk boundaries and every chunk is an independent
lane — the same data-parallel unit the batched decoder uses.
"""

from __future__ import annotations

import numpy as np

from .. import native
from ..ops import match_find


def encode_lzma2_device(data: bytes, *, dict_size: int = 1 << 16,
                        chunk_size: int = 1 << 16, lanes: int = 32,
                        n_cand: int = 24, lc: int = 3, lp: int = 0,
                        pb: int = 2, effort: int = 9) -> tuple[bytes, int]:
    """Encode to a parallel-group LZMA2 stream; returns (stream, prop).

    Byte-compatible with any LZMA2 decoder; compressed size tracks the
    host fast path (same parse, candidate source differs).
    """
    if chunk_size & (chunk_size - 1):
        raise ValueError("chunk_size must be a power of two")
    if dict_size < chunk_size:
        dict_size = chunk_size
    n = len(data)
    if n == 0:
        return native.lzma2_encode(data, dict_size, chunk_size, True,
                                   lc, lp, pb, effort)
    arr = np.frombuffer(data, np.uint8)
    n_chunks = -(-n // chunk_size)
    padded = np.zeros((n_chunks, chunk_size), np.uint8)
    padded.reshape(-1)[:n] = arr
    valid = np.minimum(
        n - np.arange(n_chunks, dtype=np.int64) * chunk_size,
        chunk_size).astype(np.int32)

    n_cand8 = max(1, n_cand // 2)
    k_tot = n_cand + n_cand8
    ext = np.zeros((n_chunks * chunk_size, k_tot), np.int32)
    for base in range(0, n_chunks, lanes):
        hi = min(base + lanes, n_chunks)
        rows = np.zeros((lanes, chunk_size), np.uint8)
        rows[:hi - base] = padded[base:hi]
        v = np.zeros(lanes, np.int32)
        v[:hi - base] = valid[base:hi]
        _bl, _bd, cands = match_find.find_matches(rows, v, n_cand=n_cand,
                                                  n_cand8=n_cand8)
        stacked = np.stack(cands, axis=-1)       # [lanes, L, K]
        ext[base * chunk_size:hi * chunk_size] = \
            stacked[:hi - base].reshape(-1, k_tot)

    return native.lzma2_encode_ext(data, ext[:n], dict_size, chunk_size,
                                   lc=lc, lp=lp, pb=pb, effort=effort)


# ---------------------------------------------------------------------------
# Device range coding: host parse -> TPU range-code (the full pipeline)
# ---------------------------------------------------------------------------

def _op_pages_cap(chunk_size: int) -> int:
    """Fixed op-page count per group size: ONE compiled kernel shape per
    config (a fresh Mosaic compile inside a timed run costs more than the
    padding).  The cap doubles as a WORK FILTER: kernel wall scales with
    the densest lane's op count (lockstep iterations), so literal-dense
    groups — the ones the host's fast parse handles at its best ratio —
    are evicted to the host, keeping device batches match-heavy where one
    iteration covers ~10 output bytes."""
    words = chunk_size // 2 + 2 * PAGE
    return -(-words // PAGE)


def _out_pages4_cap(chunk_size: int) -> int:
    b = chunk_size + (chunk_size >> 3) + 4096
    return -(-b // 512)


from ..ops.pallas_encode import PAGE  # noqa: E402

def encode_lzma2_device_coded(data: bytes, *, dict_size: int = 1 << 20,
                              chunk_size: int = 1 << 20,
                              lanes: int = 32, threads: int | None = None,
                              lc: int = 3, lp: int = 0, pb: int = 2,
                              interpret: bool | None = None,
                              progress=None) -> tuple[bytes, int]:
    """LZMA2 encode with the range-coding stage on the device.

    The find→parse→code pipeline (the reference's LzFindMt.c + MtCoder.c
    pair, SURVEY §2.4): host threads run the fast parse per dict-reset
    group exporting op streams (``lzt_lzma2_group_ops``); the TPU kernel
    (``ops/pallas_encode``) range-codes a whole batch of groups
    lane-parallel.  Output is byte-identical to
    ``host_pool.encode_lzma2_mt`` at the same parameters: chunk bodies
    match the native coder bit for bit, and any group the device flags
    (emission-run overflow) or that needs a copy-chunk fallback is
    re-encoded by the native host coder.
    """
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    from ..models.lzma2.framing import encode_dict_prop
    from ..ops import pallas_encode as PE
    from .host_pool import normalize_threads

    if not native.group_ops_available():
        from .host_pool import encode_lzma2_mt
        return encode_lzma2_mt(data, dict_size=dict_size,
                               chunk_size=chunk_size, threads=threads,
                               lc=lc, lp=lp, pb=pb)

    prop = encode_dict_prop(dict_size)
    real_dict = (0xFFFFFFFF if prop == 40
                 else (2 | (prop & 1)) << (prop // 2 + 11))
    n = len(data)
    if n == 0:
        return b"\x00", prop
    spans = [(i, min(i + chunk_size, n)) for i in range(0, n, chunk_size)]
    nt = normalize_threads(threads, max(len(spans), 1))

    def parse_group(span):
        start, end = span
        return native.lzma2_group_ops(data[start:end], real_dict,
                                      lc=lc, lp=lp, pb=pb)

    def host_group(span):
        start, end = span
        stream, _p = native.lzma2_encode(
            data[start:end], dict_size, chunk_size, True,
            lc=lc, lp=lp, pb=pb, effort=9)
        return stream[:-1]

    props_byte = (pb * 5 + lp) * 9 + lc

    def frame_group(span, bodies):
        """LZMA2 chunk headers around device bodies (lzma2_encode_impl
        framing; device groups never contain copy chunks — oversize
        bodies fall back whole-group)."""
        start, end = span
        sub = min(48 << 10, chunk_size)
        out = bytearray()
        pos = start
        for j, body in enumerate(bodies):
            cend = min(pos + sub, end)
            unpack = cend - pos
            if len(body) >= min(unpack, 1 << 16):
                return None          # copy-chunk case: host re-encodes
            mode = 3 if j == 0 else 0
            u = unpack - 1
            out.append(0x80 | (mode << 5) | (u >> 16))
            out.append((u >> 8) & 0xFF)
            out.append(u & 0xFF)
            out.append((len(body) - 1) >> 8)
            out.append((len(body) - 1) & 0xFF)
            if mode >= 2:
                out.append(props_byte)
            out += body
            pos = cend
        return bytes(out)

    results: list[bytes | None] = [None] * len(spans)
    with ThreadPoolExecutor(max_workers=nt) as pool:
        parsed = list(pool.map(parse_group, spans))
        # ascending op count: homogeneous batches (kernel wall follows
        # the densest lane), densest groups cap out to the host
        order = sorted(range(len(spans)), key=lambda i: len(parsed[i][0]))
        for base in range(0, len(order), lanes):
            batch = order[base:base + lanes]
            lane_ops = [parsed[i][0] for i in batch]
            lane_tabs = [parsed[i][1] for i in batch]
            ops_words, meta, out_pages, lane_nch = PE.pack_ops_batch(
                lane_ops, lane_tabs, n_lanes=lanes,
                op_pages_min=_op_pages_cap(chunk_size),
                out_pages4_min=_out_pages4_cap(chunk_size))
            handle = PE.submit_encode_groups(ops_words, meta,
                                             out_pages=out_pages,
                                             lc=lc, lp=lp, pb=pb,
                                             interpret=interpret)
            bodies, ok = PE.finalize_encode(handle, lane_nch)
            retry = []
            for li, gi in enumerate(batch):
                framed = (frame_group(spans[gi], bodies[li])
                          if bodies[li] is not None else None)
                if framed is None:
                    retry.append(gi)
                else:
                    results[gi] = framed
            for gi, part in zip(retry, pool.map(
                    host_group, [spans[i] for i in retry])):
                results[gi] = part
            if progress is not None:
                done = sum(e - s for (s, e), r in zip(spans, results)
                           if r is not None)
                progress(done, sum(len(r) for r in results if r))
    out = b"".join(results) + b"\x00"  # type: ignore[arg-type]
    return out, prop


def encode_lzma2_hybrid(data: bytes, *, dict_size: int = 1 << 20,
                        chunk_size: int = 1 << 20, lanes: int = 32,
                        threads: int | None = None,
                        lc: int = 3, lp: int = 0, pb: int = 2,
                        interpret: bool | None = None) -> tuple[bytes, int]:
    """Host cores and the device range coder drain one group queue.

    The encode twin of ``parallel/hybrid.py``: host workers take whole
    groups from the front (full native encode); a feeder thread takes
    batches from the back, fast-parses them (the cheap half of host
    encode) and ships the range coding to the device kernel.  Every group
    is byte-identical regardless of who encodes it, so the output never
    depends on the race.  Hybrid >= host-only by construction: the feeder
    abstains when fewer than ``lanes`` groups remain.
    """
    import threading
    from collections import deque

    from ..models.lzma2.framing import encode_dict_prop
    from ..ops import pallas_encode as PE
    from .host_pool import normalize_threads

    if not native.group_ops_available():
        from .host_pool import encode_lzma2_mt
        return encode_lzma2_mt(data, dict_size=dict_size,
                               chunk_size=chunk_size, threads=threads,
                               lc=lc, lp=lp, pb=pb)

    prop = encode_dict_prop(dict_size)
    real_dict = (0xFFFFFFFF if prop == 40
                 else (2 | (prop & 1)) << (prop // 2 + 11))
    n = len(data)
    if n == 0:
        return b"\x00", prop
    spans = [(i, min(i + chunk_size, n)) for i in range(0, n, chunk_size)]
    results: list[bytes | None] = [None] * len(spans)
    lock = threading.Lock()
    todo: deque[int] = deque(range(len(spans)))
    no_device: set[int] = set()   # groups the device already bounced
    errors: list[Exception] = []
    props_byte = (pb * 5 + lp) * 9 + lc
    sub = min(48 << 10, chunk_size)

    def host_one(gi):
        start, end = spans[gi]
        stream, _p = native.lzma2_encode(
            data[start:end], dict_size, chunk_size, True,
            lc=lc, lp=lp, pb=pb, effort=9)
        return stream[:-1]

    def frame_group(span, bodies):
        start, end = span
        out = bytearray()
        pos = start
        for j, body in enumerate(bodies):
            cend = min(pos + sub, end)
            unpack = cend - pos
            if len(body) >= min(unpack, 1 << 16):
                return None
            mode = 3 if j == 0 else 0
            u = unpack - 1
            out.append(0x80 | (mode << 5) | (u >> 16))
            out.append((u >> 8) & 0xFF)
            out.append(u & 0xFF)
            out.append((len(body) - 1) >> 8)
            out.append((len(body) - 1) & 0xFF)
            if mode >= 2:
                out.append(props_byte)
            out += body
            pos = cend
        return bytes(out)

    def host_worker():
        while True:
            with lock:
                if errors or not todo:
                    return
                gi = todo.popleft()
            try:
                results[gi] = host_one(gi)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(e)
                return

    def device_feeder():
        try:
            while True:
                with lock:
                    if errors:
                        return
                    # abstain when the hosts can finish the tail faster
                    # than one more device batch: a batch's wall is
                    # minutes-scale D2H+dispatch on the tunnel, so the
                    # feeder participates only while the queue still holds
                    # many batches' worth of work (the decode hybrid's
                    # latency-guard idea, parallel/hybrid.py)
                    eligible = [gi for gi in todo if gi not in no_device]
                    if len(eligible) < lanes * 8:
                        return
                    batch = eligible[-min(lanes, len(eligible)):]
                    for gi in batch:
                        todo.remove(gi)
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=3) as ppool:
                    parsed = list(ppool.map(
                        lambda gi: native.lzma2_group_ops(
                            data[spans[gi][0]:spans[gi][1]], real_dict,
                            lc=lc, lp=lp, pb=pb), batch))
                ops_words, meta, out_pages, nch = PE.pack_ops_batch(
                    [p[0] for p in parsed], [p[1] for p in parsed],
                    n_lanes=lanes,
                    op_pages_min=_op_pages_cap(chunk_size),
                    out_pages4_min=_out_pages4_cap(chunk_size))
                handle = PE.submit_encode_groups(
                    ops_words, meta, out_pages=out_pages,
                    lc=lc, lp=lp, pb=pb, interpret=interpret)
                bodies, _ok = PE.finalize_encode(handle, nch)
                requeue = []
                for li, gi in enumerate(batch):
                    framed = (frame_group(spans[gi], bodies[li])
                              if bodies[li] is not None else None)
                    if framed is None:
                        requeue.append(gi)  # dense/fallback: host encodes
                    else:
                        results[gi] = framed
                if requeue:
                    with lock:
                        no_device.update(requeue)
                        todo.extendleft(requeue)
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(e)

    nt = normalize_threads(threads, max(len(spans), 1))
    workers = [__import__("threading").Thread(target=host_worker)
               for _ in range(nt)]
    feeder = __import__("threading").Thread(target=device_feeder,
                                            daemon=True)
    for w in workers:
        w.start()
    feeder.start()
    for w in workers:
        w.join()
    # the feeder holds claimed groups; wait unless a worker errored
    while feeder.is_alive():
        feeder.join(timeout=0.05)
        with lock:
            if errors:
                break
    if errors:
        raise errors[0]
    # groups the feeder re-queued after every host worker exited (and any
    # other straggler) are encoded here — the steal-back of last resort
    for gi, r in enumerate(results):
        if r is None:
            results[gi] = host_one(gi)
    return b"".join(results) + b"\x00", prop  # type: ignore[arg-type]
