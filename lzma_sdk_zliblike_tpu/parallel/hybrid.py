"""Hybrid LZMA2 decode: host cores and the TPU chew the same group queue.

The reference's MtCoder spreads blocks over CPU threads only
(``MtCoder.c:185-224``); a TPU host has two kinds of silicon — a few host
cores running the scalar engine at O(10) MB/s each, and the chip running
the lane-parallel Pallas kernel.  This scheduler uses both at once, with
four guarantees the round-2 version lacked (it was 4.4x slower than
host-only because the device claimed a fixed quarter of the queue and
claimed groups could never be reclaimed):

* **Rate-proportional device batches.**  The feeder sizes each batch to
  the device's *measured* share of the combined drain rate (kernel wall
  time per batch scales with the compiled lane count, so a small batch in
  a small compiled shape really is proportionally cheaper).  A slow
  device takes a small slice; a fast one takes up to ``shape.n_lanes``
  per batch.  The first batch of each compiled shape is treated as
  warmup and excluded from the rate estimate (remote compile on the
  tunnel would otherwise poison it to ~0).
* **First-result-wins slots.**  Every group's result slot is claimed
  under a lock exactly once (the deterministic ordered gather keyed by
  group index); whichever engine finishes a group first owns it.
* **Host steal-back.**  When the queue drains while device batches are
  still in flight, host workers re-decode those batches' unfinished
  groups (newest batch first, back to front) instead of idling — the run
  can never end on a device-tail stall, so hybrid >= host-only by
  construction (the reference's token rings have the same no-stall
  property, ``MtCoder.c:185-224``).
* **Non-blocking endgame + latency guard.**  In-flight batches whose
  slots the hosts already won are DISCARDED without touching the device
  handle (a blocking D2H there held round 2's runs hostage), and the
  feeder abstains entirely when the measured per-lane kernel rate says a
  batch cannot finish before the hosts drain what's left — batch wall
  time is ~group_size / per-lane-rate regardless of lane count, so on
  short queues the device simply cannot win and should not try.
"""

from __future__ import annotations

import os
import threading
import time
from collections import deque

from ..models.lzma2 import framing
from ..utils.errors import DataError
from ..utils.trace import TRACE
from .host_pool import decode_group_native
from .scheduler import BatchShape, BatchedLzma2Decoder


def _pow2_ceil(k: int) -> int:
    return 1 << max(2, (k - 1).bit_length())


# measured device drain rates survive across calls (keyed by batch
# geometry), so repeat decodes skip the small probe batches and start
# with the right device share immediately.  Entries are rescaled to a
# fixed-size window at store time (rates seed the next run, lifetime
# sums don't accumulate), the size is bounded, and access is locked.
_RATE_CACHE: dict[tuple[int, int], tuple[float, float, float, float]] = {}
_RATE_LOCK = threading.Lock()
_RATE_CACHE_MAX = 32
_RATE_WINDOW_S = 2.0  # seed weight: pretend we saw ~2s of device work


def decode_lzma2_hybrid(stream: bytes, dict_prop: int, *,
                        shape: BatchShape | None = None,
                        threads: int | None = None,
                        device: bool = True,
                        progress=None) -> bytes:
    """Decode an LZMA2 stream on host threads + the device concurrently.

    ``progress(in_bytes, out_bytes)`` is invoked at each group completion
    (``ICompressProgress``, ``Types.h:220-225``); returning ``False``
    aborts: the abort poisons every engine the way ``MtCoder_SetError``
    does (``MtCoder.c:101-107``) — host workers stop at their next group
    boundary, the feeder submits no further batches and discards its
    in-flight ones without touching the device handle, and the call
    raises ``ProgressAborted``.
    """
    framing.decode_dict_prop(dict_prop)  # validate
    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    n_groups = len(groups)
    if shape is None:
        from ..utils.memory import shape_for_groups
        shape = shape_for_groups(groups)
    dec = BatchedLzma2Decoder(shape, engine="pallas")

    results: list[bytes | None] = [None] * n_groups
    done = [False] * n_groups
    gsize = [sum(c.unpack_size for c in g) for g in groups]
    lock = threading.Lock()
    # eligibility is static per group: split the queue up front
    dev_ok: deque[int] = deque()
    host_first: deque[int] = deque()
    for gi, g in enumerate(groups):
        # pure-copy groups are a host memcpy — never worth the D2H
        if dec._eligible(g) and any(c.is_lzma for c in g):
            dev_ok.append(gi)
        else:
            host_first.append(gi)
    inflight: dict[int, list[int]] = {}   # batch key -> unstolen group idxs
    key_ctr = [0]                         # batch key counter (under lock)
    errors: list[Exception] = []
    t0_all = time.monotonic()
    rates = {"host_bytes": 0.0, "dev_bytes": 0.0, "dev_time": 0.0,
             "dev_lane_s": 0.0, "dev_proc": 0.0}
    rate_key = (shape.dic_cap, shape.pack_cap)
    with _RATE_LOCK:
        cached = _RATE_CACHE.get(rate_key)
    if cached is not None:
        (rates["dev_bytes"], rates["dev_time"], rates["dev_lane_s"],
         rates["dev_proc"]) = cached
    warmed_shapes: set[int] = set()

    gin = [sum(c.pack_size for c in g) for g in groups]
    prog = {"in": 0, "out": 0}
    prog_lock = threading.Lock()

    def claim(gi: int, data: bytes, who: str) -> None:
        """First-result-wins slot write + rate accounting."""
        with lock:
            if done[gi]:
                return
            done[gi] = True
            results[gi] = data
            rates[who] += gsize[gi]
        if progress is not None:
            # the user callback runs OUTSIDE the scheduler lock (it may
            # be arbitrarily slow) and serialized under its own lock;
            # False poisons all engines via the shared error list
            with prog_lock:
                prog["in"] += gin[gi]
                prog["out"] += gsize[gi]
                if not errors and progress(prog["in"],
                                           prog["out"]) is False:
                    from ..utils.errors import ProgressAborted
                    errors.append(ProgressAborted())

    def pop_host() -> int | None:
        with lock:
            if host_first:
                return host_first.popleft()
            if dev_ok:
                return dev_ok.pop()
            # steal-back: newest in-flight batch, back to front (the
            # groups the device's ordered finalize will reach last)
            for key in sorted(inflight, reverse=True):
                batch = inflight[key]
                while batch:
                    gi = batch.pop()
                    if not done[gi]:
                        TRACE.add("hybrid.steals")
                        return gi
            return None

    def host_worker():
        while not errors:
            gi = pop_host()
            if gi is None:
                return
            try:
                data = decode_group_native(stream, groups[gi], dict_prop)
            except Exception as e:  # noqa: BLE001
                errors.append(DataError(
                    f"host decode failed for group {gi}: {e}"))
                return
            claim(gi, data, "host_bytes")

    def host_rate() -> float:
        dt = time.monotonic() - t0_all
        return rates["host_bytes"] / dt if dt > 0.2 else 0.0

    def dev_rate() -> float | None:
        if rates["dev_time"] <= 0:
            if rates["dev_lane_s"] > 0:
                # batches ran but were all discarded: not "unmeasured" —
                # return the floor so the latency/abstain guards engage
                # instead of probing forever
                return 1e5
            return None                  # not yet measured
        # a device that won zero slots still keeps a tiny share so it
        # never divides the split by zero and keeps getting probed
        return max(rates["dev_bytes"] / rates["dev_time"], 1e5)

    def take_dev_batch() -> list[int]:
        """Size a batch to the device's measured share of the drain.

        Latency guard: the kernel's per-lane rate is fixed, so a batch of
        G-byte groups takes ~G/per-lane-rate wall time REGARDLESS of lane
        count.  If the hosts would drain everything left before that, a
        device batch cannot win a single slot — abstain (hybrid == host
        exactly) instead of burning feeder CPU on doomed batches.
        """
        with lock:
            remaining = len(dev_ok)
            rem_bytes = sum(gsize[gi] for gi in dev_ok)
        if remaining == 0:
            return []
        dr = dev_rate()
        if dr is None:
            k = 4                        # probe/warmup batch
        else:
            hr = host_rate()
            if hr <= 0:
                hr = dr * 4.0   # conservative until the host rate is known
            share = dr / (dr + hr)
            k = max(4, int(remaining * share))
            # batch wall ~= group size / per-lane rate, lane-independent
            # (per-lane rate from PROCESSED bytes, so a device that lost
            # every race still gets an honest latency estimate)
            if rates["dev_proc"] > 0 and rates["dev_lane_s"] > 0:
                per_lane = rates["dev_proc"] / rates["dev_lane_s"]
                est_batch_s = (rem_bytes / remaining) / per_lane
                if hr > 0 and est_batch_s > 0.9 * (rem_bytes / hr):
                    TRACE.add("hybrid.dev_abstained")
                    return []
            elif rates["dev_lane_s"] > 8.0:
                # many lane-seconds burned, zero slots ever won: the
                # device cannot beat the hosts on this workload — stop
                TRACE.add("hybrid.dev_abstained")
                return []
        k = min(shape.n_lanes, _pow2_ceil(min(k, remaining)))
        out: list[int] = []
        with lock:
            while dev_ok and len(out) < k:
                out.append(dev_ok.popleft())
            if out:
                # register under the SAME lock acquisition that pops the
                # queue: a gap here let host workers observe all queues
                # empty and exit for good, leaving the rest of the decode
                # to the slow device alone
                key_ctr[0] += 1
                inflight[key_ctr[0]] = list(out)
        return out

    def finalize(key: int, idxs: list[int], handle, t_sub: float,
                 n_lanes: int):
        outs = dec._finalize_batch_pallas(
            handle, [groups[i] for i in idxs], stream, idxs)
        dt = time.monotonic() - t_sub
        with lock:
            inflight.pop(key, None)
        if n_lanes in warmed_shapes:
            rates["dev_time"] += dt
            rates["dev_lane_s"] += dt * n_lanes
            rates["dev_proc"] += float(sum(gsize[gi] for gi in idxs))
        else:
            warmed_shapes.add(n_lanes)   # first use = compile, not rate
        # dev_bytes is only credited for slots the device actually won
        # (claim handles that), so the rate reflects useful device work
        TRACE.add("hybrid.dev_batches")
        for gi, data in zip(idxs, outs):
            claim(gi, data, "dev_bytes")

    PRIOR_PER_LANE = 0.3e6   # conservative kernel prior, bytes/s/lane
    D2H_PRIOR = 15e6         # tunnel D2H floor, bytes/s

    def drain_one(key: int, idxs: list[int], handle, t0: float,
                  n_lanes: int):
        """Retire one in-flight batch without ever stalling the run.

        A blocking device fetch (np.asarray on the handle) cannot be
        interrupted, so it is only entered once the batch's ESTIMATED
        completion time has elapsed (measured per-lane kernel rate, or a
        conservative prior before any measurement, plus the D2H share).
        Until then: poll cheaply, and DISCARD the batch the moment hosts
        have claimed every slot — the dangling device work completes
        asynchronously, unobserved, and the run's critical path can never
        exceed host-only (the round-2 tail stall is structurally gone).
        """
        if rates["dev_proc"] > 0 and rates["dev_lane_s"] > 0:
            per_lane = rates["dev_proc"] / rates["dev_lane_s"]
        else:
            per_lane = PRIOR_PER_LANE
        batch_bytes = float(sum(gsize[gi] for gi in idxs))
        est = batch_bytes / (per_lane * n_lanes) + batch_bytes / D2H_PRIOR
        while not errors:
            with lock:
                all_done = all(done[gi] for gi in idxs)
                if all_done:
                    inflight.pop(key, None)
            if all_done:
                # record the elapsed wall as lane-seconds with ZERO bytes
                # processed: a conservative lower bound that pushes the
                # latency guard toward abstaining when the device keeps
                # losing races (discarded batches must not leave the rate
                # model blind)
                if n_lanes in warmed_shapes:
                    rates["dev_lane_s"] += (time.monotonic() - t0) * n_lanes
                else:
                    warmed_shapes.add(n_lanes)
                TRACE.add("hybrid.dev_batches_discarded")
                return
            if time.monotonic() - t0 >= est:
                finalize(key, idxs, handle, t0, n_lanes)
                return
            time.sleep(0.005)

    def device_feeder():
        pending: deque[tuple[int, list[int], object, float, int]] = deque()
        try:
            while not errors:
                batch = take_dev_batch()
                if batch:
                    # the pow2 floor must never exceed the HBM-budgeted
                    # lane cap (a 1-lane budget shape padded to 4 lanes
                    # would ask for 4x the budget)
                    n_lanes = min(max(shape.n_lanes, 1),
                                  _pow2_ceil(len(batch)))
                    key = key_ctr[0]
                    t0 = time.monotonic()
                    handle = dec._submit_batch_pallas(
                        stream, [groups[i] for i in batch],
                        n_lanes=n_lanes)
                    pending.append((key, batch, handle, t0, n_lanes))
                # keep at most 2 in flight: finalize the oldest so device
                # compute overlaps D2H + host unpack of the next batch
                while len(pending) > (1 if batch else 0):
                    key, idxs, handle, t0, nl = pending.popleft()
                    drain_one(key, idxs, handle, t0, nl)
                if not batch and not pending:
                    return
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    nt = threads if threads and threads > 0 else (os.cpu_count() or 1)
    workers = [threading.Thread(target=host_worker) for _ in range(nt)]
    feeder = threading.Thread(target=device_feeder,
                              daemon=True) if device else None
    for w in workers:
        w.start()
    if feeder:
        feeder.start()
    for w in workers:
        w.join()
    if feeder:
        # once every slot is host-filled the feeder is pure cleanup — a
        # cold-process compile inside its submit (minutes on the tunnel)
        # must not hold the result hostage.  Abandoning is safe: with all
        # slots done the feeder only ever takes the no-D2H discard path,
        # then exits; it lingers as a daemon thread until then.
        while feeder.is_alive():
            feeder.join(timeout=0.02)
            if not feeder.is_alive():
                break
            with lock:
                # abandon when done, AND when a host worker has recorded an
                # error — the feeder may be wedged in an un-interruptible
                # device fetch and must not keep the error from raising
                bail = (all(done) and not errors) or bool(errors)
            if bail:
                TRACE.add("hybrid.feeder_abandoned")
                break
    if rates["dev_time"] > 0:
        scale = min(1.0, _RATE_WINDOW_S / rates["dev_time"])
        with _RATE_LOCK:
            if len(_RATE_CACHE) >= _RATE_CACHE_MAX and \
                    rate_key not in _RATE_CACHE:
                _RATE_CACHE.pop(next(iter(_RATE_CACHE)))
            _RATE_CACHE[rate_key] = (rates["dev_bytes"] * scale,
                                     rates["dev_time"] * scale,
                                     rates["dev_lane_s"] * scale,
                                     rates["dev_proc"] * scale)
    TRACE.add("hybrid.host_bytes", rates["host_bytes"])
    TRACE.add("hybrid.dev_bytes", rates["dev_bytes"])
    if errors:
        raise errors[0]
    missing = [i for i, r in enumerate(results) if r is None]
    if missing:
        raise DataError(f"hybrid decode dropped groups {missing[:4]}")
    return b"".join(results)  # type: ignore[arg-type]
