"""Hybrid LZMA2 decode: host cores and the TPU chew the same group queue.

The reference's MtCoder spreads blocks over CPU threads only
(``MtCoder.c:185-224``); a TPU host has two kinds of silicon — a few host
cores running the scalar engine at O(10) MB/s each, and the chip running
the lane-parallel Pallas kernel.  This scheduler uses both at once:

* dict-reset groups are independent work items (``Lzma2Dec.c:14-26``);
* host worker threads pop groups from the TAIL of the queue (the native
  engine releases the GIL, so N workers = N cores);
* the device feeder takes ``n_lanes``-sized batches from the HEAD,
  pipelining submit/finalize so device compute overlaps the D2H fetch of
  the previous batch;
* results land in a per-group slot table — a deterministic ordered gather
  keyed by group index (the write-token-ring equivalent).

The split adapts automatically: whichever engine drains faster takes more
groups, with no rate model needed.
"""

from __future__ import annotations

import threading
from collections import deque

from ..models.lzma2 import framing
from ..utils.errors import DataError
from .host_pool import decode_group_native
from .scheduler import BatchShape, BatchedLzma2Decoder


def decode_lzma2_hybrid(stream: bytes, dict_prop: int, *,
                        shape: BatchShape | None = None,
                        threads: int | None = None,
                        device: bool = True) -> bytes:
    """Decode an LZMA2 stream on host threads + the device concurrently."""
    import os

    framing.decode_dict_prop(dict_prop)  # validate
    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    n_groups = len(groups)
    if shape is None:
        dic_cap = max((sum(c.unpack_size for c in g) for g in groups),
                      default=1 << 16)
        dic_cap = -(-dic_cap // 4096) * 4096
        pack_cap = max((sum(c.pack_size for c in g) for g in groups),
                       default=1 << 16)
        pack_cap = -(-pack_cap // 4096) * 4096
        shape = BatchShape(n_lanes=32, pack_cap=pack_cap, dic_cap=dic_cap)
    dec = BatchedLzma2Decoder(shape, engine="pallas")

    results: list[bytes | None] = [None] * n_groups
    # queue of device-eligible group indices; host-only groups are decoded
    # by the host workers regardless
    lock = threading.Lock()
    todo: deque[int] = deque(range(n_groups))
    errors: list[Exception] = []

    def pop_tail() -> int | None:
        with lock:
            return todo.pop() if todo else None

    def pop_head_batch(k: int) -> list[int]:
        out = []
        with lock:
            while todo and len(out) < k:
                gi = todo[0]
                g = groups[gi]
                # kernel lanes start with fresh probs: chunk 0 must be a
                # state-reset chunk (scheduler.decode_groups applies the
                # same gate)
                if not dec._eligible(g) or g[0].mode < framing.MODE_STATE:
                    break  # let a host worker take it from the head too
                out.append(todo.popleft())
            if not out and todo:
                # head group ineligible: rotate it to a host worker by
                # popping it ourselves and decoding on the host path
                out.append(-1 - todo.popleft())
        return out

    def host_worker():
        while not errors:
            gi = pop_tail()
            if gi is None:
                return
            try:
                results[gi] = decode_group_native(stream, groups[gi],
                                                  dict_prop)
            except Exception as e:  # noqa: BLE001
                errors.append(DataError(
                    f"host decode failed for group {gi}: {e}"))
                return

    def device_feeder():
        pending: deque[tuple[list[int], object]] = deque()
        try:
            while not errors:
                batch = pop_head_batch(shape.n_lanes)
                host_side = [-1 - gi for gi in batch if gi < 0]
                batch = [gi for gi in batch if gi >= 0]
                for gi in host_side:
                    results[gi] = decode_group_native(stream, groups[gi],
                                                      dict_prop)
                if batch:
                    handle = dec._submit_batch_pallas(
                        stream, [groups[i] for i in batch])
                    pending.append((batch, handle))
                # keep at most 2 in flight: finalize the oldest so device
                # compute overlaps D2H + host unpack of the previous batch
                while len(pending) > (1 if (todo or batch) else 0):
                    idxs, handle = pending.popleft()
                    outs = dec._finalize_batch_pallas(
                        handle, [groups[i] for i in idxs], stream, idxs)
                    for gi, data in zip(idxs, outs):
                        results[gi] = data
                if not batch and not pending:
                    return
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    nt = threads if threads and threads > 0 else (os.cpu_count() or 1)
    workers = [threading.Thread(target=host_worker) for _ in range(nt)]
    feeder = threading.Thread(target=device_feeder) if device else None
    for w in workers:
        w.start()
    if feeder:
        feeder.start()
    for w in workers:
        w.join()
    if feeder:
        feeder.join()
    if errors:
        raise errors[0]
    missing = [i for i, r in enumerate(results) if r is None]
    if missing:
        raise DataError(f"hybrid decode dropped groups {missing[:4]}")
    return b"".join(results)  # type: ignore[arg-type]
