"""Chunk scheduler: maps LZMA2 streams onto batched decoder lanes.

The reference's MtCoder splits work into blocks compressed by a ring of
threads with token-passing for ordered output (``MtCoder.c:185-224``).  The
TPU equivalent: dict-reset *groups* are gathered into fixed-shape batches,
every lane decodes its group's chunk ``j`` in lockstep on device, and the
ordered "write token ring" becomes a deterministic host-side concat keyed by
group index.

Eligibility: a group runs on-device when all its chunks are LZMA chunks
sharing the batch's (lc, lp, pb) and it fits the batch's static shapes.
Copy-only groups are plain memcpy.  Anything else (mixed copy/LZMA groups —
rare) falls back to the scalar engine, chunk-exact.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..models.lzma2 import framing
from ..utils.errors import DataError
from ..utils.trace import TRACE


@dataclasses.dataclass(frozen=True)
class BatchShape:
    """Static shapes for one compiled decode kernel."""

    n_lanes: int = 256
    pack_cap: int = 1 << 16          # per-chunk packed bytes (64 KB max)
    dic_cap: int = 1 << 18           # per-group unpacked bytes
    lc: int = 3
    lp: int = 0
    pb: int = 2


class BatchedLzma2Decoder:
    """Decodes LZMA2 streams via the lane-parallel device kernel.

    engine="xla": the pure-XLA lockstep kernel (``ops/batched_decode``).
    engine="pallas": the Mosaic kernel (``ops/pallas_decode``) — the whole
    group (all its chunks, with state carry and per-chunk RC/prob resets,
    uncompressed copy chunks included) runs on the vector core; groups
    with >128 chunks fall back to the XLA path.
    """

    def __init__(self, shape: BatchShape = BatchShape(),
                 engine: str = "xla"):
        self.shape = shape
        self.engine = engine

    # -- group eligibility --------------------------------------------------
    def _eligible(self, group: list[framing.Chunk]) -> bool:
        s = self.shape
        unpack = sum(c.unpack_size for c in group)
        if unpack > s.dic_cap:
            return False
        if self.engine == "pallas":
            # in-kernel chunk loop: concatenated bodies share the packed
            # source buffer; ≤128 chunks per group (table lane limit);
            # copy chunks run in-kernel (phase 0.5 mover) provided the
            # stream is well-formed (state reset on the LZMA chunk after
            # a copy chunk, Lzma2Dec.c:14-26 grammar)
            if len(group) > 128:
                return False
            if sum(c.pack_size for c in group) > s.pack_cap:
                return False
            need_reset = True   # fresh kernel probs need a reset chunk
            for c in group:
                if not c.is_lzma:
                    if c.pack_size != c.unpack_size:
                        return False
                    need_reset = True
                    continue
                if need_reset and c.mode < framing.MODE_STATE:
                    return False
                if c.props is not None and \
                        (c.props.lc, c.props.lp, c.props.pb) != \
                        (s.lc, s.lp, s.pb):
                    return False
                need_reset = False
            return True
        for c in group:
            if not c.is_lzma:
                return False
            if c.pack_size > s.pack_cap:
                return False
            if c.props is not None and (c.props.lc, c.props.lp, c.props.pb) != (s.lc, s.lp, s.pb):
                return False
        return True

    def decode(self, stream: bytes, dict_prop: int) -> bytes:
        framing.decode_dict_prop(dict_prop)  # validate
        chunks, _ = framing.scan(stream)
        groups = framing.split_groups(chunks)
        return b"".join(self.decode_groups(stream, groups))

    def decode_groups(self, stream: bytes,
                      groups: list[list[framing.Chunk]]) -> list[bytes]:
        """Decode dict-reset groups, preserving order (ordered gather)."""
        results: list[bytes | None] = [None] * len(groups)
        device_idx: list[int] = []
        for gi, g in enumerate(groups):
            if all(not c.is_lzma for c in g):
                results[gi] = b"".join(
                    stream[c.data_off:c.data_off + c.pack_size] for c in g)
            elif self._eligible(g):
                device_idx.append(gi)
            else:
                TRACE.add("scheduler.host_fallback_groups")
                results[gi] = framing.decode_chunks(stream, g)
        # batch the device-eligible groups; sort by packed size so each
        # batch holds similar per-lane work (iteration count = max packets
        # over the batch's lanes — heterogeneous batches straggle)
        s = self.shape
        device_idx.sort(
            key=lambda gi: -sum(c.pack_size for c in groups[gi]))
        # multi-group lanes: when there are more eligible groups than
        # lanes, pack several dict-reset groups back to back per lane
        # (kernel flags bit3 rebases the coder positions) — the per-batch
        # max-lane tail then covers K groups' work instead of idling the
        # short lanes, and there are K x fewer kernel dispatches
        multik = self._multi_k(groups, device_idx)
        if multik > 1:
            return self._decode_groups_multi(stream, groups, device_idx,
                                             results, multik)
        batches = [device_idx[base:base + s.n_lanes]
                   for base in range(0, len(device_idx), s.n_lanes)]
        # pipeline: submit every pallas-eligible batch before finalizing any
        # (async JAX dispatch overlaps device compute with host assembly and
        # per-call dispatch latency); XLA-path batches run synchronously
        pending: list[tuple[list[int], object]] = []
        for lane_idx in batches:
            lane_groups = [groups[i] for i in lane_idx]
            if self.engine == "pallas" and all(
                    not g[0].is_lzma or g[0].mode >= framing.MODE_STATE
                    for g in lane_groups):
                TRACE.add("scheduler.pallas_batches")
                pending.append((lane_idx, self._submit_batch_pallas(
                    stream, lane_groups)))
            else:
                TRACE.add("scheduler.xla_batches")
                outs = self._decode_batch_xla(stream, lane_groups)
                for gi, data in zip(lane_idx, outs):
                    results[gi] = data
        for lane_idx, handle in pending:
            outs = self._finalize_batch_pallas(
                handle, [groups[i] for i in lane_idx], stream, lane_idx)
            for gi, data in zip(lane_idx, outs):
                results[gi] = data
        return results  # type: ignore[return-value]

    def _multi_k(self, groups, device_idx) -> int:
        """Groups-per-lane target for multi-group lanes (1 = off)."""
        s = self.shape
        if self.engine != "pallas" or len(device_idx) <= s.n_lanes:
            return 1
        from ..ops.pallas_decode import _default_tune
        if "chunkflow" not in _default_tune().split(","):
            return 1   # flags bit3 needs the chunkflow transition path
        if not all(not groups[gi][0].is_lzma
                   or groups[gi][0].mode >= framing.MODE_STATE
                   for gi in device_idx):
            return 1
        return min(4, -(-len(device_idx) // s.n_lanes))

    def _decode_groups_multi(self, stream, groups, device_idx, results,
                             k: int):
        """Pallas path with K dict-reset groups packed per lane."""
        s = self.shape
        remaining = list(device_idx)
        pending: list[tuple[list[list[int]], object]] = []
        while remaining:
            take, remaining = (remaining[:k * s.n_lanes],
                               remaining[k * s.n_lanes:])
            lanes: list[list[int]] = [[] for _ in range(s.n_lanes)]
            load = [0] * s.n_lanes
            unp = [0] * s.n_lanes
            nch = [0] * s.n_lanes
            for gi in take:              # LPT: least-loaded lane first
                g = groups[gi]
                p = sum(c.pack_size for c in g)
                u = sum(c.unpack_size for c in g)
                for li in sorted(range(s.n_lanes),
                                 key=lambda i: load[i]):
                    if (unp[li] + u <= k * s.dic_cap
                            and load[li] + p <= k * s.pack_cap
                            and nch[li] + len(g) <= 128):
                        lanes[li].append(gi)
                        load[li] += p
                        unp[li] += u
                        nch[li] += len(g)
                        break
                else:                    # rare bin-packing overflow
                    remaining.insert(0, gi)
            TRACE.add("scheduler.pallas_multi_batches")
            pending.append((lanes, self._submit_batch_pallas_multi(
                stream, [[groups[gi] for gi in lane] for lane in lanes],
                k)))
        for lanes, handle in pending:
            self._finalize_batch_pallas_multi(
                handle, lanes, groups, stream, results, k)
        return results

    def _assemble_multi(self, stream, lane_lists, k: int):
        """Like _assemble, but each lane holds a LIST of dict-reset
        groups concatenated; every group's first chunk after the first
        carries flags bit1|bit3 (state reset + dict rebase)."""
        s = self.shape
        n = s.n_lanes
        n_chunks = max((sum(len(g) for g in lg) for lg in lane_lists),
                       default=1)
        n_chunks = min(128, -(-max(1, n_chunks) // 4) * 4)
        src = np.zeros((n, k * s.pack_cap), np.uint8)
        pe = np.zeros((n, n_chunks), np.int32)
        ue = np.zeros((n, n_chunks), np.int32)
        fl = np.zeros((n, n_chunks), np.int32)
        act = np.zeros(n, np.int32)
        for li, lg in enumerate(lane_lists):
            if not lg:
                continue
            acc_p = acc_u = 0
            j = 0
            for gi2, g in enumerate(lg):
                for ci, c in enumerate(g):
                    src[li, acc_p:acc_p + c.pack_size] = np.frombuffer(
                        stream, np.uint8, c.pack_size, c.data_off)
                    acc_p += c.pack_size
                    acc_u += c.unpack_size
                    pe[li, j] = acc_p
                    ue[li, j] = acc_u
                    f = 1 | (0 if c.is_lzma else 4)
                    if ci == 0 and gi2 > 0:
                        f |= 2 | 8           # group boundary in-lane
                    elif ci > 0 and c.is_lzma and \
                            c.mode >= framing.MODE_STATE:
                        f |= 2
                    fl[li, j] = f
                    j += 1
            pe[li, j:] = acc_p
            ue[li, j:] = acc_u
            act[li] = 1
        return src, pe, ue, fl, act, n_chunks

    def _submit_batch_pallas_multi(self, stream, lane_lists, k: int):
        from ..ops import pallas_decode as P

        s = self.shape
        src, pe, ue, fl, act, _ = self._assemble_multi(stream, lane_lists,
                                                       k)
        return P.submit_groups(src, pe, ue, fl, act,
                               dic_cap=k * s.dic_cap,
                               lc=s.lc, lp=s.lp, pb=s.pb)

    def _finalize_batch_pallas_multi(self, handle, lanes, groups, stream,
                                     results, k: int):
        """Materialize a multi-group batch; failed lanes retry per group
        on the host (one corrupt group fails alone)."""
        from ..ops import pallas_decode as P

        s = self.shape
        out, ok, _consumed = P.finalize_chunks(handle,
                                               dic_cap=k * s.dic_cap)
        for li, lane in enumerate(lanes):
            off = 0
            for gi in lane:
                g = groups[gi]
                u = sum(c.unpack_size for c in g)
                if ok[li]:
                    results[gi] = out[li, off:off + u].tobytes()
                else:
                    TRACE.add("scheduler.lane_retries")
                    try:
                        results[gi] = framing.decode_chunks(stream, g)
                    except Exception as e:
                        raise DataError(
                            f"LZMA2 decode failed for dict-reset group "
                            f"{gi} (device verdict and host retry both "
                            f"failed): {e}") from e
                off += u

    def _pack_batch_pallas(self, stream: bytes,
                           lane_groups: list[list[framing.Chunk]]):
        """Assemble (meta, words, dims) for one kernel call, host-side."""
        from ..ops import pallas_decode as P

        src, pe, ue, fl, act, n_chunks = self._assemble(stream, lane_groups)
        return P._prep_groups(src, pe, ue, fl, act, dic_cap=self.shape.dic_cap)

    def _submit_batch_pallas(self, stream: bytes,
                             lane_groups: list[list[framing.Chunk]],
                             n_lanes: int | None = None):
        from ..ops import pallas_decode as P

        s = self.shape
        src, pe, ue, fl, act, _ = self._assemble(stream, lane_groups,
                                                 n_lanes)
        return P.submit_groups(src, pe, ue, fl, act, dic_cap=s.dic_cap,
                               lc=s.lc, lp=s.lp, pb=s.pb)

    def _assemble(self, stream: bytes,
                  lane_groups: list[list[framing.Chunk]],
                  n_lanes: int | None = None):
        s = self.shape
        n = n_lanes or s.n_lanes
        # n_chunks is a jit-static kernel arg: bucket it (multiples of 4)
        # so batches with 1..4, 5..8, ... chunks share ONE compiled shape
        # — unbucketed, nearly every hybrid batch was a fresh ~2-4 s
        # compile inside the timed run.  Padded rounds cost ~1 masked
        # iteration each (flags 0).
        n_chunks = max(len(g) for g in lane_groups)
        n_chunks = min(128, -(-n_chunks // 4) * 4)
        src = np.zeros((n, s.pack_cap), np.uint8)
        pe = np.zeros((n, n_chunks), np.int32)
        ue = np.zeros((n, n_chunks), np.int32)
        fl = np.zeros((n, n_chunks), np.int32)
        act = np.zeros(n, np.int32)
        for li, g in enumerate(lane_groups):
            acc_p = acc_u = 0
            for j, c in enumerate(g):
                src[li, acc_p:acc_p + c.pack_size] = np.frombuffer(
                    stream, np.uint8, c.pack_size, c.data_off)
                acc_p += c.pack_size
                acc_u += c.unpack_size
                pe[li, j] = acc_p
                ue[li, j] = acc_u
                fl[li, j] = (1
                             | (2 if (j > 0 and c.is_lzma and
                                      c.mode >= framing.MODE_STATE) else 0)
                             | (0 if c.is_lzma else 4))
            # padding entries repeat the final cumulative values, flags 0
            pe[li, len(g):] = acc_p
            ue[li, len(g):] = acc_u
            act[li] = 1
        return src, pe, ue, fl, act, n_chunks

    def _finalize_batch_pallas(self, handle,
                               lane_groups: list[list[framing.Chunk]],
                               stream: bytes,
                               group_idx: list[int]) -> list[bytes]:
        """Materialize a batch; failed lanes retry on the host, alone.

        The reference's MtCoder poisons the whole ring on any thread error
        (``MtCoder.c:226-247``); here a bad lane is re-decoded by the scalar
        host engine so one corrupt group fails by itself, identified by its
        group index, without discarding the batch's other lanes.
        """
        from ..ops import pallas_decode as P

        out, ok, _consumed = P.finalize_chunks(handle,
                                               dic_cap=self.shape.dic_cap)
        outs: list[bytes] = []
        for li, g in enumerate(lane_groups):
            if ok[li]:
                outs.append(out[li, :sum(c.unpack_size for c in g)].tobytes())
                continue
            TRACE.add("scheduler.lane_retries")
            try:
                outs.append(framing.decode_chunks(stream, g))
            except Exception as e:
                raise DataError(
                    f"LZMA2 decode failed for dict-reset group "
                    f"{group_idx[li]} (device verdict and host retry both "
                    f"failed): {e}") from e
        return outs

    def _decode_batch_xla(self, stream: bytes,
                          lane_groups: list[list[framing.Chunk]]
                          ) -> list[bytes]:
        import jax.numpy as jnp
        from ..ops import batched_decode as B

        s = self.shape
        n = s.n_lanes
        max_chunks = max(len(g) for g in lane_groups)
        lane = B.init_lane_state(n, s.lc, s.lp, s.dic_cap)
        npz = np.zeros
        all_ok = True
        for j in range(max_chunks):
            src = npz((n, s.pack_cap), np.uint8)
            pack_len = npz((n,), np.int32)
            unpack_len = npz((n,), np.int32)
            reset = npz((n,), bool)
            active = npz((n,), bool)
            for li, g in enumerate(lane_groups):
                if j >= len(g):
                    continue
                c = g[j]
                src[li, :c.pack_size] = np.frombuffer(
                    stream, np.uint8, c.pack_size, c.data_off)
                pack_len[li] = c.pack_size
                unpack_len[li] = c.unpack_size
                reset[li] = c.mode >= framing.MODE_STATE
                active[li] = True
            lane, ok, _consumed, _iters = B.lzma_chunk_step(
                lane, jnp.asarray(src), jnp.asarray(pack_len),
                jnp.asarray(unpack_len), jnp.asarray(reset),
                jnp.asarray(active), lc=s.lc, lp=s.lp, pb=s.pb)
            all_ok = bool(np.asarray(ok).all()) and all_ok
        if not all_ok:
            raise DataError("batched LZMA2 decode failed on at least one lane")
        dic = np.asarray(lane.dic).astype(np.uint8)
        outs = []
        for li, g in enumerate(lane_groups):
            unpack = sum(c.unpack_size for c in g)
            outs.append(dic[li, :unpack].tobytes())
        return outs
