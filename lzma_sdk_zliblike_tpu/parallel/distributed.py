"""Multi-host decode/encode over ``jax.distributed``.

The reference has no multi-process story at all (shared-memory Win32
threads only, ``Threads.c``); the TPU-native equivalent per SURVEY §5.8:

* ``jax.distributed.initialize`` across hosts;
* the global mesh's ``dp`` axis spans all hosts' devices; every host feeds
  its local shard of dict-reset groups (host-local file I/O);
* group *sizes* are broadcast with the stream scan (metadata is tiny);
  compressed/decoded payloads are all-gathered in stream order only when a
  single host needs the full result — otherwise each host writes its own
  shard and ordering is by global group index (deterministic, no host-0
  serialization).

``run_local_cluster`` validates the same code path with N processes on one
machine (the driver's N≥2-host config), since this container has one chip.
"""

from __future__ import annotations

import os
import subprocess
import sys


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or cluster env (no-op if single)."""
    import jax
    if num_processes is None:
        num_processes = int(os.environ.get("LZT_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator
        or os.environ.get("LZT_COORDINATOR", "localhost:9911"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None else int(os.environ.get("LZT_PROCESS_ID", "0")),
    )


_barrier_n = [0]


def _sync_barrier(tag: str, timeout_ms: int = 600_000) -> None:
    """Coordination-service barrier (NOT a Gloo collective).

    Gloo context init has a hard 30 s key-value rendezvous timeout; any
    compile- or execution-time skew above that between processes kills
    the first collective touching a new communicator clique (observed:
    the interpret-mode decode kernel's XLA-CPU compile/run skew on a
    loaded 2-core host).  Lining processes up at the coordination
    service — which tolerates long waits — immediately before each
    collective section keeps the Gloo-visible skew at microseconds.
    No-op single-process or when the distributed client is absent.
    Callers must invoke this in the same order on every process (SPMD);
    the counter keeps barrier ids unique per use.
    """
    try:
        import jax
        if jax.process_count() <= 1:
            return
        from jax._src import distributed as _dist
        client = _dist.global_state.client
        if client is None:
            return
        _barrier_n[0] += 1
        client.wait_at_barrier(f"lzt_{tag}_{_barrier_n[0]}", timeout_ms)
    except Exception:
        return


def global_lane_mesh(axis: str = "dp"):
    """Mesh over ALL processes' devices (dp spans hosts)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def decode_groups_distributed(stream: bytes, *, dict_prop: int,
                              lanes_per_device: int = 8,
                              pack_cap: int = 1 << 14,
                              dic_cap: int = 1 << 14) -> bytes | None:
    """Decode an LZMA2 stream with lanes sharded over the global mesh.

    Every process runs the same SPMD program on the *Pallas group
    kernel* (``submit_groups_sharded`` — whole dict-reset groups with
    in-kernel chunk loop, copy chunks, state carry); the result bytes are
    returned on process 0 (None elsewhere).  Group metadata comes from the
    host-side scan (identical on every process — the stream bytes are the
    broadcast).  Groups are bucketed by their (lc, lp, pb) props triple —
    each props set compiles its own kernel shape, like the single-host
    scheduler — so eligibility is not pinned to default props.
    """
    import jax
    import numpy as np

    from ..models.lzma2 import framing
    from ..ops import pallas_decode as P
    from .scheduler import BatchShape, BatchedLzma2Decoder

    mesh = global_lane_mesh()
    n_dev = len(jax.devices())
    n_lanes = n_dev * lanes_per_device
    interpret = None if jax.devices()[0].platform == "tpu" else True

    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    out_parts: list[bytes | None] = [None] * len(groups)

    # bucket device-eligible groups by props triple; everything else
    # (oversize, >128 chunks, malformed) decodes on the host
    buckets: dict[tuple[int, int, int], list[int]] = {}
    decs: dict[tuple[int, int, int], BatchedLzma2Decoder] = {}
    for gi, g in enumerate(groups):
        key = None
        for c in g:
            if c.is_lzma and c.props is not None:
                key = (c.props.lc, c.props.lp, c.props.pb)
                break
        if key is not None and key not in decs:
            decs[key] = BatchedLzma2Decoder(
                BatchShape(n_lanes=n_lanes, pack_cap=pack_cap,
                           dic_cap=dic_cap, lc=key[0], lp=key[1],
                           pb=key[2]), engine="pallas")
        if key is not None and decs[key]._eligible(g):
            buckets.setdefault(key, []).append(gi)
        else:
            out_parts[gi] = framing.decode_chunks(stream, g)

    from jax.experimental import multihost_utils
    for key, idxs in sorted(buckets.items()):
        dec = decs[key]
        for base in range(0, len(idxs), n_lanes):
            batch = idxs[base:base + n_lanes]
            lane_groups = [groups[gi] for gi in batch]
            # pack the WHOLE batch once, outside any chunk loop
            src, pe, ue, fl, act, _ = dec._assemble(stream, lane_groups,
                                                    n_lanes)
            packed, status = P.submit_groups_sharded(
                src, pe, ue, fl, act, dic_cap=dic_cap, mesh=mesh,
                lc=key[0], lp=key[1], pb=key[2], interpret=interpret)
            # Finish the local shard's kernel work, then line up at the
            # coordination barrier so the allgather's Gloo rendezvous
            # sees near-zero skew (its 30 s init timeout is hard).
            jax.block_until_ready((packed, status))
            _sync_barrier("dec_gather")
            packed = np.asarray(
                multihost_utils.process_allgather(packed, tiled=True))
            status = np.asarray(
                multihost_utils.process_allgather(status, tiled=True))
            out, ok, _cons = P.finalize_chunks((packed, status),
                                               dic_cap=dic_cap)
            if not ok[:len(batch)].all():
                raise RuntimeError(
                    f"distributed decode failed on lanes "
                    f"{np.nonzero(~ok[:len(batch)])[0].tolist()}")
            for li, gi in enumerate(batch):
                unpack = sum(c.unpack_size for c in groups[gi])
                out_parts[gi] = out[li, :unpack].tobytes()

    if jax.process_index() != 0:
        return None
    return b"".join(out_parts)  # ordered gather by group index


def encode_groups_distributed(data: bytes, *, dict_size: int,
                              chunk_size: int = 1 << 20,
                              threads: int | None = None,
                              effort: int = 9, lc: int = 3, lp: int = 0,
                              pb: int = 2) -> tuple[bytes, int]:
    """LZMA2 encode with dict-reset blocks sharded over all processes.

    MtCoder's block parallelism (``MtCoder.c:272-327`` feeding
    ``Lzma2Enc.c:310-361``) lifted to the multi-host cluster: every
    process sees the same input (the broadcast), encodes the blocks
    ``i % nproc == pid`` with its local thread pool + native coder, and
    the compressed payloads are all-gathered IN BLOCK ORDER — the
    deterministic analog of MtCoder's ordered write-queue.  The output
    is byte-identical to ``host_pool.encode_lzma2_mt`` on one host
    (same block partition, same coder), so cluster size never changes
    the stream.  Returns ``(stream, dict_prop)`` on every process.
    """
    import jax
    import numpy as np
    from concurrent.futures import ThreadPoolExecutor
    from jax.experimental import multihost_utils

    from .. import native
    from ..models.lzma2.framing import encode_dict_prop
    from .host_pool import normalize_threads

    prop = encode_dict_prop(dict_size)
    if not data:
        return b"\x00", prop
    nproc = jax.process_count()
    pid = jax.process_index()
    n = len(data)
    blocks = [(i, min(i + chunk_size, n)) for i in range(0, n, chunk_size)]
    mine = list(range(pid, len(blocks), nproc))

    def encode_block(bi):
        start, end = blocks[bi]
        stream, _p = native.lzma2_encode(
            data[start:end], dict_size, chunk_size, True,
            lc=lc, lp=lp, pb=pb, effort=effort)
        return stream[:-1]  # strip the per-call EOS terminator

    nt = normalize_threads(threads, max(len(mine), 1))
    if mine:
        with ThreadPoolExecutor(max_workers=nt) as pool:
            parts = list(pool.map(encode_block, mine))
    else:
        parts = []

    # ordered gather: lengths first (so every process agrees on the pad
    # cap), then the zero-padded payload matrix; block i's bytes live in
    # row (i % nproc) * n_slots + (i // nproc) of the gathered matrix
    n_slots = -(-len(blocks) // nproc)
    lens = np.zeros(len(blocks), np.int32)
    for j, bi in enumerate(mine):
        lens[bi] = len(parts[j])
    if nproc > 1:
        _sync_barrier("enc_gather")
        lens = np.asarray(
            multihost_utils.process_allgather(lens, tiled=False)).sum(0)
    cap = int(lens.max())
    mat = np.zeros((n_slots, cap), np.uint8)
    for j, part in enumerate(parts):
        mat[j, :len(part)] = np.frombuffer(part, np.uint8)
    if nproc > 1:
        mat = np.asarray(
            multihost_utils.process_allgather(mat, tiled=False)
        ).reshape(nproc * n_slots, cap)
    out = bytearray()
    for bi in range(len(blocks)):
        row = (bi % nproc) * n_slots + (bi // nproc)
        out += mat[row, :lens[bi]].tobytes()
    out.append(0)  # EOS
    return bytes(out), prop


def run_local_cluster(n_processes: int, script: str, *, devices_per_proc: int = 2,
                      timeout: int = 1200) -> list[subprocess.CompletedProcess]:
    """Launch N local processes forming a jax.distributed CPU cluster."""
    # Fresh ephemeral coordinator port per launch: a fixed port is flaky
    # when a previous cluster's listener lingers (TIME_WAIT or a stale
    # process from an aborted run).
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        coord_port = s.getsockname()[1]
    procs = []
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = ":".join(
        p for p in env_base.get("PYTHONPATH", "").split(":")
        if ".axon_site" not in p)
    for pid in range(n_processes):
        env = dict(env_base)
        env.update({
            "JAX_PLATFORMS": "cpu",
            # optimization_level=0: the interpret-mode pallas kernel is a
            # huge XLA CPU graph; full opt passes cost minutes per shape
            # while the compiled kernel runs tiny test inputs — compile
            # time, not run time, is the budget here
            "XLA_FLAGS": ("--xla_backend_optimization_level=0 "
                          f"--xla_force_host_platform_device_count="
                          f"{devices_per_proc}"),
            "LZT_NUM_PROCESSES": str(n_processes),
            "LZT_PROCESS_ID": str(pid),
            "LZT_COORDINATOR": f"localhost:{coord_port}",
        })
        # the cluster validates the SHARDING machinery, which is kernel-
        # tune-agnostic; the default multilit tune's interpret-mode trace
        # is ~2x the ops and minutes of extra XLA-CPU compile per shape.
        # Run the light tune here — multilit correctness is pinned by the
        # dedicated kernel tests and the on-chip selftest.
        env.setdefault("LZT_TUNE", "pprev,stage2,chunkflow")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))))
    results = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            results.append(
                subprocess.CompletedProcess(p.args, p.returncode, out))
    finally:
        # a timeout must not leak CPU-bound cluster children
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return results
