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

    Every process runs the same program (SPMD); the result bytes are
    returned on process 0 (None elsewhere).  Group metadata comes from the
    host-side scan (identical on every process — the stream bytes are the
    broadcast); each process materializes only its local shard of the lane
    arrays via ``jax.make_array_from_callback``.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.lzma2 import framing
    from ..ops import batched_decode as B

    mesh = global_lane_mesh()
    n_dev = len(jax.devices())
    n_lanes = n_dev * lanes_per_device

    chunks, _ = framing.scan(stream)
    groups = framing.split_groups(chunks)
    out_parts: list[bytes | None] = [None] * len(groups)

    # multi-chunk groups are first-class: a group is device-eligible when
    # every chunk is an LZMA chunk with default props fitting the static
    # shapes; chunk j of every lane decodes in lockstep with state carry
    # (reset flags re-init the model exactly like Lzma2Dec.c:246-257)
    eligible = []
    for gi, g in enumerate(groups):
        if (all(c.is_lzma and c.pack_size <= pack_cap for c in g)
                and sum(c.unpack_size for c in g) <= dic_cap
                and all(c.props is None
                        or (c.props.lc, c.props.lp, c.props.pb) == (3, 0, 2)
                        for c in g)):
            eligible.append(gi)
        else:
            out_parts[gi] = framing.decode_chunks(stream, g)

    sh = NamedSharding(mesh, P("dp"))

    from jax.experimental import multihost_utils
    for base in range(0, len(eligible), n_lanes):
        batch = eligible[base:base + n_lanes]
        lane = B.init_lane_state(n_lanes, 3, 0, dic_cap)
        lane = jax.tree.map(lambda x: jax.device_put(x, sh), lane)
        max_chunks = max(len(groups[gi]) for gi in batch)
        all_ok = True
        for j in range(max_chunks):
            src = np.zeros((n_lanes, pack_cap), np.uint8)
            pl = np.zeros((n_lanes,), np.int32)
            ul = np.zeros((n_lanes,), np.int32)
            reset = np.zeros((n_lanes,), bool)
            act = np.zeros((n_lanes,), bool)
            for li, gi in enumerate(batch):
                g = groups[gi]
                if j >= len(g):
                    continue
                c = g[j]
                src[li, :c.pack_size] = np.frombuffer(
                    stream, np.uint8, c.pack_size, c.data_off)
                pl[li] = c.pack_size
                ul[li] = c.unpack_size
                reset[li] = c.mode >= framing.MODE_STATE
                act[li] = True
            args = [jax.device_put(jnp.asarray(a), sh)
                    for a in (src, pl, ul, reset, act)]
            lane, ok, _cons, _it = B.lzma_chunk_step(lane, *args)
            okh = multihost_utils.process_allgather(ok, tiled=True)
            all_ok = bool(np.asarray(okh).all()) and all_ok
        if not all_ok:
            raise RuntimeError("distributed decode failed on a lane")
        dic = np.asarray(
            multihost_utils.process_allgather(lane.dic, tiled=True)
        ).astype(np.uint8)
        for li, gi in enumerate(batch):
            unpack = sum(c.unpack_size for c in groups[gi])
            out_parts[gi] = dic[li, :unpack].tobytes()

    if jax.process_index() != 0:
        return None
    return b"".join(out_parts)  # ordered gather by group index


def run_local_cluster(n_processes: int, script: str, *, devices_per_proc: int = 2,
                      timeout: int = 1200) -> list[subprocess.CompletedProcess]:
    """Launch N local processes forming a jax.distributed CPU cluster."""
    procs = []
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = ":".join(
        p for p in env_base.get("PYTHONPATH", "").split(":")
        if ".axon_site" not in p)
    for pid in range(n_processes):
        env = dict(env_base)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={devices_per_proc}",
            "LZT_NUM_PROCESSES": str(n_processes),
            "LZT_PROCESS_ID": str(pid),
            "LZT_COORDINATOR": "localhost:9911",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))))
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        results.append(subprocess.CompletedProcess(p.args, p.returncode, out))
    return results
