"""Device-mesh sharding for the batched codec.

The reference's parallelism is an in-process thread ring (``MtCoder.c``);
the TPU-native equivalent shards the *lane* axis of the batched decoder
over a ``jax.sharding.Mesh``:

* ``dp`` axis — dict-reset groups (lanes) are embarrassingly parallel, so
  every per-lane array partitions on its first dimension;
* the packet loop's ``jnp.any`` termination checks become cross-device
  reductions (the only collectives the decode needs — everything else is
  lane-local, so communication rides ICI only at loop conds);
* ordered output assembly stays a deterministic host-side gather keyed by
  group index (the MtCoder write-token ring equivalent, already in the
  scheduler).

Multi-host: the same mesh spec over ``jax.distributed`` processes; each
host feeds its local shard of lanes and the gather assembles stream order.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# -- 2-axis parallelism algebra (chips x lanes-per-chip) --------------------
#
# The reference factorizes totalThreads = lzmaThreads x blockThreads
# (Lzma2EncProps_Normalize, Lzma2Enc.c:176-221).  The TPU analog is
# chips (block-parallel dp axis) x lanes-per-chip (the kernel's intra-chip
# lane batch): normalize_axes solves the same t1*t2=t3 system with the
# same resolution precedence, and make_mesh_2d builds the matching
# two-axis device mesh for multi-host/multi-chip runs.

MAX_CHIP_AXIS = 64            # dp-axis bound (MtCoder ring bound analog)
DEFAULT_LANES_PER_CHIP = 64   # kernel lane batch when unspecified


def normalize_axes(per_chip: int | None, chips: int | None,
                   total: int | None, *,
                   default_per_chip: int = DEFAULT_LANES_PER_CHIP,
                   max_chips: int = MAX_CHIP_AXIS) -> tuple[int, int, int]:
    """Resolve (lanes_per_chip, chips, total_lanes) with t1*t2=t3.

    Mirrors ``Lzma2EncProps_Normalize`` (``Lzma2Enc.c:176-221``): -1/None
    means "derive me"; a fully specified pair wins over ``total``.
    """
    t1 = per_chip if per_chip and per_chip > 0 else 0
    t2 = chips if chips and chips > 0 else 0
    t3 = total if total and total > 0 else 0
    t1n = t1 if t1 > 0 else default_per_chip
    if t2 > max_chips:
        t2 = max_chips
    if t3 <= 0:
        if t2 <= 0:
            t2 = 1
        t3 = t1n * t2
    elif t2 <= 0:
        t2 = t3 // t1n
        if t2 == 0:
            t1 = 1
            t2 = t3
        if t2 > max_chips:
            t2 = max_chips
    elif t1 <= 0:
        t1 = t3 // t2
        if t1 == 0:
            t1 = 1
    else:
        t3 = t1n * t2
    if t1 <= 0:
        t1 = t1n
    return t1, t2, t3


def make_mesh_2d(chips: int, per_chip: int,
                 axes: tuple[str, str] = ("dp", "lane")) -> Mesh:
    """Two-axis mesh: [chips, per_chip] devices; lane arrays partition on
    the flattened product (see ``lane_sharding_2d``)."""
    devs = jax.devices()
    need = chips * per_chip
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(chips, per_chip), axes)


def lane_sharding_2d(mesh: Mesh) -> NamedSharding:
    """[N, ...] lane arrays partitioned over BOTH mesh axes."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def lane_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for [N, ...] per-lane arrays: partition the lane dim."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_lane_state(lane_state, mesh: Mesh, axis: str = "dp"):
    """Place a LaneState pytree with the lane dimension partitioned."""
    sh = lane_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), lane_state)


def shard_batch_args(mesh: Mesh, *arrays, axis: str = "dp"):
    sh = lane_sharding(mesh, axis)
    return tuple(jax.device_put(a, sh) for a in arrays)
