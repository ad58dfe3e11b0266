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
