"""Device mesh and sharding helpers.

TPU-native replacement for the reference's torch.distributed runtime
(/root/reference/Code_Cached/run.py:479 NCCL init, DDP wrap at run.py:258,
DistributedSampler at run.py:124): a 1-D ``data`` mesh over all devices,
batch-dim sharding for inputs, replicated parameters.  Gradient averaging is
the psum XLA inserts for replicated-param/ sharded-batch jit - the ICI
analog of DDP's ring all-reduce; the eval all_gather
(data_utils/metrics.py:43-47) becomes an implicit output resharding.

The mesh is deliberately N-D-ready: ``make_mesh("data:4,model:2")`` builds
extra axes for tensor-sharding the Versa 8192-dim caches across chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(spec: str = "", devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from a "name:size,name:size" spec; empty = all devices
    on one ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if not spec:
        return Mesh(np.asarray(devices), ("data",))
    names, sizes = [], []
    for part in spec.split(","):
        name, size = part.split(":")
        names.append(name)
        sizes.append(int(size))
    arr = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(arr, tuple(names))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of host arrays with batch-dim sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
