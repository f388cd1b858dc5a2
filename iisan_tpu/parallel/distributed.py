"""Multi-host runtime initialization.

Replaces the reference's launcher stack
(``torch.distributed.launch``/``torchrun`` + NCCL process-group init,
/root/reference/Code_Cached/run.py:479, scripts/run_IISAN.py:68-69): one
process per host calls ``initialize_runtime()``; JAX's distributed runtime
wires the hosts, the global mesh spans every chip, and collectives ride
ICI (DCN only coordinates input pipelines).

Per-host input sharding (the DistributedSampler analog, run.py:124): each
host enumerates only its slice of users via ``host_shard``.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

log = logging.getLogger("iisan_tpu")


def initialize_runtime(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when launched multi-host.

    With no args, relies on the TPU environment's auto-bootstrap; single
    process (the common dev case) is a no-op.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    log.info("process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def make_global(arr: np.ndarray, sharding) -> jax.Array:
    """Host numpy -> (possibly multi-process) global device array.

    Every process calls this with the SAME full array (cheap host data:
    permutations, token indices, metrics inputs); each process materializes
    only the shards addressable to it.  This is the TPU-native replacement
    for DistributedSampler rank slicing (run.py:124) - the slicing IS the
    sharding.  Works identically in single-process mode.
    """
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def put_global(x, sharding) -> jax.Array:
    """device_put in single-process mode; make_global on multi-process
    meshes (where device_put cannot address remote devices)."""
    if jax.process_count() > 1:
        return make_global(np.asarray(x), sharding)
    return jax.device_put(x, sharding)


def owned_rows(sharding, global_shape) -> np.ndarray:
    """Global row indices (axis 0) whose shards live on THIS process's
    devices.  The host input pipeline (image decode) produces only these -
    the work-partitioning half of the DistributedSampler analog
    (Code_Uncached/run.py:146)."""
    rows = set()
    for sl in sharding.addressable_devices_indices_map(
            tuple(global_shape)).values():
        r = sl[0] if sl else slice(None)
        rows.update(range(*r.indices(global_shape[0])))
    return np.asarray(sorted(rows), dtype=np.int64)


def replicate_global(tree, mesh):
    """Replicate a host pytree across every device of a (possibly
    multi-process) mesh.  All processes must pass identical values (they do:
    params/corpus derive from the same seed and files)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: make_global(np.asarray(x), repl), tree)


def host_shard(n: int, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> np.ndarray:
    """Contiguous per-host index shard padded to equal size by repeating
    the LAST index (indices[-1]-style padding) - the
    SequentialDistributedSampler layout (dataset.py:324-348).  Callers
    must crop the duplicated tail rows before reductions (eval_concat
    analog)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n // pc)
    idx = np.arange(pi * per, (pi + 1) * per)
    return np.where(idx < n, idx, n - 1)
