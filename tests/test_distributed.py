"""Multi-host helpers: per-host input sharding semantics."""

import numpy as np

from iisan_tpu.parallel.distributed import host_shard, initialize_runtime


def test_initialize_single_process_noop():
    initialize_runtime()  # must be a no-op single-process


def test_host_shard_partition():
    n, pc = 103, 4
    shards = [host_shard(n, pi, pc) for pi in range(pc)]
    per = -(-n // pc)
    assert all(len(s) == per for s in shards)
    covered = np.concatenate(shards)
    # every real index covered; padding repeats the last index
    assert set(range(n)) <= set(covered.tolist())
    assert covered.max() == n - 1
