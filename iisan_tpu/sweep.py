"""Grid-sweep runner: the L7 experiment layer.

The reference's sweep scripts are nested for-loops formatting torchrun
command strings into ``os.system`` (/root/reference/Code_Uncached/scripts/
run_IISAN.py:50-82).  TPU-native replacement: a declarative grid expanded
in-process - no process-per-run, no NCCL re-init; each run reuses the
already-initialized TPU runtime and jit cache (identical SAN geometries
recompile nothing).

    from iisan_tpu.sweep import run_sweep
    run_sweep(base_overrides={...}, grid={"lr": [1e-4, 2e-4], "seed": [1,2]})

Canonical experiment grids from the reference's shipped scripts are in
``scripts/`` at the repo root (SURVEY.md section 2.1 #18).
"""

from __future__ import annotations

import itertools
import logging
import os
from typing import Any, Dict, Iterable, List, Tuple

from .config import IISANConfig

log = logging.getLogger("iisan_tpu")


def expand_grid(grid: Dict[str, Iterable]) -> List[Dict[str, Any]]:
    keys = list(grid)
    return [dict(zip(keys, vals))
            for vals in itertools.product(*(grid[k] for k in keys))]


def run_sweep(base_overrides: Dict[str, Any], grid: Dict[str, Iterable],
              dry_run: bool = False) -> List[Tuple[Dict, Any]]:
    """Run every grid point; returns [(point, TrainResult)]."""
    from .train.pipelines import run_from_config

    results = []
    for point in expand_grid(grid):
        cfg = IISANConfig(**{**base_overrides, **point})
        label = "_".join(f"{k}{v}" for k, v in point.items())
        # path-like values (dataset=Dataset/Scientific) would otherwise
        # put separators into the log filename
        label = label.replace(os.sep, "-").replace("/", "-")
        cfg = cfg.replace(label_screen=label).with_bert_dims()
        log.info("=== sweep point %s ===", label)
        if dry_run:
            results.append((point, None))
            continue
        _, res = run_from_config(cfg)
        results.append((point, res))
    return results
