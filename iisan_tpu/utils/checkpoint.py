"""Checkpoint save/restore: params + optimizer state + RNG + epoch.

The reference persists {model_state_dict, optimizer, rng_state,
cuda_rng_state} per epoch (/root/reference/Code_Cached/data_utils/utils.py:
104-110) and resumes all four plus the epoch parsed from the filename
(run.py:234-244).  TPU equivalent: an orbax PyTree checkpoint of
{params, opt_state, rng_key, epoch} under ``epoch-{n}``; the explicit
jax.random key replaces the torch/CUDA RNG blobs.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, epoch: int, state: Dict[str, Any]):
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch-{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(ckpt_dir: str, name: str,
                       target: Optional[Dict[str, Any]] = None):
    """``name`` e.g. "epoch-7"; returns (state, epoch) like run.py:241."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, target)
    m = re.search(r"epoch-(\d+)", name)
    return state, int(m.group(1)) if m else 0


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """(utils.py:58-70)"""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = {}
    for x in os.listdir(ckpt_dir):
        m = re.fullmatch(r"epoch-(\d+)", x)
        if m:
            cands[int(m.group(1))] = x
    if not cands:
        return None
    return cands[max(cands)]
