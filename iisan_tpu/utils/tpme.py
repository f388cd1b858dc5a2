"""TPME - the paper's composite Training-efficiency metric, in-framework.

The reference computes TPME offline from wall-clock timings, parameter
counts and GPU memory (README.md:91-96 / figs/efficiency-metric.png):

    TPME_i = a1 * t_hat_i + a2 * p_hat_i + a3 * m_hat_i

with min-max-normalized per-method (t)ime/epoch, trainable (p)arameters and
peak (m)emory, and paper weights a = (0.45, 0.10, 0.45).  Here the three
raw measurements are captured live (device memory from
``jax.local_devices()[0].memory_stats()``) and ``tpme_scores`` normalizes
across any set of recorded runs.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np

log = logging.getLogger("iisan_tpu")

ALPHA = (0.45, 0.10, 0.45)  # README.md:96 paper weights


def device_peak_memory_bytes() -> Optional[int]:
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats is None:
            return None
        return int(stats.get("peak_bytes_in_use",
                             stats.get("bytes_in_use", 0)))
    except Exception:  # pragma: no cover - backend without memory_stats
        return None


def trainable_param_count(trainer) -> int:
    params = getattr(trainer, "params", None)
    if params is None:
        return 0
    mask = getattr(trainer, "mask", None)
    leaves = jax.tree_util.tree_leaves(params)
    if mask is None:
        return int(sum(x.size for x in leaves))
    mleaves = jax.tree_util.tree_leaves(mask)
    return int(sum(x.size for x, m in zip(leaves, mleaves) if m))


def compiled_memory_bytes(compiled) -> Optional[int]:
    """Device-memory footprint of a compiled executable: arguments +
    temporaries (activations) + outputs.  The fallback when the backend
    exposes no live memory_stats (e.g. tunneled TPU) - and the analytic
    analog of the reference's ``torch.cuda.max_memory_allocated``."""
    try:
        ma = compiled.memory_analysis()
        if ma is None:
            return None
        return int(ma.argument_size_in_bytes + ma.temp_size_in_bytes
                   + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    except Exception:  # pragma: no cover - backend without the analysis
        return None


@dataclass
class RunRecord:
    label: str
    epoch_seconds: float
    trainable_params: int
    peak_memory_bytes: Optional[int]
    # What epoch_seconds actually measured - consumers must not assume the
    # reference's train-loop-only basis (utils.py:113-122) without reading
    # this.
    epoch_seconds_basis: str = "median measured epoch wall (train-only)"


@dataclass
class TPMETracker:
    runs: List[RunRecord] = field(default_factory=list)

    def record_run(self, total_seconds: float, trainer, label: str = "run",
                   result=None, memory_bytes: Optional[int] = None):
        """Capture one method's (t, p, m) triple.

        Epoch time prefers the trainer's measured per-epoch times.  Under
        ``fused_epoch_eval`` (cached default) an epoch and its valid eval
        are one dispatch, so those times INCLUDE eval - the record's
        ``epoch_seconds_basis`` flags that explicitly, because it is NOT
        the reference's train-loop-only basis (utils.py:113-122).  The
        shipped TPME.json is produced by scripts/tpme_single.py, which
        times bare ``run_epoch`` on that reference basis.  The total-wall
        / cfg.epoch quotient is only the fallback when no result is
        available.
        """
        epoch_times = getattr(result, "epoch_times", None)
        basis = "median measured epoch wall (train-only)"
        if epoch_times:
            epoch_s = float(np.median(epoch_times))
            if getattr(result, "epoch_times_include_eval", False):
                basis = ("median epoch+valid-eval wall (fused dispatch; "
                         "NOT the reference train-only basis - time bare "
                         "run_epoch, e.g. scripts/tpme_single.py, for TPME "
                         "comparisons)")
        elif hasattr(trainer, "cfg") and getattr(trainer.cfg, "epoch", 0):
            epoch_s = total_seconds / max(trainer.cfg.epoch, 1)
            basis = "total wall / cfg.epoch (fallback; includes evals)"
        else:
            epoch_s = total_seconds
            basis = "total wall (fallback; includes evals)"
        self.runs.append(RunRecord(
            label=label,
            epoch_seconds=epoch_s,
            trainable_params=trainable_param_count(trainer),
            peak_memory_bytes=memory_bytes or device_peak_memory_bytes(),
            epoch_seconds_basis=basis,
        ))

    def summary(self) -> Dict:
        return {r.label: {
            "epoch_s": round(r.epoch_seconds, 4),
            "epoch_s_basis": r.epoch_seconds_basis,
            "trainable_params": r.trainable_params,
            "peak_mem_mb": round(r.peak_memory_bytes / 2**20, 1)
            if r.peak_memory_bytes else None,
        } for r in self.runs}


def tpme_scores(records: List[RunRecord],
                alpha=ALPHA) -> Dict[str, float]:
    """Min-max-normalize t/p/m across methods and combine (README.md:91-96).

    With a single record (no comparison set) every normalized term is 0.
    """

    def norm(vals):
        vals = np.asarray(vals, dtype=np.float64)
        avail = ~np.isnan(vals)
        if not avail.any():
            return np.zeros_like(vals)
        lo, hi = vals[avail].min(), vals[avail].max()
        out = np.zeros_like(vals)
        if hi > lo:
            out[avail] = (vals[avail] - lo) / (hi - lo)
        # unmeasured entries (e.g. no memory stats on this backend) take
        # the mean of the measured scores: neutral, instead of scoring 0
        # (= best) and inflating every other run's term
        out[~avail] = out[avail].mean()
        return out

    t = norm([r.epoch_seconds for r in records])
    p = norm([r.trainable_params for r in records])
    m = norm([float(r.peak_memory_bytes) if r.peak_memory_bytes is not None
              else np.nan for r in records])
    out = {}
    for i, r in enumerate(records):
        out[r.label] = float(alpha[0] * t[i] + alpha[1] * p[i] + alpha[2] * m[i])
    return out
