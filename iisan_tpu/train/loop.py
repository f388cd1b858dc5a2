"""Shared training loop: epochs, validation, early stop, test-on-best.

One implementation of the reference's epoch orchestration
(/root/reference/Code_Cached/run.py:360-421 + run_eval:437-462) reused by
every trainer (cached / uncached / id): per-epoch validation with
early-stop patience (``early_stop_count > 10``, run.py:458), test-set eval
on a new best or every 10th epoch (run.py:402-405), checkpoint on rank 0.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax

from ..utils import checkpoint as ckpt_lib

log = logging.getLogger("iisan_tpu")


@dataclass
class TrainResult:
    best_hit10: float
    best_ndcg10: float
    best_epoch: int
    epochs_run: int
    epoch_times: list = field(default_factory=list)
    losses: list = field(default_factory=list)
    # Per-epoch (valid_hit10, valid_ndcg10) trace — lets analysis scripts
    # see the trajectory early stopping acted on (VERDICT r4 next #5).
    valid_history: list = field(default_factory=list)
    test_metrics: Optional[Tuple[float, float]] = None
    # Test metrics captured AT the best-valid epoch - the number the papers
    # report.  test_metrics above mirrors the reference's literal behavior
    # (last test eval run, which the every-10th-epoch rule can overwrite
    # after the best epoch, run.py:402-405).
    best_test_metrics: Optional[Tuple[float, float]] = None
    # True when epoch_times were measured around a fused train+valid-eval
    # dispatch - i.e. they are NOT the reference's train-loop-only basis.
    epoch_times_include_eval: bool = False


class TrainLoopMixin:
    """Requires: self.cfg, self.run_epoch(epoch)->loss,
    self.evaluate_split(split)->(hit,ndcg), self.params/opt_state/rng."""

    def _log_step_losses(self, epoch: int):
        """Intra-epoch batch-loss lines at logging_num intervals - the
        'cnt/Ed/batch loss/sum loss' format of run.py:390-392, reconstructed
        from the scan's per-step losses."""
        import numpy as np

        losses = getattr(self, "_last_step_losses", None)
        if losses is None:
            return
        losses = np.asarray(losses)
        n = len(losses)
        interval = max(n // max(self.cfg.logging_num, 1), 1)
        csum = np.cumsum(losses)
        for i in range(interval - 1, n, interval):
            log.info("cnt: %d, Ed: %d, batch loss: %.5f, sum loss: %.5f",
                     i + 1, (i + 1) * self.cfg.batch_size,
                     csum[i] / (i + 1), csum[i])

    def train(self, save_checkpoints: bool = False,
              start_epoch: int = 0) -> TrainResult:
        cfg = self.cfg
        res = TrainResult(0.0, 0.0, 0, 0)
        max_hit10, early_stop_count = 0.0, 0
        start = time.time()
        # Cached trainers fuse epoch + valid eval into one device dispatch
        # (CachedTrainer.run_epoch_with_eval); others run them separately.
        fused_ee = getattr(self, "run_epoch_with_eval", None)
        for ep in range(cfg.epoch):
            now_epoch = start_epoch + ep + 1
            t0 = time.time()
            fused_out = fused_ee(now_epoch) if fused_ee is not None else None
            if fused_out is not None:
                loss, hit, ndcg = fused_out
                jax.block_until_ready(self.params)
                epoch_time = time.time() - t0
                res.epoch_times_include_eval = True
            else:
                loss = self.run_epoch(now_epoch)
                jax.block_until_ready(self.params)
                epoch_time = time.time() - t0
            res.epoch_times.append(epoch_time)
            res.losses.append(loss)
            import math
            if math.isnan(loss):  # NaN-loss abort (run.py:387-389)
                log.warning("NaN loss at epoch %d - stopping", now_epoch)
                break
            self._log_step_losses(now_epoch)
            eval_t0 = time.time()
            if fused_out is None:
                hit, ndcg = self.evaluate_split("valid")
            from ..utils.profiling import report_time_eval
            report_time_eval(eval_t0)  # utils.py:125-129 parity line
            # Under the fused dispatch the logged time necessarily covers
            # epoch+eval (they are one device call); label it so the line
            # is not mistaken for the reference's train-only timing.
            log.info(
                "epoch %d loss %.5f valid Hit10 %.5f nDCG10 %.5f (%.2fs%s)",
                now_epoch, loss, hit * 100, ndcg * 100, epoch_time,
                " epoch+eval" if fused_out is not None else "")
            res.epochs_run = now_epoch
            res.valid_history.append((float(hit), float(ndcg)))
            new_best = hit > res.best_hit10
            if new_best:
                res.best_hit10, res.best_ndcg10 = hit, ndcg
                res.best_epoch = now_epoch
                early_stop_count = 0
            else:
                early_stop_count += 1
                if early_stop_count > cfg.early_stop_patience:
                    log.info("early stop at epoch %d", now_epoch)
                    break
            # Test on new best / every 10th epoch (run.py:402-405).
            if hit > max_hit10 or max_hit10 == 0 or ep % 10 == 0:
                max_hit10 = max(max_hit10, hit)
                res.test_metrics = self.evaluate_split("test")
                if new_best:
                    res.best_test_metrics = res.test_metrics
                log.info("test Hit10 %.5f nDCG10 %.5f",
                         res.test_metrics[0] * 100, res.test_metrics[1] * 100)
                if save_checkpoints:
                    # every process participates: orbax coordinates
                    # multi-host saves itself, and globally-sharded
                    # arrays cannot be written by process 0 alone
                    ckpt_lib.save_checkpoint(
                        cfg.ckpt_dir, now_epoch,
                        {"params": self.params, "opt_state": self.opt_state,
                         "rng": self.rng, "epoch": now_epoch})
        log.info("max eval Hit10 %.5f in epoch %d (total %.1fs)",
                 res.best_hit10 * 100, res.best_epoch, time.time() - start)
        return res

    def resume(self, ckpt_name: str) -> int:
        """Restore params/opt_state/rng from a checkpoint; returns the epoch
        to continue from (run.py:234-244 analog)."""
        state, epoch = ckpt_lib.restore_checkpoint(
            self.cfg.ckpt_dir, ckpt_name,
            {"params": self.params, "opt_state": self.opt_state,
             "rng": self.rng, "epoch": 0})
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.rng = state["rng"]
        # Re-place on the trainer's mesh sharding (restored arrays land on
        # the default device).  put_global handles multi-process meshes,
        # where plain device_put cannot address remote devices.
        repl = getattr(self, "_repl", None)
        if repl is not None:
            from ..parallel.distributed import put_global

            self.params = jax.tree_util.tree_map(
                lambda x: put_global(x, repl), self.params)
            self.opt_state = jax.tree_util.tree_map(
                lambda x: put_global(x, repl), self.opt_state)
            self.rng = put_global(self.rng, repl)
        return epoch
