"""Profiling/timing/TPME utility tests."""

import logging
import time

from iisan_tpu.utils.profiling import (StepTimer, annotate, log_memory,
                                       report_time_eval, report_time_train)


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(5):
        with t:
            time.sleep(0.001)
    s = t.summary()
    assert s["n"] == 5
    assert s["p50_ms"] >= 1.0
    assert s["max_ms"] >= s["p50_ms"]


def test_report_time_lines(caplog):
    # setup_logger (used by other tests) sets propagate=False on this
    # logger; re-enable so caplog can observe regardless of test order.
    lg = logging.getLogger("iisan_tpu")
    old_prop, old_level = lg.propagate, lg.level
    lg.propagate, lg.level = True, logging.INFO
    try:
        with caplog.at_level(logging.INFO, logger="iisan_tpu"):
            t0 = time.time()
            report_time_train(10, 1, 2.5, t0, t0)
            report_time_eval(t0)
    finally:
        lg.propagate, lg.level = old_prop, old_level
    msgs = " ".join(r.message for r in caplog.records)
    assert "train_loss" in msgs and "eval(valid and test)" in msgs


def test_annotate_and_memory():
    with annotate("test-region"):
        pass
    log_memory("test")  # must not raise regardless of backend support
