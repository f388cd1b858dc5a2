"""Rank-gated dual (file + screen) logging.

Rebuild of setuplogger (/root/reference/Code_Cached/data_utils/utils.py:21-55):
INFO handlers on process 0, WARN elsewhere; one file handler + one stream
handler with the same format string.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Tuple

FORMAT = "[%(levelname)s %(asctime)s] %(message)s"


def setup_logger(log_dir: str, label: str, mode: str = "train",
                 process_index: int = None) -> logging.Logger:
    """Rank-gated dual logger (setuplogger, utils.py:21-55): INFO +
    file handler on process 0, WARN-only elsewhere.  process_index
    defaults to the ACTUAL jax process index so multi-host callers get
    the gate without having to remember to pass it."""
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0
    logger = logging.getLogger("iisan_tpu")
    logger.handlers.clear()
    logger.propagate = False
    if process_index == 0:
        logger.setLevel(logging.INFO)
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("-%Y%m%d-%H%M%S", time.localtime())
        fh = logging.FileHandler(
            os.path.join(log_dir, f"log_{mode}_{label}{stamp}.log"),
            encoding="utf-8",
        )
        fh.setFormatter(logging.Formatter(FORMAT))
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter(FORMAT))
        logger.addHandler(sh)
    else:
        logger.setLevel(logging.WARN)
    return logger


def get_time(start: float, end: float) -> Tuple[int, int, int]:
    """(utils.py:81-86)"""
    t = int(end - start)
    return t // 3600, (t // 60) % 60, t % 60
