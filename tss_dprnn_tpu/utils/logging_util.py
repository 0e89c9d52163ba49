"""Logger setup (replaces the reference's ad-hoc ``logging.getLogger`` use in
scripts/train/train.py:38)."""

from __future__ import annotations

import logging
import sys


def get_logger(name: str = "tss_dprnn_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter("[%(asctime)s] %(name)s %(levelname)s: %(message)s", "%H:%M:%S")
        )
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger
