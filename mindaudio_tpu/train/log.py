"""Structured logging (reference utils/log.py:170 ``get_logger``).

Per-process rotating file + rank-filtered stdout, keyed by
``jax.process_index()`` instead of the reference's DEVICE_ID env var.
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

__all__ = ["get_logger", "print_log"]

_LOGGERS = {}


def get_logger(name="mindaudio_tpu", log_dir=None, rank=None, stdout_ranks=(0,)):
    """Build (once) a logger with rotating file output and rank-0 stdout."""
    if name in _LOGGERS:
        return _LOGGERS[name]

    if rank is None:
        try:
            import jax

            rank = jax.process_index()
        except Exception:
            rank = 0

    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    fmt = logging.Formatter(
        f"%(asctime)s [rank {rank}] %(levelname)s %(name)s: %(message)s"
    )

    if log_dir is None:
        log_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "mindaudio_tpu", f"device_{rank}"
        )
    os.makedirs(log_dir, exist_ok=True)
    fh = RotatingFileHandler(
        os.path.join(log_dir, f"{name}.log"), maxBytes=50 * 2**20, backupCount=5
    )
    fh.setFormatter(fmt)
    logger.addHandler(fh)

    if rank in stdout_ranks:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)

    _LOGGERS[name] = logger
    return logger


def print_log(msg, logger=None, level=logging.INFO):
    (logger or get_logger()).log(level, msg)
