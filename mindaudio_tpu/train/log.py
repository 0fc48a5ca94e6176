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
    """Build a logger with rotating file output and rank-0 stdout.

    Cached per (name, settings): calling again with the same name but
    different explicit ``log_dir``/``rank``/``stdout_ranks`` reconfigures
    the handlers instead of silently returning the stale logger (a recipe
    must be able to override a default logger created at import time).
    """
    cfg_key = (name, log_dir, rank, tuple(stdout_ranks))
    cached = _LOGGERS.get(name)
    all_defaults = log_dir is None and rank is None and tuple(stdout_ranks) == (0,)
    if cached is not None and (cached[0] == cfg_key or all_defaults):
        # same settings, or a don't-care default call after an explicit
        # configuration — never downgrade an explicitly-configured logger
        return cached[1]

    if rank is None:
        try:
            import jax

            rank = jax.process_index()
        except Exception:
            rank = 0

    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    for h in list(logger.handlers):  # reconfiguring: drop previous handlers
        logger.removeHandler(h)
        h.close()
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

    _LOGGERS[name] = (cfg_key, logger)
    return logger


def print_log(msg, logger=None, level=logging.INFO):
    (logger or get_logger()).log(level, msg)
