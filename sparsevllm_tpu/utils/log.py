"""Lightweight logging facade.

Mirrors the role of the reference's ``utils/log.py`` (loguru logger + log_once)
without the loguru dependency: stdlib logging with a per-call-site dedup cache.
Reference behavior: src/sparsevllm/utils/log.py.
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER_NAME = "sparsevllm_tpu"
_configured = False
_once_keys: set[str] = set()


def _configure() -> logging.Logger:
    global _configured
    log = logging.getLogger(_LOGGER_NAME)
    if not _configured:
        level = os.environ.get("SPARSEVLLM_TPU_LOG_LEVEL", "INFO").upper()
        log.setLevel(level)
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s.%(msecs)03d | %(levelname)s | %(name)s | %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        log.addHandler(handler)
        log.propagate = False
        _configured = True
    return log


logger = _configure()


def log_once(level: str, msg: str, *args) -> None:
    """Log a message at most once per unique (level, msg) pair."""
    key = f"{level}:{msg}"
    if key in _once_keys:
        return
    _once_keys.add(key)
    getattr(logger, level.lower())(msg, *args)
