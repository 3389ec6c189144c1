"""Leveled, colored, timestamped logging.

Equivalent of the reference driver's ``log()`` / ``print_time`` bash
functions (reference: palace:81-108) plus ``show_progress``
(palace:163-170), as a thin wrapper over :mod:`logging` so the whole
framework shares one sink and a ``tee``-style logfile can be attached
(palace:320-325).
"""
from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

_COLORS = {
    "DEBUG": "\033[0;36m",
    "INFO": "\033[0;34m",
    "SUCCESS": "\033[0;32m",
    "WARNING": "\033[1;33m",
    "ERROR": "\033[0;31m",
}
_NC = "\033[0m"
SUCCESS = 25  # between INFO and WARNING
logging.addLevelName(SUCCESS, "SUCCESS")


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(record.created))
        level = record.levelname
        color = _COLORS.get(level, "")
        use_color = getattr(record, "_no_color", False) is False and sys.stderr.isatty()
        if use_color:
            prefix = f"{color}[{ts}] [{level}]{_NC}"
        else:
            prefix = f"[{ts}] [{level}]"
        return f"{prefix} {record.getMessage()}"


def get_logger(name: str = "palace") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_ColorFormatter())
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def attach_logfile(path: str | Path, name: str = "palace") -> None:
    """Also write all log lines to ``path`` (palace:320-325 tee semantics)."""
    logger = get_logger(name)
    handler = logging.FileHandler(path)
    handler.setFormatter(_ColorFormatter())
    logger.addHandler(handler)


def log(level: str, *message: object, name: str = "palace") -> None:
    """Bash-style ``log LEVEL msg...`` shim (palace:86-108)."""
    logger = get_logger(name)
    text = " ".join(str(m) for m in message)
    lvl = SUCCESS if level.upper() == "SUCCESS" else getattr(logging, level.upper(), logging.INFO)
    logger.log(lvl, text)


def show_progress(current: int, total: int, step_name: str, name: str = "palace") -> None:
    """Progress line (palace:163-170)."""
    percent = current * 100 // total
    log("INFO", f"Progress: Step {current}/{total} ({percent}%) - {step_name}", name=name)
