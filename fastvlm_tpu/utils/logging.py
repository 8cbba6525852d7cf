"""Logging + profiling utilities.

``build_logger`` mirrors the reference's (llava/utils.py:17-91): a named
logger whose stream also tees stdout/stderr into timed rotating files, used
by every serving process. ``profile_trace`` wraps jax.profiler for on-demand
TPU traces — the aux subsystem the reference lacks entirely (SURVEY.md §5:
"tracing/profiling: none in the Python stack")."""

from __future__ import annotations

import contextlib
import logging
import logging.handlers
import os
import sys
from typing import Iterator, Optional

_handler: Optional[logging.Handler] = None

LOGDIR = os.environ.get("FASTVLM_LOGDIR", ".")


class StreamToLogger:
    """File-like that redirects writes into a logger (reference utils.py:49-78)."""

    def __init__(self, logger: logging.Logger, level=logging.INFO):
        self.logger = logger
        self.level = level
        self.linebuf = ""

    def __getattr__(self, attr):
        return getattr(sys.__stdout__, attr)

    def write(self, buf):
        buf = self.linebuf + buf
        self.linebuf = ""
        for line in buf.splitlines(True):
            if line.endswith("\n"):
                self.logger.log(self.level, line.rstrip())
            else:
                self.linebuf += line

    def flush(self):
        if self.linebuf:
            self.logger.log(self.level, self.linebuf.rstrip())
        self.linebuf = ""


def build_logger(logger_name: str, logger_filename: str,
                 redirect_std: bool = False) -> logging.Logger:
    """Named logger with a daily-rotating file shared across the process."""
    global _handler

    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    if not logging.getLogger().handlers:
        logging.basicConfig(level=logging.INFO)
    logging.getLogger().handlers[0].setFormatter(formatter)

    if _handler is None:
        os.makedirs(LOGDIR, exist_ok=True)
        path = os.path.join(LOGDIR, logger_filename)
        _handler = logging.handlers.TimedRotatingFileHandler(
            path, when="D", utc=True, encoding="utf-8")
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    logger.addHandler(_handler)

    if redirect_std:
        sys.stdout = StreamToLogger(logging.getLogger("stdout"), logging.INFO)
        sys.stderr = StreamToLogger(logging.getLogger("stderr"), logging.ERROR)
    return logger


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/fastvlm_trace") -> Iterator[str]:
    """Capture a jax.profiler trace of the enclosed block (view in
    TensorBoard / xprof). Usage:
        with profile_trace("/tmp/t"):
            engine.generate(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
