"""Buffered, process-0-filtered logger.

Mirrors the observability contract of the reference (``experiments/logger.py:7-24``
and ``base_experiment.py:277-320``): log records emitted before the run directory
exists are buffered in memory and flushed once the logger is initialized; only
process 0 emits records; each run gets its own ``out_<run_idx>.log`` file.
"""

from __future__ import annotations

import logging
import logging.handlers
from pathlib import Path

FORMATTER = logging.Formatter(
    "[%(asctime)s %(levelname)7s %(filename)s:%(lineno)s] %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
)

LOGGER = logging.getLogger("vit4hep-tpu")
LOGGER.setLevel(logging.DEBUG)

MEMORY_HANDLER = logging.handlers.MemoryHandler(capacity=100)
LOGGER.addHandler(MEMORY_HANDLER)

LOGGING_INITIALIZED = False


class RankFilter(logging.Filter):
    """Drop records on non-zero processes (reference experiments/logger.py:16-24)."""

    def __init__(self, rank):
        super().__init__()
        self.rank = rank

    def filter(self, record):
        return self.rank == 0


def init_logging(run_dir: str | None, run_idx: int = 0, rank: int = 0, debug: bool = False):
    """Attach stream + file handlers and flush any buffered pre-init records."""
    global LOGGING_INITIALIZED
    if LOGGING_INITIALIZED:
        LOGGER.info("Logger already initialized")
        return

    # silence foreign loggers (jax, absl, matplotlib, h5py, ...)
    for name, other in logging.root.manager.loggerDict.items():
        if "vit4hep" not in name and isinstance(other, logging.Logger):
            other.setLevel(logging.WARNING)

    LOGGER.setLevel(logging.DEBUG if debug else logging.INFO)

    if run_dir is not None:
        file_handler = logging.FileHandler(Path(run_dir) / f"out_{run_idx}.log")
        file_handler.setFormatter(FORMATTER)
        file_handler.setLevel(logging.DEBUG)
        LOGGER.addHandler(file_handler)

    LOGGER.addFilter(RankFilter(rank))

    stream_handler = logging.StreamHandler()
    stream_handler.setLevel(LOGGER.level)
    stream_handler.setFormatter(FORMATTER)
    LOGGER.addHandler(stream_handler)

    MEMORY_HANDLER.setTarget(stream_handler)
    MEMORY_HANDLER.close()
    LOGGER.removeHandler(MEMORY_HANDLER)

    LOGGER.propagate = False
    LOGGING_INITIALIZED = True
    LOGGER.debug("Logger initialized")


def flush_buffered_logs():
    """Dump buffered records to stderr after a crash that happened before init
    (reference base_experiment.py:51-56)."""
    if not LOGGING_INITIALIZED:
        stream_handler = logging.StreamHandler()
        stream_handler.setLevel(logging.DEBUG)
        MEMORY_HANDLER.setTarget(stream_handler)
        MEMORY_HANDLER.close()
