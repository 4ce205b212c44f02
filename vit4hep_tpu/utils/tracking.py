"""Experiment tracking with an mlflow-compatible API.

The reference logs metrics/params to a sqlite-backed mlflow store with a
retry-with-backoff wrapper (``experiments/mlflow.py:19-64``). mlflow is not
available here, so the primary backend is an append-only JSONL store per
experiment (crash-safe, multi-process tolerant via O_APPEND). If mlflow *is*
importable, it is used in addition, preserving the retry semantics.

API surface kept from the reference:
    log_mlflow(key, value, step=..., kind="metric"|"param")
"""

from __future__ import annotations

import json
import logging
import os
import random
import time
from pathlib import Path

from vit4hep_tpu.utils.logger import LOGGER

try:  # optional real mlflow backend
    import mlflow as _mlflow
except ImportError:
    _mlflow = None

_STATE = {"dir": None, "run_name": None, "active": False, "started": None}


def init_tracking(tracking_dir: str, exp_name: str, run_name: str):
    """Open a tracking run. tracking_dir maps to the reference's mlflow.db parent."""
    Path(tracking_dir).mkdir(parents=True, exist_ok=True)
    _STATE.update(
        dir=tracking_dir, run_name=run_name, active=True, started=time.time()
    )
    _append(
        {"type": "run_start", "exp_name": exp_name, "run_name": run_name, "time": time.time()}
    )
    if _mlflow is not None:
        try:
            _mlflow.set_tracking_uri(f"sqlite:///{Path(tracking_dir) / 'mlflow.db'}")
            _mlflow.set_experiment(exp_name)
            _mlflow.start_run(run_name=run_name)
        except Exception as e:  # noqa: BLE001 - tracking must never kill a run
            LOGGER.warning(f"mlflow backend unavailable ({e}); using JSONL store only")


def end_tracking():
    if _STATE["active"]:
        _append({"type": "run_end", "time": time.time()})
    _STATE["active"] = False
    if _mlflow is not None:
        try:
            _mlflow.end_run()
        except Exception:  # noqa: BLE001
            pass


def _append(record: dict):
    if _STATE["dir"] is None:
        return
    path = Path(_STATE["dir"]) / f"metrics_{_STATE['run_name']}.jsonl"
    line = json.dumps(record) + "\n"
    # O_APPEND write is atomic for small records; safe across processes
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    try:
        os.write(fd, line.encode())
    finally:
        os.close(fd)


def log_mlflow(key, values=None, step=0, kind="metric"):
    """Log a metric or param; retries with exponential backoff + jitter against a
    locked mlflow DB exactly like the reference (experiments/mlflow.py:19-64)."""
    if not _STATE["active"]:
        return
    _append({"type": kind, "key": str(key), "value": _jsonable(values), "step": int(step)})
    if _mlflow is None:
        return
    sleep_time = 0.1
    for _ in range(20):
        try:
            if kind == "metric":
                _mlflow.log_metric(key, values, step=step)
            elif kind == "param":
                _mlflow.log_param(key, values)
            elif kind == "figure":
                _mlflow.log_figure(values, key)
            else:
                raise ValueError(f"kind={kind} not implemented")
            break
        except Exception:  # noqa: BLE001  (db locked / server hiccup)
            logging.disable(logging.WARNING)
            time.sleep(sleep_time)
            logging.disable(logging.NOTSET)
            sleep_time *= 1 + random.random()
    else:
        LOGGER.warning(f"Could not log {kind} {key} to mlflow after 20 attempts")


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        try:
            return float(v)
        except (TypeError, ValueError):
            return str(v)
