"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax


def interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests, virtual meshes)."""
    return jax.default_backend() != "tpu"


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
