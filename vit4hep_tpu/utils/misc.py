"""Small utilities (dtype resolution, dict flattening) — reference experiments/misc.py."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_dtype(name: str | None):
    """Resolve a config dtype string to a jnp dtype (reference misc.py:16-23)."""
    if name in (None, "float32", "float"):
        return jnp.float32
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float64", "double"):
        return jnp.float64
    if name in ("float16", "half"):
        return jnp.float16
    raise ValueError(f"dtype {name} not supported")


def flatten_dict(d, parent_key: str = "", sep: str = "."):
    """Flatten a nested mapping into dotted keys (reference misc.py:26-35)."""
    items = {}
    try:
        entries = d.items()
    except AttributeError:
        return {parent_key: d}
    for k, v in entries:
        new_key = f"{parent_key}{sep}{k}" if parent_key else str(k)
        if hasattr(v, "items"):
            items.update(flatten_dict(v, new_key, sep=sep))
        else:
            items[new_key] = v
    return items


def count_parameters(params) -> int:
    """Total number of learnable parameters in a pytree."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
