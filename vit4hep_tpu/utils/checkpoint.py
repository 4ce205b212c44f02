"""Orbax-backed checkpointing with the reference's run-dir layout.

The reference torch.saves {model, optimizer, scheduler, ema} to
``runs/<exp>/<run>/models/model_run{idx}.pt`` (base_experiment.py:661-677).
Here each checkpoint is an orbax directory ``models/model_run{idx}`` holding the
full train-state pytree (params, opt_state, ema_params, step, lr_scale), which
restores correctly under any mesh sharding.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from vit4hep_tpu.utils.logger import LOGGER


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, tree):
    path = Path(path).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.fspath(path), _to_host(tree), force=True)
    LOGGER.debug(f"Saved checkpoint at {path}")


def load_checkpoint(path, target=None):
    """Restore a pytree; ``target`` (a matching pytree of arrays) fixes leaf
    types/shapes when provided."""
    path = Path(path).resolve()
    if not path.exists():
        raise FileNotFoundError(f"Cannot load checkpoint from {path}")
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        # None nodes (e.g. TrainState.ema_params with EMA disabled) break
        # orbax's restore metadata; mark them PLACEHOLDER so they are skipped
        # and come back as-is
        template = jax.tree.map(
            lambda x: ocp.PLACEHOLDER if x is None else np.asarray(x),
            target,
            is_leaf=lambda x: x is None,
        )
        def _unplaceholder(tree):
            return jax.tree.map(
                lambda x: None if x is ocp.PLACEHOLDER else x,
                tree,
                is_leaf=lambda x: x is ocp.PLACEHOLDER,
            )

        # a partial template (e.g. only {"params": ...} out of a full train
        # state) is allowed: restore just the requested subtree
        try:
            return _unplaceholder(ckptr.restore(
                os.fspath(path),
                args=ocp.args.PyTreeRestore(item=template, partial_restore=True),
            ))
        except TypeError:  # older orbax: no partial_restore / no args=
            pass
        try:
            return _unplaceholder(ckptr.restore(
                os.fspath(path), args=ocp.args.PyTreeRestore(item=template)
            ))
        except (TypeError, ValueError):
            pass
        try:
            return _unplaceholder(ckptr.restore(os.fspath(path), item=template))
        except TypeError:
            # last resort: restore everything and pick the template's subtree
            full = ckptr.restore(os.fspath(path))
            return {k: full[k] for k in template} if isinstance(template, dict) else full
    return ckptr.restore(os.fspath(path))
