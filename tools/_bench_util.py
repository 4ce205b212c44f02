"""Shared timing helpers for the one-shot TPU measurement tools (tools/*).

bench.py's sampler-timing pattern (one jitted program per batch, every
timed iteration ends in a device->host scalar fetch so the ~28 ms dispatch
overhead and the tunnel's fetch path are inside the measured window) was
copy-pasted into each A/B tool as it was written; a timing fix applied to
one copy would silently skew cross-tool comparisons (round-3 review
finding). The single copy lives here.

Usage (after inserting the repo root on sys.path):

    from tools._bench_util import reassert_platform, sampler_rate
    reassert_platform()   # BEFORE the first jax use: honor JAX_PLATFORMS
"""

from __future__ import annotations

import os
import time

import numpy as np


def reassert_platform():
    """Honor JAX_PLATFORMS from the environment (wedge safety: the axon
    plugin overrides JAX_PLATFORMS=cpu, so a tool meant to smoke on CPU
    would silently attach to — and possibly hang on — the tunnel)."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def sampler_rate(model, cond_dim=None, batch=256, n_iters=6, params=None,
                 seed_base=1000):
    """bench.py's exact sampler timing -> samples/sec.

    One jitted program per batch; compile + the tunnel's first-fetch
    backlog are absorbed by a warm-up call; every timed iteration ends in
    a device->host scalar fetch. ``params`` defaults to a fresh init;
    ``cond_dim`` defaults to ``model.condition_dim``. ``seed_base`` keeps
    each tool's historical fold_in offsets so new runs stay comparable to
    its banked logs.
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    if params is None:
        params = model.init_params(key)
    if cond_dim is None:
        cond_dim = model.condition_dim
    cond = jax.device_put(
        np.random.default_rng(0).normal(size=(batch, cond_dim))
        .astype(np.float32))
    fn = jax.jit(lambda p, c, k: jnp.sum(model.sample_batch(p, c, k)))
    float(fn(params, cond, key))  # compile + warm-up fetch
    t0 = time.perf_counter()
    for i in range(n_iters):
        s = float(fn(params, cond, jax.random.fold_in(key, seed_base + i)))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return batch * n_iters / dt
