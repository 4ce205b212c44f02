"""On-chip op-level profile of a jitted program via JAX's xplane trace.

Captures a `jax.profiler.trace` around a few executions of a sampler (or
any callable), then parses the raw `.xplane.pb` with tensorflow's bundled
TSL proto (the tensorboard_plugin_profile converter is broken against this
TF build — round-1 finding) and prints the top-k device ops by total
self-time. This is how the round-1 layout-copy/softmax-traffic breakdown
was produced; committed as a tool so future rounds don't rebuild it.

Usage:
    python tools/profile_xplane.py [yaml_rel] [batch]
    # defaults: model/cfm/cfm_ds2_electrons.yaml, batch 256

Requires the TPU (profiles the real device); set
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the C++ proto refuses
the schema (handled automatically below).
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def capture(trace_dir, yaml_rel="model/cfm/cfm_ds2_electrons.yaml", batch=256,
            cond_dim=46, n_iters=2):
    import jax
    import jax.numpy as jnp

    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    model = instantiate(_load_yaml(os.path.join(_REPO, "configs", yaml_rel)))
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    cond = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, cond_dim)).astype(np.float32))
    fn = jax.jit(lambda p, c, k: jnp.sum(model.sample_batch(p, c, k)))
    float(fn(params, cond, key))  # compile + tunnel warm-up
    with jax.profiler.trace(trace_dir):
        for i in range(n_iters):
            float(fn(params, cond, jax.random.fold_in(key, i)))


def summarize(trace_dir, top_k=25):
    """Aggregate device-plane event durations by op name from .xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    spaces = []
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        spaces.append(space)

    def collect(device_only):
        totals = defaultdict(float)
        total = 0.0
        for space in spaces:
            for plane in space.planes:
                lowered = plane.name.lower()
                is_device = "tpu" in lowered or "gpu" in lowered or "/device" in lowered
                if device_only and not is_device:
                    continue
                ev_names = plane.event_metadata
                # a device plane carries nested lines (XLA Modules contain
                # XLA Ops contain fusions); summing every line multi-counts
                # the same device time. Take only the op-level line — the
                # "XLA Ops" line when named, else the line with the most
                # events (the deepest level).
                lines = [ln for ln in plane.lines if "op" in ln.name.lower()]
                if not lines and plane.lines:
                    lines = [max(plane.lines, key=lambda ln: len(ln.events))]
                for line in lines:
                    for ev in line.events:
                        meta = ev_names.get(ev.metadata_id)
                        name = meta.name if meta is not None else f"op_{ev.metadata_id}"
                        dur = ev.duration_ps / 1e12
                        totals[name] += dur
                        total += dur
        return totals, total

    totals, device_total = collect(device_only=True)
    if not totals:  # CPU traces: no device plane — fall back to host planes
        totals, device_total = collect(device_only=False)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_k]
    print(f"device self-time total: {device_total * 1e3:.2f} ms "
          f"(over all traced executions)")
    for name, dur in rows:
        print(f"{dur * 1e3:9.3f} ms  {100 * dur / device_total:5.1f}%  {name[:110]}")


def main():
    import tempfile

    yaml_rel = sys.argv[1] if len(sys.argv) > 1 else "model/cfm/cfm_ds2_electrons.yaml"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cond_dim = int(sys.argv[3]) if len(sys.argv) > 3 else 46
    trace_dir = tempfile.mkdtemp(prefix="xplane_")
    print(f"tracing {yaml_rel} (batch {batch}, cond_dim {cond_dim}) -> {trace_dir}")
    capture(trace_dir, yaml_rel, batch, cond_dim=cond_dim)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
