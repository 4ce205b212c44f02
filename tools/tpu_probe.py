"""Bounded axon-tunnel liveness probe (exits cleanly, never SIGKILLed).

A wedged tunnel hangs device->host fetches forever (CLAUDE.md); killing a
hung client is itself what wedges the tunnel, so this probe runs the fetch
on a daemon thread and, on timeout, flushes a verdict and `os._exit`s —
the same discipline as bench.py's _probe_device. Exit 0 = healthy (prints
fetch latency), 2 = wedged.

Run: python tools/tpu_probe.py [timeout_s]
"""

import os
import sys
import threading
import time


def main(timeout_s=420.0):
    ok = []

    def probe():
        import jax
        import jax.numpy as jnp

        t0 = time.perf_counter()
        v = float(jnp.zeros(()) + 1.0)
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.ones((8, 8)).sum())
        dt2 = time.perf_counter() - t0
        ok.append((v, dt1, dt2, str(jax.devices())))

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if not ok:
        print(f"WEDGED: fetch hung > {timeout_s:.0f}s")
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(2)
    v, dt1, dt2, devs = ok[0]
    print(f"HEALTHY: fetch1 {dt1:.1f}s (backlog), fetch2 {dt2 * 1e3:.1f}ms, {devs}")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 420.0)
