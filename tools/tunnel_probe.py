"""Wedge-safe axon-tunnel liveness probe.

A wedged tunnel hangs device->host fetches forever; killing a hung client
with SIGTERM (`timeout ...`) is itself a wedge trigger (CLAUDE.md). This
probe runs the fetch on a daemon thread with a watchdog. A wedged verdict
exits via os._exit (teardown would hang forever); a healthy verdict exits
gracefully so the client closes cleanly — an abrupt client death is itself
the documented wedge trigger. Exit code 0 = healthy (prints fetch
seconds), 2 = wedged.

Run: python tools/tunnel_probe.py [timeout_s]   (default 240)
"""

from __future__ import annotations

import os
import sys
import threading
import time


def main():
    timeout_s = float(sys.argv[1]) if len(sys.argv) > 1 else 240.0
    ok = []

    def probe():
        import jax.numpy as jnp

        t0 = time.perf_counter()
        v = float(jnp.zeros(()) + 1.0)
        ok.append((v, time.perf_counter() - t0))

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if ok:
        print(f"healthy: fetch {ok[0][1]:.1f}s", flush=True)
        sys.stdout.flush()
        # Graceful exit preferred: PJRT teardown completes on a healthy
        # tunnel, and an abrupt client death is itself the documented wedge
        # trigger. But a wedge can arrive *between* the successful fetch and
        # teardown (observed to happen spontaneously), so arm a bounded
        # watchdog that pins exit code 0 if teardown hangs or raises.
        def _force_exit():
            time.sleep(30.0)
            os._exit(0)

        threading.Thread(target=_force_exit, daemon=True).start()
        sys.exit(0)
    print(f"wedged: fetch hung > {timeout_s:.0f}s", flush=True)
    sys.stdout.flush()
    os._exit(2)


if __name__ == "__main__":
    main()
