"""On-chip XLA-vs-flash attention comparison at long sequence lengths —
validates the `attn_impl: auto` dispatch threshold (>=1024 tokens) with a
recorded measurement (VERDICT round 1, weak #5 / next #10).

Each config is one jitted program scanning INNER attention calls; prints
ms/call for both kernels at N in (512, 1024, 2048) tokens, head_dim 80
(the shipped ViT-480/6 head shape) and head_dim 128 (the aligned shape).

Run: python tools/flash_threshold.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

INNER = 40  # large enough that the ~28 ms/dispatch tunnel floor is < 2%
BATCH_TOKENS = 256 * 450  # constant total work ~ the ds3 sampler's

_DISPATCH_FLOOR = [0.0]


def measure_dispatch_floor():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    _DISPATCH_FLOOR[0] = min(ts)
    return _DISPATCH_FLOOR[0]


def bench(impl, b, h, n, d):
    from vit4hep_tpu.ops.attention import dot_product_attention

    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, h, n, d),
                                 jnp.float32) for i in range(3))

    def prog(q, k, v):
        def body(c, _):
            return dot_product_attention(c, k, v, impl=impl), None
        out, _ = jax.lax.scan(body, q, None, length=INNER)
        return out

    f = jax.jit(prog)
    float(jnp.sum(f(q, k, v)))  # compile + sync
    t0 = time.perf_counter()
    float(jnp.sum(f(q, k, v)))
    return max(0.0, time.perf_counter() - t0 - _DISPATCH_FLOOR[0]) / INNER


def main():
    float(jnp.zeros(()))  # tunnel warm-up fetch
    floor = measure_dispatch_floor()
    print(f"device: {jax.devices()[0].platform} (INNER={INNER}, "
          f"dispatch floor {floor * 1e3:.1f} ms subtracted)")
    heads = 6
    for d in (80, 128):
        for n in (512, 1024, 2048):
            b = max(1, BATCH_TOKENS // (n * heads) // 8 * 8)
            row = f"N={n:5d} d={d:3d} b={b:3d}:"
            for impl in ("xla", "flash"):
                try:
                    t = bench(impl, b, heads, n, d)
                    row += f"  {impl} {t * 1e3:7.2f} ms"
                except Exception as e:
                    row += f"  {impl} FAILED({type(e).__name__})"
            print(row)


if __name__ == "__main__":
    main()
