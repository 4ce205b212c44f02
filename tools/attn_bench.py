"""On-chip comparison of the three attention impls at the SHIPPED shapes.

Times xla / flash / vmem (ops/attention.py) at the ds1/ds2/ds3 sampler
shapes (B=256, 6 heads, head_dim 80) plus long-sequence points, each as one
jitted program scanning INNER calls (dispatch floor subtracted).

Run: python tools/attn_bench.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

if __import__("os").environ.get("JAX_PLATFORMS"):
    # axon plugin overrides JAX_PLATFORMS from the env; re-assert it
    import jax

    jax.config.update("jax_platforms",
                      __import__("os").environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

INNER = 40

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


def bench_module(impl, b, h, n, hidden):
    """The full flax Attention module (qkv Dense + transposes + attention +
    out Dense) — the real in-model context, where pallas-call boundaries can
    force layout copies that XLA's fused path folds away."""
    from vit4hep_tpu.models.vit import Attention

    net = Attention(hidden=hidden, num_heads=h, attn_impl=impl)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, hidden), jnp.float32)
    params = net.init(key, x)

    def prog(params, x):
        def body(c, _):
            return net.apply(params, c), None
        out, _ = jax.lax.scan(body, x, None, length=INNER)
        return out

    f = jax.jit(prog)
    float(jnp.sum(f(params, x)))  # compile + sync
    t0 = time.perf_counter()
    float(jnp.sum(f(params, x)))
    return max(0.0, time.perf_counter() - t0 - _DISPATCH_FLOOR[0]) / INNER


def main():
    float(jnp.zeros(()))  # tunnel warm-up fetch
    floor = measure_dispatch_floor()
    print(f"device: {jax.devices()[0].platform} (INNER={INNER}, "
          f"dispatch floor {floor * 1e3:.1f} ms subtracted)")
    shapes = [
        ("ds1-like", 256, 6, 88, 80),
        ("ds2", 256, 6, 135, 80),
        ("ds3", 256, 6, 450, 80),
        ("long-1k", 16, 6, 1024, 80),
        ("long-2k", 8, 6, 2048, 80),
    ]
    for name, b, h, n, d in shapes:
        row = f"{name:9s} B={b:3d} N={n:5d}:"
        for impl in ("xla", "flash", "vmem"):
            try:
                t = bench(impl, b, h, n, d)
                row += f"  {impl} {t * 1e3:7.2f} ms"
            except Exception as e:
                row += f"  {impl} FAILED({type(e).__name__})"
        print(row)
    print("full Attention module (qkv/out Dense + layout boundaries included):")
    for name, b, h, n, d in shapes:
        row = f"{name:9s} B={b:3d} N={n:5d}:"
        for impl in ("xla", "vmem", "fused"):
            try:
                t = bench_module(impl, b, h, n, h * d)
                row += f"  {impl} {t * 1e3:7.2f} ms"
            except Exception as e:
                row += f"  {impl} FAILED({type(e).__name__})"
        print(row)


if __name__ == "__main__":
    main()
