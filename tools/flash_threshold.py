"""Beyond-VMEM attention crossover: fused one-shot vs panel-flash vs legacy.

VERDICT r3 next #5: the designated long-context tier was the round-1
separated-layout flash kernel, never revisited after the fused-layout
lessons. This tool measures, in MODULE context (qkv Dense output ->
attention -> out Dense, the decision-relevant layout per BASELINE.md round
2), the per-call time of each qkv_attention impl at 1024-8192 tokens:

  fused      one-shot fused-layout kernel (ops/fused_qkv_attention.py),
             where its VMEM working set fits (<= 2048 tokens)
  flash      panel-native online-softmax flash (ops/flash_qkv_attention.py,
             round 4) — the new beyond-VMEM tier
  flash_old  round-1 separated-layout flash (transposes at the boundary)
  xla        einsum attention (materialized (B, H, N, N) scores)

Each impl runs INNER scanned calls inside one jit (dispatch floor
subtracted). Batch is scaled down with N to keep the activation footprint
sane. Output decides the `auto` thresholds in ops/attention.py.

Run: python tools/flash_threshold.py  (axon TPU; --smoke for CPU plumbing)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

import tools.roofline_small_stages as rs

HID, HEADS = 480, 6  # ds2/ds3 panel geometry (head_dim 80)


def module_ctx_time(impl, n, batch, key):
    """Seconds per attention call in module context (Dense -> attn -> Dense)."""
    from vit4hep_tpu.ops.attention import qkv_attention

    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (batch, n, HID), jnp.float32) * 0.1
    wqkv = jax.random.normal(k2, (HID, 3 * HID), jnp.float32) * 0.02
    wout = jax.random.normal(k3, (HID, HID), jnp.float32) * 0.02

    def step(h, _):
        qkv = h @ wqkv
        ctx = qkv_attention(qkv, HEADS, impl=impl)
        return h + 1e-6 * (ctx @ wout), None

    def prog(h):
        h, _ = jax.lax.scan(step, h, None, length=rs.INNER)
        return h

    return rs.timed(prog, x)


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        rs.INNER = 2
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}, dispatch floor "
          f"{rs.measure_dispatch_floor() * 1e3:.1f} ms")
    points = [(1024, 16), (1536, 12), (2048, 8), (3072, 4), (4096, 4),
              (6144, 2), (8192, 2)]
    if smoke:
        points = [(256, 2)]
    key = jax.random.PRNGKey(0)
    print(f"{'N':>6s} {'batch':>5s}" + "".join(
        f" {h:>12s}" for h in ("fused", "flash", "flash_old", "xla")))
    for n, batch in points:
        row = [f"{n:6d} {batch:5d}"]
        for impl, tag in (("fused", "fused"), ("flash", "flash"),
                          ("flash_old", "flash_old"), ("xla", "xla")):
            try:
                if impl == "flash_old":
                    t = _old_flash_time(n, batch, key)
                else:
                    t = module_ctx_time(impl, n, batch, key)
                row.append(f" {t * 1e3:10.3f}ms")
            except Exception as e:
                row.append(f" {type(e).__name__[:11]:>12s}")
        print("".join(row), flush=True)


def _old_flash_time(n, batch, key):
    """Round-1 separated-layout flash in the same module context (the
    transposes at the kernel boundary are part of what is being measured)."""
    from vit4hep_tpu.ops.flash_attention import flash_attention

    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (batch, n, HID), jnp.float32) * 0.1
    wqkv = jax.random.normal(k2, (HID, 3 * HID), jnp.float32) * 0.02
    wout = jax.random.normal(k3, (HID, HID), jnp.float32) * 0.02
    d = HID // HEADS

    def step(h, _):
        qkv = h @ wqkv
        qkv5 = qkv.reshape(batch, n, 3, HEADS, d)
        q, k, v = (jnp.transpose(qkv5[:, :, i], (0, 2, 1, 3))
                   for i in range(3))
        o = flash_attention(q, k, v)
        ctx = jnp.transpose(o, (0, 2, 1, 3)).reshape(batch, n, HID)
        return h + 1e-6 * (ctx @ wout), None

    def prog(h):
        h, _ = jax.lax.scan(step, h, None, length=rs.INNER)
        return h

    return rs.timed(prog, x)


if __name__ == "__main__":
    main()
