"""Multi-head attention dispatch: Pallas kernels or plain XLA.

This replaces the reference's two native attention backends — torch SDPA
(nn/vit.py:431-438) and xformers ``memory_efficient_attention`` (nn/vit.py:
440-449) — with TPU-native equivalents at two API levels:

``qkv_attention`` — the model-facing entry: takes the qkv projection output
in its native (B, N, 3*H*D) layout and returns the merged (B, N, H*D)
context. Its ``auto`` mode routes 128–1024 tokens to the fused-layout
kernel (ops/fused_qkv_attention.py), which measured 1.9x faster than XLA at
ds3 and 1.5x at ds2 in the full Attention-module context — a ``pallas_call``
is a fusion barrier, so kernels that consume separated (B, H, N, D) tensors
pay materialized transposes in-model and LOSE end-to-end even when they win
on isolated inputs (BASELINE.md round 2).

``dot_product_attention`` — the separated-input entry for callers that
already hold q, k, v as (B, H, N, D) (ring attention chunks, parity tests):

- ``impl="vmem"``: one-shot VMEM-resident Pallas kernel
  (vit4hep_tpu/ops/vmem_attention.py) — fastest from ~300 to 1024 tokens
  on ISOLATED inputs (no layout boundary to pay).
- ``impl="flash"``: block-wise online-softmax Pallas kernel
  (vit4hep_tpu/ops/flash_attention.py), mask-capable, with a custom VJP;
  fastest above 1024 tokens.
- ``impl="xla"``: einsum attention; fastest below ~280 tokens and the
  reference implementation for kernel tests.
- ``impl="auto"``: picks the measured-fastest impl by sequence length
  (thresholds measured on v5e, tools/attn_bench.py).

Optional boolean mask, True = attend: shared (N, N) everywhere; (B, H, N, N)
additionally on the XLA path (``auto`` routes batched/per-head masks to XLA —
the Pallas kernels support only a shared (N, N) mask).
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG_INF = -1e30


def xla_attention(q, k, v, mask=None, scale=None):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    weights = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    # f32 PV accumulation keeps bf16 outputs consistent with the flash kernel
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def dot_product_attention(q, k, v, mask=None, impl="auto", scale=None):
    """Scaled dot-product attention. q, k, v: (B, H, N, D).

    ``scale`` overrides the default 1/sqrt(D) logit scale (used when D is
    zero-padded to the lane width and the true head dim is smaller)."""
    if impl == "auto":
        # measured on v5e (BASELINE.md round 2, tools/attn_bench.py): XLA's
        # fused attention wins below ~280 tokens (N=135: 1.07 vs 1.20 ms;
        # N=256: 2.36 vs 2.45); the one-shot VMEM-resident kernel wins from
        # ~320 tokens (2.95 vs 4.38 ms; ds3 450: 4.07 vs 7.32; N=1024: 0.39
        # vs 1.69) because it never materializes the (N, N) scores in HBM.
        # Above 1024 the score block outgrows a comfortable VMEM footprint
        # and the online-softmax flash kernel takes over (N=2048: 1.84 vs
        # 3.45 ms XLA). Both Pallas kernels only support a shared (N, N)
        # mask — batched / per-head masks take the XLA path.
        n = q.shape[-2]
        kernel_ok = mask is None or mask.ndim == 2
        if kernel_ok and 288 <= n <= 1024:
            impl = "vmem"
        elif kernel_ok and n > 1024:
            impl = "flash"
        else:
            impl = "xla"
    if impl == "xla":
        return xla_attention(q, k, v, mask, scale=scale)
    if impl == "flash":
        from vit4hep_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask, 256, 256, scale)
    if impl == "vmem":
        # same guard the auto path applies (n <= 1024): the one-shot kernel
        # holds the full K/V panel + (N, N) scores per (batch, head) grid
        # cell in VMEM — an explicit `attn_impl: vmem` config beyond that
        # would hit a raw Mosaic scoped-VMEM compile failure
        n_kv, d = q.shape[-2], q.shape[-1]
        if n_kv > 1024 or 16 * n_kv * d + 20 * n_kv * n_kv > 120 * 1024 * 1024:
            raise ValueError(
                f"attn_impl 'vmem': N={n_kv} x D={d} exceeds the one-shot "
                f"kernel's VMEM working set; use attn_impl 'flash' (or "
                f"'auto', which falls back to it) for sequences this long"
            )
        from vit4hep_tpu.ops.vmem_attention import vmem_attention

        return vmem_attention(q, k, v, mask, scale)
    raise ValueError(f"Unknown attention impl '{impl}'")


def qkv_attention(qkv, num_heads, mask=None, impl="auto", scale=None):
    """Attention from the qkv projection's native (B, N, 3*H*D) layout.

    Returns the merged (B, N, H*D) context, ready for the out-projection.
    ``auto`` picks the measured-fastest path by sequence length (v5e, full
    Attention-module context, tools/attn_bench.py): XLA below 128 tokens
    (fused 1.49 vs 0.55 ms at N=88), the fused-layout kernel from 128 up to
    2048 while its VMEM working set fits (1.22 vs 1.84 ms at ds2 N=135;
    5.03 vs 9.54 at ds3 N=450), and the panel-native flash kernel beyond
    (ops/flash_qkv_attention.py; round-4 crossover table,
    tools/flash_threshold.py at hidden 480: fused/flash 1.32/1.35 ms at
    N=2048 — a dead heat at the boundary — then flash alone 1.35 at 3072,
    2.3 at 4096, 4.5 at 8192, 7.7 ms at 16384, vs 2.6-4.3 ms for the
    retired separated-layout flash and 3.6-14.2 ms for XLA where they
    still fit)."""
    n = qkv.shape[-2]
    # VMEM working-set bound of the fused-layout kernel: the (N, 3HD) panel
    # + per-head (N, N) scores must fit the 128M scoped-VMEM budget, and
    # N=2048 is the largest measured-to-compile length — beyond either, the
    # online-softmax flash kernel takes over rather than risking a Mosaic
    # VMEM compile failure. The bound applies to EXPLICIT `attn_impl: fused`
    # configs too (an unguarded config would hit a raw Mosaic error).
    hd = qkv.shape[-1] // 3
    # head_dim <= 64 routes to the head-packed kernel whose score rows are
    # (H*N, N) and which materializes (H*N, HD) qt/qbd/PV panels the
    # per-head loop never holds — budget the working set accordingly
    _packed = hd // num_heads <= 64
    _score_mult = num_heads if _packed else 1
    _packed_panels = 14 * num_heads * n * hd if _packed else 0
    fused_fits = (
        n <= 2048
        and (16 * n * hd + 20 * n * n * _score_mult + _packed_panels
             <= 120 * 1024 * 1024)
    )
    if impl == "auto":
        kernel_ok = mask is None or mask.ndim == 2
        # measured fused wins at every point up to N=2048 (1.17 vs 1.70 ms
        # vmem / 3.54 xla). This holds even at small head_dim where the
        # kernel's per-head matmuls starve the MXU: at the ds2-cINN subnet
        # shape (N=135, hidden 192, head_dim 48) the kernel profiles at
        # 0.98 ms/call — poor (1.8 TFLOP/s) — but XLA's batched-matmul
        # attention is WORSE (~0.86 ms/call: three HBM passes over the
        # materialized f32 (B, H, N, N) scores plus a qkv retile copy;
        # round-3 xplane A/B, cINN e2e 1075 xla vs 1195 fused showers/s).
        if kernel_ok and n >= 128 and fused_fits:
            impl = "fused"
        elif kernel_ok and n >= 128:
            impl = "flash"
        else:
            impl = "xla"
    if impl == "fused":
        if not fused_fits:
            raise ValueError(
                f"attn_impl 'fused': N={n} tokens x head_dim {hd // num_heads} "
                f"exceeds the fused-layout kernel's VMEM working-set bound "
                f"(would fail Mosaic scoped-VMEM compilation); use "
                f"attn_impl 'flash' (or 'auto', which falls back to it) "
                f"for sequences this long"
            )
        from vit4hep_tpu.ops.fused_qkv_attention import fused_qkv_attention

        return fused_qkv_attention(qkv, num_heads, mask, scale)
    if impl == "flash" and (mask is None or mask.ndim == 2):
        # beyond-VMEM tier in the SAME native layout: no transposes at the
        # kernel boundary, bf16-resident panel, per-head online softmax
        # (ops/flash_qkv_attention.py — round-4 replacement of the
        # separated-layout flash fallback for panel-layout callers). Past
        # ITS panel-residency bound (~16k tokens at hidden 480) the
        # streaming separated-layout kernel below takes over — it reads
        # K/V blocks from HBM and compiles at any N.
        from vit4hep_tpu.ops.flash_qkv_attention import (
            flash_qkv_attention, flash_qkv_fits)

        if flash_qkv_fits(n, hd, num_heads=num_heads):
            return flash_qkv_attention(qkv, num_heads, mask, scale)
    # separated-tensor fallbacks: split + transpose around dot_product_attention
    b, _, three_hd = qkv.shape
    d = three_hd // 3 // num_heads
    qkv5 = qkv.reshape(b, n, 3, num_heads, d)
    q, k, v = (jnp.transpose(qkv5[:, :, i], (0, 2, 1, 3)) for i in range(3))
    out = dot_product_attention(q, k, v, mask=mask, impl=impl, scale=scale)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, num_heads * d)
