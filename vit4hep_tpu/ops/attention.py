"""Multi-head attention dispatch: fused Pallas flash-attention or plain XLA.

This replaces the reference's two native attention backends — torch SDPA
(nn/vit.py:431-438) and xformers ``memory_efficient_attention`` (nn/vit.py:
440-449) — with TPU-native equivalents:

- ``impl="flash"``: block-wise online-softmax Pallas kernel
  (vit4hep_tpu/ops/flash_attention.py), mask-capable, with a custom VJP.
- ``impl="xla"``: einsum attention; at the shipped sequence lengths (88-606
  tokens) XLA fuses this well and it serves as the reference implementation
  for kernel tests.
- ``impl="auto"``: picks flash when the shape is worth it, else XLA.

All impls take q, k, v of shape (B, H, N, D) and an optional boolean mask,
True = attend: (N, N) everywhere; (B, H, N, N) additionally on the XLA path
(``auto`` routes batched/per-head masks to XLA — flash supports only a shared
(N, N) mask).
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
        # measured on v5e: XLA's fused attention wins at every shipped sequence
        # length (ds2 135: 181 vs 137 showers/s; ds3 450: 38.7 vs 24.8) — the
        # flash kernel pays lane padding at head_dim 80 and loop overhead.
        # flash only becomes necessary when the (N, N) score tensor itself is
        # prohibitive, i.e. very long sequences (unpatched grids).
        # the flash kernel only supports a shared (N, N) mask — batched /
        # per-head masks must take the XLA path
        n = q.shape[-2]
        flash_ok = mask is None or mask.ndim == 2
        impl = "flash" if (n >= 1024 and flash_ok) else "xla"
    if impl == "xla":
        return xla_attention(q, k, v, mask, scale=scale)
    if impl == "flash":
        from vit4hep_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask, 256, 256, scale)
    raise ValueError(f"Unknown attention impl '{impl}'")
