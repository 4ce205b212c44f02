"""DiT-style Vision Transformer backbone (Flax), TPU-first.

Functional re-design of the reference ViT/ViT1D (`/root/reference/nn/vit.py`):
same architecture family — voxel-patch tokens, adaLN-Zero conditioning, learnable
Fourier or fixed sin-cos positional embeddings, optional layer-causal attention
mask, per-block gradient checkpointing — but built as pure Flax modules whose
forward is a single XLA program. Attention dispatches to the Pallas
flash-attention kernel or plain XLA (vit4hep_tpu/ops/attention.py) instead of
torch SDPA / xformers.

Config surface parity: both ``ViT(param)`` and ``ViT1D(param)`` accept the exact
``param`` dict the reference YAMLs ship (configs/model/cfm/*.yaml) — unknown keys
are ignored, ``num_patches`` may be flat ``[L, A, R]`` or per-section
``[[L, A, R], ...]``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vit4hep_tpu.ops import pos_embed as pe_ops
from vit4hep_tpu.ops.attention import qkv_attention

xavier = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros


def _normalize_num_patches(num_patches) -> tuple[tuple[int, int, int], ...]:
    num_patches = list(num_patches)
    if len(num_patches) > 0 and isinstance(num_patches[0], int):
        return (tuple(num_patches),)
    return tuple(tuple(sec) for sec in num_patches)


@dataclasses.dataclass(frozen=True)
class ViTParams:
    """Static architecture configuration (hashable, so modules stay pytree-safe).

    Field names and defaults track the reference's defaults dict
    (nn/vit.py:52-70) so that `param` dicts from its configs load unchanged.
    """

    dim: int = 3
    condition_dim: int = 46
    hidden_dim: int = 180
    out_channels: int = 1
    depth: int = 2
    num_heads: int = 4
    mlp_ratio: float = 2.0
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    pos_embedding_coords: str = "cartesian"
    temperature: int = 10000
    learn_pos_embed: bool = True
    causal_attn: bool = False
    checkpoint_grads: bool = False
    patch_dim: int = 12
    num_patches: tuple = ((15, 4, 9),)
    # ViT1D extras (nn/vit.py:221-229)
    prod_num_patches: int = 15 * 4 * 9
    x_out: int | None = None
    # TPU-specific: attention implementation ("auto" | "flash" | "xla") and
    # the fused Pallas adaLN-MLP path (checkpoint-compatible either way)
    attn_impl: str = "auto"
    fused_mlp: bool = False
    # TPU-specific: run each whole DiT block as ONE Pallas kernel (LN +
    # adaLN + qkv/out Dense + attention + MLP + residuals all VMEM-resident,
    # ops/fused_dit_block.py) — checkpoint-compatible param tree; falls back
    # to the composed path when pad_attn_heads is set or the mask is not a
    # shared (N, N). "sample" (the shipped default for CFM ViTs) applies the
    # megakernel to the SAMPLING path only: its backward pays a recomputed
    # forward, which measured slower than the composed train step (58.3 vs
    # 69.0 it/s ds2), while sampling gains +39-67% (BASELINE.md round 2) —
    # CFM models build a sampling-net variant via `sampling_variant()`.
    fused_block: bool | str = False
    # escape hatch: with fused_block active, false forces one megakernel
    # PER BLOCK instead of the whole-stack kernel (e.g. if Mosaic's compile
    # time or VMEM behavior regresses at a new depth/width)
    fused_stack: bool = True
    # batch-group size for the stack / whole-ViT kernels: G batch elements
    # per grid cell, so panel matmuls see G*N rows (the fused_energy_decoder
    # trick — what makes small-subnet shapes like the cINN ViT1D reach the
    # MXU). 1 = the round-2 per-element grid. Numerics are identical per
    # element; VMEM scales with G, gated by stack_vmem_estimate.
    fused_group: int = 1
    # TPU-specific: zero-pad head_dim up to the 128-lane tile inside the QKV /
    # out-projection kernels (bit-exact: padded q/k dims contribute 0 to the
    # logits, padded v columns are dropped by zero rows of the out kernel).
    # Param tree is unchanged, so the flag can be flipped on existing runs.
    pad_attn_heads: bool = False
    compute_dtype: str = "float32"
    # fine-tuning mappers (reference experiment_finetuning.py:75-139): when
    # in_patch_dim is set, a Dense(in_patch_dim -> patch_dim) + SiLU mapper is
    # prepended to the backbone x_embedder; likewise in_condition_dim for the
    # c_embedder. out_patch_dim overrides the FinalLayer output patch size
    # (the target dataset's), decoupling it from the embedder input.
    in_patch_dim: int | None = None
    in_condition_dim: int | None = None
    out_patch_dim: int | None = None

    # reference-config knobs that are accepted but have no TPU equivalent
    # (reference nn/vit.py:52-70): silently ignore these, warn on anything
    # else unknown so a typo'd real option doesn't no-op invisibly.
    _IGNORED_REFERENCE_KEYS = frozenset({
        "use_torch_sdpa", "use_rotary_emb", "dropout", "attn_drop", "proj_drop",
    })

    @classmethod
    def create(cls, param: dict) -> "ViTParams":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in dict(param).items() if k in known}
        unknown = set(dict(param)) - known - cls._IGNORED_REFERENCE_KEYS
        if unknown:
            import logging

            logging.getLogger("vit4hep-tpu").warning(
                "ViTParams: ignoring unknown net.param keys %s (typo?)",
                sorted(unknown),
            )
        if "num_patches" in kwargs:
            kwargs["num_patches"] = _normalize_num_patches(kwargs["num_patches"])
        if "mlp_ratio" in kwargs:
            kwargs["mlp_ratio"] = float(kwargs["mlp_ratio"])
        fb = kwargs.get("fused_block", False)
        # strict: every gate matches exact values, so YAML ints
        # (fused_block: 1) must be rejected, not let 1 == True slip through
        if not (isinstance(fb, bool) or fb in ("sample", "hybrid")):
            raise ValueError(
                f"fused_block must be true, false, 'sample', or 'hybrid' — "
                f"got {fb!r} (anything else would silently disable the "
                "megakernel)"
            )
        return cls(**kwargs)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype in ("bfloat16", "bf16") else jnp.float32

    @property
    def total_patches(self) -> int:
        return sum(int(np.prod(s)) for s in self.num_patches)


def modulate(x, shift, scale):
    """adaLN modulation (reference nn/vit.py:457-458)."""
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class MlpBlock(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=xavier, bias_init=zeros, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.out, kernel_init=xavier, bias_init=zeros, dtype=self.dtype)(x)
        return x


class _DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense (same param names/shapes/inits),
    used by the fused kernel paths so checkpoints stay interchangeable with
    the unfused layout."""

    in_dim: int
    out_dim: int
    kernel_init: Any = xavier

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, (self.in_dim, self.out_dim))
        bias = self.param("bias", zeros, (self.out_dim,))
        return kernel, bias


class FusedMlpHalf(nn.Module):
    """adaLN-MLP half of the DiT block as one Pallas kernel
    (vit4hep_tpu/ops/fused_mlp.py): LN + modulate + Dense/GELU/Dense + gate +
    residual without intermediate HBM round trips. Param tree matches
    MlpBlock's (Dense_0/Dense_1) so the flag can be flipped on existing runs.
    """

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, shift, scale, gate):
        from vit4hep_tpu.ops.fused_mlp import fused_mlp_half

        w1, b1 = _DenseParams(self.in_dim, self.hidden, name="Dense_0")()
        w2, b2 = _DenseParams(self.hidden, self.in_dim, name="Dense_1")()
        return fused_mlp_half(
            x.astype(jnp.float32), shift.astype(jnp.float32),
            scale.astype(jnp.float32), gate.astype(jnp.float32), w1, b1, w2, b2,
        )


class Attention(nn.Module):
    """Fused MHSA; replaces reference nn/vit.py:397-454.

    With ``pad_heads`` the QKV and out-projection kernels are zero-padded so
    attention runs at a 128-multiple head_dim (the TPU lane width). Numerics
    are bit-exact — the padded q/k dims add exact zeros to each logit dot
    product and the padded v columns are annihilated by zero rows of the out
    kernel — and XLA no longer retiles head slices that straddle 128-lane
    boundaries. Param names/shapes match nn.Dense (Dense_0/Dense_1), so
    checkpoints are interchangeable with the unpadded path.

    Measured v5e ds2 (head_dim 80): SLOWER than the retile it removes
    (134.4 vs 181.6 showers/s) — the padded tensors carry 1.6x the bytes
    through a VPU/bandwidth-bound block (BASELINE.md). Kept opt-in for
    other shapes/generations.
    """

    hidden: int
    num_heads: int
    attn_impl: str = "auto"
    pad_heads: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, c = x.shape
        head_dim = self.hidden // self.num_heads
        pad = (-head_dim) % 128 if self.pad_heads else 0
        if pad:
            h, d, dp = self.num_heads, head_dim, head_dim + pad
            wk, wb = _DenseParams(c, 3 * self.hidden, name="Dense_0")()
            wk = jnp.pad(
                wk.astype(self.dtype).reshape(c, 3, h, d), ((0, 0), (0, 0), (0, 0), (0, pad))
            ).reshape(c, 3 * h * dp)
            wb = jnp.pad(
                wb.astype(self.dtype).reshape(3, h, d), ((0, 0), (0, 0), (0, pad))
            ).reshape(3 * h * dp)
            qkv = (x.astype(self.dtype) @ wk + wb).reshape(b, n, 3, h, dp)
        else:
            qkv = nn.Dense(
                3 * self.hidden, use_bias=True, kernel_init=xavier, bias_init=zeros,
                dtype=self.dtype,
            )(x)
            qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        # the qkv tensor stays in the Dense output's native (B, N, 3*H*D)
        # layout all the way into the attention kernel — the separated
        # (B, H, N, D) transposes cost ~4.5 ms/block-eval of materialized
        # copies at ds3 around a pallas_call (BASELINE.md round 2). The
        # logit scale stays 1/sqrt(true head_dim) even when D is padded.
        out = qkv_attention(
            qkv.reshape(b, n, -1), self.num_heads, mask=mask,
            impl=self.attn_impl, scale=float(head_dim) ** -0.5,
        )
        if pad:
            ok, ob = _DenseParams(self.hidden, self.hidden, name="Dense_1")()
            okp = jnp.pad(
                ok.astype(self.dtype).reshape(h, d, self.hidden), ((0, 0), (0, pad), (0, 0))
            ).reshape(h * dp, self.hidden)
            return out @ okp + ob.astype(self.dtype)
        return nn.Dense(self.hidden, kernel_init=xavier, bias_init=zeros, dtype=self.dtype)(out)


class _AttnParams(nn.Module):
    """Parameter-only stand-in for the Attention module's Dense pair (same
    param tree: Dense_0 qkv, Dense_1 out), used by the fused-block path."""

    hidden: int

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams(self.hidden, 3 * self.hidden, name="Dense_0")()
        wo, bo = _DenseParams(self.hidden, self.hidden, name="Dense_1")()
        return wq, bq, wo, bo


class _MlpParams(nn.Module):
    """Parameter-only stand-in for MlpBlock (Dense_0/Dense_1)."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.in_dim, self.hidden, name="Dense_0")()
        w2, b2 = _DenseParams(self.hidden, self.in_dim, name="Dense_1")()
        return w1, b1, w2, b2


class _BlockParams(nn.Module):
    """Parameter-only stand-in for a whole DiTBlock (adaLN_modulation Dense
    + Attention_0 + MlpBlock_0), used by the fused block-stack path. The
    adaLN Dense is applied here (it consumes the conditioning, not the
    token panel); the returned weights feed the stack kernel."""

    hidden: int
    mlp_hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c_act):
        mod = nn.Dense(
            6 * self.hidden, kernel_init=zeros, bias_init=zeros,
            dtype=self.dtype, name="adaLN_modulation",
        )(c_act)
        wq, bq, wo, bo = _AttnParams(self.hidden, name="Attention_0")()
        w1, b1, w2, b2 = _MlpParams(
            self.hidden, self.mlp_hidden, name="MlpBlock_0"
        )()
        return mod, (wq, bq, wo, bo, w1, b1, w2, b2)


class _FinalParams(nn.Module):
    """Parameter-only stand-in for FinalLayer (adaLN_modulation Dense +
    zero-init Dense_0), used by the whole-ViT kernel path. The adaLN Dense
    is applied here (it consumes the conditioning); the zero-init output
    projection feeds the kernel."""

    hidden: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        mod = nn.Dense(
            2 * self.hidden, kernel_init=zeros, bias_init=zeros,
            dtype=self.dtype, name="adaLN_modulation",
        )(nn.silu(c))
        wf, bf = _DenseParams(
            self.hidden, self.out_dim, kernel_init=zeros, name="Dense_0"
        )()
        return mod, wf, bf


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (reference nn/vit.py:302-333).

    With ``fused_block`` the whole composed path — LN, adaLN modulation,
    qkv/out Dense, attention, MLP, gated residuals — runs as ONE Pallas
    kernel per batch element (ops/fused_dit_block.py): the (B, N, H)
    activation makes exactly one HBM round trip per block instead of one
    per op. Param tree is identical to the unfused layout (Attention_0/
    MlpBlock_0 Dense pairs), so checkpoints are interchangeable. Requires
    an (N, N)-shared (or absent) mask and no pad_heads."""

    hidden: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_impl: str = "auto"
    fused_mlp: bool = False
    fused_block: bool = False
    pad_heads: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, mask=None):
        mod = nn.Dense(
            6 * self.hidden, kernel_init=zeros, bias_init=zeros, dtype=self.dtype,
            name="adaLN_modulation",
        )(nn.silu(c))
        if self.fused_block and not self.pad_heads and (
            mask is None or mask.ndim == 2
        ):
            from vit4hep_tpu.ops.fused_dit_block import fused_dit_block

            wq, bq, wo, bo = _AttnParams(self.hidden, name="Attention_0")()
            w1, b1, w2, b2 = _MlpParams(
                self.hidden, int(self.hidden * self.mlp_ratio), name="MlpBlock_0"
            )()
            head_dim = self.hidden // self.num_heads
            return fused_dit_block(
                x.astype(jnp.float32), mod.reshape(x.shape[0], 6, self.hidden),
                wq, bq, wo, bo, w1, b1, w2, b2, mask, self.num_heads,
                float(head_dim) ** -0.5,
            )
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
        norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)
        attn = Attention(
            self.hidden, self.num_heads, attn_impl=self.attn_impl,
            pad_heads=self.pad_heads, dtype=self.dtype,
        )
        x = x + gate_msa[:, None, :] * attn(modulate(norm(x), shift_msa, scale_msa), mask)
        if self.fused_mlp:
            x = FusedMlpHalf(
                self.hidden, int(self.hidden * self.mlp_ratio), name="MlpBlock_0"
            )(x, shift_mlp, scale_mlp, gate_mlp)
        else:
            mlp = MlpBlock(int(self.hidden * self.mlp_ratio), self.hidden, dtype=self.dtype)
            x = x + gate_mlp[:, None, :] * mlp(modulate(norm(x), shift_mlp, scale_mlp))
        return x


class FinalLayer(nn.Module):
    """adaLN + zero-init output projection (reference nn/vit.py:336-351)."""

    hidden: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(
            2 * self.hidden, kernel_init=zeros, bias_init=zeros, dtype=self.dtype,
            name="adaLN_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype)(x),
            shift, scale,
        )
        return nn.Dense(self.out_dim, kernel_init=zeros, bias_init=zeros, dtype=self.dtype)(x)


class TimestepEmbedder(nn.Module):
    """Sinusoidal frequency embedding -> MLP (reference nn/vit.py:354-394)."""

    hidden: int
    freq_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t):
        t_freq = pe_ops.timestep_embedding(t, self.freq_dim).astype(self.dtype)
        t_emb = nn.Dense(self.hidden, kernel_init=xavier, bias_init=zeros, dtype=self.dtype)(t_freq)
        t_emb = nn.silu(t_emb)
        return nn.Dense(self.hidden, kernel_init=xavier, bias_init=zeros, dtype=self.dtype)(t_emb)


class ConditionEmbedder(nn.Module):
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        c = nn.Dense(self.hidden, kernel_init=xavier, bias_init=zeros, dtype=self.dtype)(c)
        c = nn.silu(c)
        return nn.Dense(self.hidden, kernel_init=xavier, bias_init=zeros, dtype=self.dtype)(c)


class _ViTBase(nn.Module):
    cfg: ViTParams

    def _pos_embedding_3d(self):
        p = self.cfg
        if p.learn_pos_embed:
            freqs = self.param(
                "pos_embed_freqs", nn.initializers.normal(1.0), (p.hidden_dim // 6,)
            )
            pos_z, pos_y, pos_x = pe_ops.create_meshgrid(p.num_patches)
            return pe_ops.learnable_fourier_pos_embed_3d(
                freqs, jnp.asarray(pos_z), jnp.asarray(pos_y), jnp.asarray(pos_x)
            )
        return jnp.asarray(
            pe_ops.get_sincos_pos_embed(
                p.pos_embedding_coords, p.num_patches[0], p.hidden_dim, p.dim, p.temperature
            )
        )

    def _attn_mask(self):
        p = self.cfg
        if not p.causal_attn:
            return None
        assert p.dim == 3, "A layer-causal attention mask should only be used in 3d"
        return jnp.asarray(pe_ops.layer_causal_mask(p.num_patches[0]))

    def _blocks(self, x, c, mask):
        p = self.cfg
        if (
            p.fused_block in (True, "hybrid")
            and not p.checkpoint_grads
            and not p.pad_attn_heads
            and (mask is None or mask.ndim == 2)
        ):
            return self._fused_block_stack(x, c, mask)
        block_cls = DiTBlock
        if p.checkpoint_grads:
            # checkpoint_grads wins over fused_block: the stack/megakernel
            # backward recomputes L-1 extra block forwards, which is NOT the
            # memory/FLOP contract a user enabling remat asked for — honor
            # remat on the composed path instead (sampling twins built by
            # sampling_variant() clear checkpoint_grads, so `fused_block:
            # sample` still gets the stack kernel where it wins)
            block_cls = nn.remat(DiTBlock, static_argnums=())
        for i in range(p.depth):
            x = block_cls(
                p.hidden_dim, p.num_heads, mlp_ratio=p.mlp_ratio,
                attn_impl=p.attn_impl, fused_mlp=p.fused_mlp,
                fused_block=p.fused_block in (True, "hybrid") and not p.checkpoint_grads,
                pad_heads=p.pad_attn_heads,
                dtype=p.dtype, name=f"block_{i}",
            )(x, c, mask)
        return x

    def _fused_block_stack(self, x, c, mask):
        """All blocks as ONE Pallas kernel per batch element
        (ops/fused_dit_block.py:fused_dit_stack): the activation panel
        never returns to HBM between blocks. Param tree identical to the
        per-block modules (block_i/{adaLN_modulation, Attention_0,
        MlpBlock_0}), so checkpoints are interchangeable. Falls back to
        the per-block megakernel when the stack's VMEM estimate exceeds
        the 128M budget."""
        from vit4hep_tpu.ops.fused_dit_block import fused_dit_stack

        p = self.cfg
        mlp_hidden = int(p.hidden_dim * p.mlp_ratio)
        b, n, _ = x.shape
        c_act = nn.silu(c)
        mods, weights = [], []
        for i in range(p.depth):
            mod, ws = _BlockParams(
                p.hidden_dim, mlp_hidden, dtype=p.dtype, name=f"block_{i}"
            )(c_act)
            mods.append(mod.reshape(b, 6, p.hidden_dim))
            weights.append(ws)
        # fall back when the kernel's own 1.3x-margined VMEM request would
        # hit the 128M cap (128/1.3 ~ 98M) — past that, the stack compiles
        # with less headroom than its sizing model demands. The group drops
        # to whatever still fits before the per-block fallback kicks in.
        group = self._fit_group(n, mlp_hidden)
        if not p.fused_stack or group == 0:
            from vit4hep_tpu.ops.fused_dit_block import fused_dit_block

            head_scale = float(p.hidden_dim // p.num_heads) ** -0.5
            for mod, ws in zip(mods, weights):
                x = fused_dit_block(
                    x.astype(jnp.float32), mod, *ws, mask, p.num_heads,
                    head_scale,
                )
            return x
        stacked = [jnp.stack(arrs) for arrs in zip(*weights)]
        return fused_dit_stack(
            x.astype(jnp.float32), jnp.stack(mods, axis=1), *stacked, mask,
            p.num_heads, float(p.hidden_dim // p.num_heads) ** -0.5, group,
            "xla" if p.fused_block == "hybrid" else "pallas",
        )

    def _fit_group(self, n, mlp_hidden):
        """Largest VMEM-fitting group, searching down from cfg.fused_group
        by halving; 0 = nothing fits (the caller falls back to per-block
        kernels). Candidates are snapped to Mosaic-safe sizes first
        (_safe_group: G*N must be a multiple of 8 on the sublane axis) so
        the gate prices the group the kernel will actually run — a raw 4
        at N=135 would be re-rounded to 8 in-kernel and blow past the
        budget the gate approved. The snap rounds up, so the returned
        group can EXCEED cfg.fused_group (e.g. 4 -> 8 at odd N); the
        config value is the search start, not a hard cap."""
        from vit4hep_tpu.ops.fused_dit_block import (
            _safe_group, stack_vmem_estimate)

        p = self.cfg
        g = max(1, int(p.fused_group))
        tried = set()
        while g >= 1:
            eff = _safe_group(g, n)
            if eff not in tried:
                tried.add(eff)
                if stack_vmem_estimate(
                    n, p.hidden_dim, mlp_hidden, p.depth, p.num_heads, eff
                ) <= 98 * 1024 * 1024:
                    return eff
            g //= 2
        return 0


    def _fused_vit(self, tokens, cond, mask, out_dim, pos):
        """Embedder + pos-embed + every block + FinalLayer as ONE Pallas
        kernel per batch element (ops/fused_dit_block.py:fused_vit_forward):
        per net eval, HBM sees one read of the token panel and one write of
        the prediction. Param tree identical to the composed modules.
        Returns None (caller falls back) when the VMEM estimate exceeds the
        budget."""
        from vit4hep_tpu.ops.fused_dit_block import fused_vit_forward

        p = self.cfg
        b, n, pdim = tokens.shape
        mlp_hidden = int(p.hidden_dim * p.mlp_ratio)
        group = self._fit_group(n, mlp_hidden)
        if group == 0:
            return None
        wemb, bemb = _DenseParams(pdim, p.hidden_dim, name="x_embedder")()
        pos = pos.astype(jnp.float32)
        c_act = nn.silu(cond)
        mods, weights = [], []
        for i in range(p.depth):
            mod, ws = _BlockParams(
                p.hidden_dim, mlp_hidden, dtype=p.dtype, name=f"block_{i}"
            )(c_act)
            mods.append(mod.reshape(b, 6, p.hidden_dim))
            weights.append(ws)
        fmod, wfin, bfin = _FinalParams(
            p.hidden_dim, out_dim, dtype=p.dtype, name="final_layer"
        )(cond)
        stacked = [jnp.stack(arrs) for arrs in zip(*weights)]
        return fused_vit_forward(
            tokens.astype(jnp.float32), pos, jnp.stack(mods, axis=1),
            fmod.reshape(b, 2, p.hidden_dim), wemb, bemb, *stacked,
            wfin, bfin, mask, p.num_heads,
            float(p.hidden_dim // p.num_heads) ** -0.5, group,
            "xla" if p.fused_block == "hybrid" else "pallas",
        )


class ViTNet(_ViTBase):
    """3-D voxel-patch DiT predicting the CFM velocity per patch.

    __call__(x, t, c): x (B, T, patch_dim), t (B,) or (B, 1), c (B, condition_dim)
    -> (B, T, out_channels * patch_dim).
    """

    @nn.compact
    def __call__(self, x, t, c):
        p = self.cfg
        dt = p.dtype
        x = x.astype(dt)
        if p.in_patch_dim is not None:
            x = nn.Dense(
                p.patch_dim, kernel_init=xavier, bias_init=zeros, dtype=dt,
                name="x_mapper",
            )(x)
            x = nn.silu(x)

        t_emb = TimestepEmbedder(p.hidden_dim, dtype=dt, name="t_embedder")(t)
        c = c.astype(dt)
        if p.in_condition_dim is not None:
            c = nn.Dense(
                p.condition_dim, kernel_init=xavier, bias_init=zeros, dtype=dt,
                name="c_mapper",
            )(c)
            c = nn.silu(c)
        c_emb = ConditionEmbedder(p.hidden_dim, dtype=dt, name="c_embedder")(c)
        cond = t_emb + c_emb

        mask = self._attn_mask()
        out_patch = p.out_patch_dim if p.out_patch_dim is not None else p.patch_dim
        out_dim = p.out_channels * 1 * out_patch
        if (
            p.fused_block in (True, "hybrid")
            and p.fused_stack
            and not p.checkpoint_grads  # remat wins: see _blocks
            and not p.pad_attn_heads
            and (mask is None or mask.ndim == 2)
        ):
            out = self._fused_vit(x, cond, mask, out_dim, self._pos_embedding_3d())
            if out is not None:
                return out.astype(jnp.float32)

        x = nn.Dense(
            p.hidden_dim, kernel_init=xavier, bias_init=zeros, dtype=dt, name="x_embedder"
        )(x)
        x = x + self._pos_embedding_3d().astype(dt)
        x = self._blocks(x, cond, mask)
        out = FinalLayer(
            p.hidden_dim, out_dim, dtype=dt, name="final_layer"
        )(x, cond)
        return out.astype(jnp.float32)

class ViT1DNet(_ViTBase):
    """ViT with 1-D positional embedding and no time input; the coupling-subnet
    backbone of the cINN stack (reference nn/vit.py:209-299).

    __call__(x, c): x (B, T, patch_dim), c (B, condition_dim)
    -> (B, T, out_channels * x_out * patch_dim).
    """

    def _pos_embedding_1d(self):
        p = self.cfg
        if p.learn_pos_embed:
            freqs = self.param(
                "pos_embed_freqs", nn.initializers.normal(1.0), (p.hidden_dim // 2,)
            )
            grid = jnp.arange(p.prod_num_patches) / p.prod_num_patches
            return pe_ops.learnable_fourier_pos_embed_1d(freqs, grid)
        return jnp.asarray(
            pe_ops.get_sincos_pos_embed(
                p.pos_embedding_coords, p.num_patches[0], p.hidden_dim, p.dim, p.temperature
            )
        )

    @nn.compact
    def __call__(self, x, c):
        p = self.cfg
        dt = p.dtype
        cond = ConditionEmbedder(p.hidden_dim, dtype=dt, name="c_embedder")(c.astype(dt))
        mask = self._attn_mask()
        x_out = p.x_out if p.x_out is not None else 1
        out_dim = p.out_channels * x_out * p.patch_dim
        if (
            p.fused_block in (True, "hybrid")
            and p.fused_stack
            and not p.checkpoint_grads  # remat wins: see _blocks
            and not p.pad_attn_heads
            and (mask is None or mask.ndim == 2)
        ):
            out = self._fused_vit(
                x.astype(dt), cond, mask, out_dim, self._pos_embedding_1d()
            )
            if out is not None:
                return out.astype(jnp.float32)

        x = nn.Dense(
            p.hidden_dim, kernel_init=xavier, bias_init=zeros, dtype=dt, name="x_embedder"
        )(x.astype(dt))
        x = x + self._pos_embedding_1d().astype(dt)
        x = self._blocks(x, cond, mask)
        out = FinalLayer(
            p.hidden_dim, out_dim, dtype=dt, name="final_layer"
        )(x, cond)
        return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# config-surface factories (what `_target_: nn.vit.ViT` resolves to)
# ---------------------------------------------------------------------------
def sampling_variant(net):
    """The forward-only twin of a net whose config requests
    ``fused_block: sample``: same class, same param tree, but with the
    DiT-block megakernel enabled. CFM models route ``sample_batch`` through
    it while training keeps the composed path (see ViTParams.fused_block)."""
    cfg = getattr(net, "cfg", None)
    if getattr(cfg, "fused_block", None) == "sample":
        import dataclasses

        # checkpoint_grads is dropped in the twin (when the cfg has it —
        # the energy transformer's doesn't): sampling never differentiates,
        # and leaving it set would (by the rule in _blocks) veto the stack
        # kernel the twin exists for
        kw = {"fused_block": True}
        if any(f.name == "checkpoint_grads" for f in dataclasses.fields(cfg)):
            kw["checkpoint_grads"] = False
        return type(net)(cfg=dataclasses.replace(cfg, **kw))
    return net


def ViT(param: dict) -> ViTNet:
    return ViTNet(cfg=ViTParams.create(param))


def ViT1D(param: dict) -> ViT1DNet:
    p = dict(param)
    p.setdefault("prod_num_patches", int(math.prod(np.asarray(p.get("num_patches", [[15, 4, 9]])).ravel())))
    return ViT1DNet(cfg=ViTParams.create(p))
