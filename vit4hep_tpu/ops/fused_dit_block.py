"""The full adaLN-Zero DiT block as ONE Pallas TPU kernel.

Replaces the composed hot path of the reference's DiTBlock (nn/vit.py:
302-333) — LayerNorm -> modulate -> qkv Dense -> attention -> out Dense ->
gated residual -> LayerNorm -> modulate -> MLP -> gated residual — with a
single fused kernel per batch element.

Why: after the fused-layout attention kernel (ops/fused_qkv_attention.py)
landed, the remaining block time is dominated by HBM round trips of the
(B, N, H) activation between ops: every LayerNorm/modulate/residual/Dense
boundary streams the full panel in and out of HBM (~1.3 GB per ds3 block
eval beyond the unavoidable one-read-one-write). This kernel reads x and
the six adaLN vectors once, keeps EVERYTHING — qkv, per-head scores,
softmax, context, MLP hidden — resident in VMEM, and writes only the block
output. Weights ride along as constant-indexed inputs (DMA'd once, not per
grid cell).

Matmuls run as bf16 multiplicands with f32 accumulation — XLA's own
default-precision mode for f32 matmuls on TPU, so numerics match the
unfused path to within its own rounding (CPU interpret mode stays f32 and
matches elementwise).

The backward is a second megakernel (:func:`fused_dit_block_bwd`): it
recomputes the forward's intermediates per batch cell in VMEM
(flash-attention style) and backpropagates the whole block in one pass,
accumulating weight/bias grads across the sequential grid.
:func:`dit_block_reference` is the readable composed equivalent, kept as
the test oracle for both directions.

Shapes: x (B, N, H); mod6 (B, 6, H) ordered [shift_msa, scale_msa,
gate_msa, shift_mlp, scale_mlp, gate_mlp] (= the adaLN Dense output
reshaped); optional shared boolean (N, N) mask, True = attend.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit4hep_tpu.ops.pallas_utils import interpret as _interpret

_NEG_INF = -1e30
_LN_EPS = 1e-6


def _ln(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _LN_EPS)


def _block_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, num_heads,
                  head_dim, scale, mm_dtype):
    _block_kernel_masked(
        x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, None, o_ref,
        num_heads=num_heads, head_dim=head_dim, scale=scale, mm_dtype=mm_dtype,
    )


def _attn_merged(qkv, mask, h_tot, d, scale, mm, mm_dtype):
    """softmax(QK^T)V from a VMEM (N, 3*H*D) qkv panel, merged (N, H*D) out.

    head_dim <= 64 uses the head-packed form (packed_attn_core in
    ops/fused_qkv_attention.py — the shared Mosaic-proven op sequence;
    measured +8% cINN e2e over the per-head loop); larger heads keep the
    per-head loop."""
    from vit4hep_tpu.ops.fused_qkv_attention import packed_attn_core

    n = qkv.shape[0]
    hd = h_tot * d
    if d <= 64:
        o, _, _ = packed_attn_core(
            qkv, mask, num_heads=h_tot, head_dim=d, scale=scale,
            mm_dtype=mm_dtype,
        )  # (H*N, HD), normalized; (h, h) diagonal blocks are the contexts
        # Merge the (h, h) diagonal blocks into (N, HD). Slice-and-concat
        # trips Mosaic ("result/input offset mismatch on non-concat
        # dimension": the hi*d lane / hi*n sublane offsets disagree), so
        # zero the off-blocks and fold the H row blocks with an exact 0/1
        # selection matmul (single-term sums, Precision.HIGHEST — bit-exact
        # on the f32 operand).
        ro = jax.lax.broadcasted_iota(jnp.int32, (h_tot * n, hd), 0) // n
        co = jax.lax.broadcasted_iota(jnp.int32, (h_tot * n, hd), 1) // d
        o = jnp.where(ro == co, o, 0.0)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (n, h_tot * n), 1) % n
            == jax.lax.broadcasted_iota(jnp.int32, (n, h_tot * n), 0)
        ).astype(jnp.float32)
        return jax.lax.dot_general(
            sel, o, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    ctx = []
    for hi in range(h_tot):
        q = qkv[:, hi * d:(hi + 1) * d]
        k = qkv[:, (h_tot + hi) * d:(h_tot + hi + 1) * d]
        v = qkv[:, (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d]
        s = mm(q, k, ((1,), (1,))) * scale  # (N, N)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx.append(mm(p, v) / jnp.where(l == 0.0, 1.0, l))
    return jnp.concatenate(ctx, axis=-1)


def _block_body(x, mod, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask, *,
                num_heads, head_dim, scale, mm_dtype, want_res=False):
    """One adaLN-Zero block on VMEM-resident VALUES: x (N, H) f32, mod
    (6, H) f32, weights in ``mm_dtype`` (or castable), optional mask
    (N, N). Shared by the single-block and block-stack kernels.

    ``want_res`` additionally returns the backward's residual set
    (qkv, ctx, a1, y) — the intermediates whose recompute costs matmuls;
    everything else (LN stats, softmax, gelu) is cheap to re-derive. Used
    by the TRAIN-mode kernels (residual-saving backward, VERDICT r3 #1)."""

    def mm(a, w, dims=((1,), (0,))):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- attention half -------------------------------------------------
    h = _ln(x) * (1.0 + mod[1:2]) + mod[0:1]
    qkv = mm(h, wqkv) + bqkv[None, :].astype(jnp.float32)  # (N, 3*H)
    merged = _attn_merged(qkv, mask, num_heads, head_dim, scale, mm, mm_dtype)
    attn = mm(merged, wout)
    x1 = x + mod[2:3] * (attn + bout[None, :].astype(jnp.float32))

    # ---- MLP half --------------------------------------------------------
    h2 = _ln(x1) * (1.0 + mod[4:5]) + mod[3:4]
    a1 = mm(h2, w1) + b1[None, :].astype(jnp.float32)
    hid = jax.nn.gelu(a1, approximate=True)
    y = mm(hid, w2) + b2[None, :].astype(jnp.float32)
    out = x1 + mod[5:6] * y
    if want_res:
        return out, (qkv, merged, a1, y)
    return out


def _mod_bcast(oh, mod, k):
    """Broadcast per-element adaLN row ``mod[:, k]`` (G, H) to panel rows
    (G*N, H) via the one-hot (G*N, G) matmul — a pure 2-D op (no reshape
    for Mosaic to choke on). Precision.HIGHEST keeps it exact f32 on real
    TPU (single-term sums of 1.0-products; default precision would round
    the mod vectors through bf16 multiplicands and break the 'numerics
    identical to group=1' contract the CPU-interpret parity tests assert)."""
    return jax.lax.dot_general(
        oh, mod[:, k], ((((1,), (0,))), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _block_body_g(x, mod, oh, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask, *,
                  num_heads, head_dim, scale, mm_dtype):
    """Grouped twin of :func:`_block_body`: one adaLN-Zero block on a FLAT
    (G*N, H) panel of G batch elements with per-element mod (G, 6, H).

    All ops stay 2-D (the Mosaic-proven fused_energy_decoder pattern —
    3-D dot_generals shape-cast their (G, N, H) operand to (G*N, H),
    which fails to lower at sublane-unaligned N like the cINN's 135):
    adaLN vectors broadcast to rows through the one-hot ``oh`` matmul and
    self-attention runs as one (G*N, G*N) score matmul under the
    caller-built block-diagonal ``mask``. The panel matmuls (qkv/out/MLP)
    see G*N rows per op instead of N — what makes small-subnet shapes
    (cINN ViT1D: N=135, H=192) reach the MXU; the off-diagonal score
    tiles are wasted FLOPs, which is why grouping is a measured opt-in."""

    def mm(a, w, dims=((1,), (0,))):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    bc = lambda k: _mod_bcast(oh, mod, k)

    # ---- attention half -------------------------------------------------
    h = _ln(x) * (1.0 + bc(1)) + bc(0)
    qkv = mm(h, wqkv) + bqkv[None, :].astype(jnp.float32)  # (G*N, 3H)
    h_tot, d = num_heads, head_dim
    ctx = []
    for hi in range(h_tot):
        q = qkv[:, hi * d:(hi + 1) * d]
        k = qkv[:, (h_tot + hi) * d:(h_tot + hi + 1) * d]
        v = qkv[:, (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d]
        s = mm(q, k, ((1,), (1,))) * scale  # (G*N, G*N)
        s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ctx.append(mm(p, v) / jnp.where(l == 0.0, 1.0, l))
    attn = mm(jnp.concatenate(ctx, axis=-1), wout)
    x1 = x + bc(2) * (attn + bout[None, :].astype(jnp.float32))

    # ---- MLP half --------------------------------------------------------
    h2 = _ln(x1) * (1.0 + bc(4)) + bc(3)
    hid = jax.nn.gelu(mm(h2, w1) + b1[None, :].astype(jnp.float32),
                      approximate=True)
    y = mm(hid, w2) + b2[None, :].astype(jnp.float32)
    return x1 + bc(5) * y


def _onehot_rows(gn, g, n_tok):
    """(G*N, G) one-hot: row i belongs to element i // N (f32, built from
    2-D iotas — no reshapes)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (gn, g), 0) // n_tok
        == jax.lax.broadcasted_iota(jnp.int32, (gn, g), 1)
    ).astype(jnp.float32)


def _block_kernel_masked(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref,
                         bout_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref,
                         o_ref, *, num_heads, head_dim, scale, mm_dtype):
    out = _block_body(
        x_ref[0].astype(jnp.float32), mod_ref[0].astype(jnp.float32),
        wqkv_ref[...], bqkv_ref[...], wout_ref[...], bout_ref[...],
        w1_ref[...], b1_ref[...], w2_ref[...], b2_ref[...],
        mask_ref[0] if mask_ref is not None else None,
        num_heads=num_heads, head_dim=head_dim, scale=scale, mm_dtype=mm_dtype,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _stack_kernel_masked(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref,
                         bout_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref,
                         o_ref, *, depth, num_heads, head_dim, scale,
                         mm_dtype):
    """All ``depth`` blocks on one VMEM-resident x panel: the activation
    never returns to HBM between blocks. Weight refs are stacked (L, ...)
    and pre-cast to the matmul dtype by the caller (bf16 on TPU — halves
    their resident VMEM footprint and skips in-kernel cast copies)."""
    x = x_ref[0].astype(jnp.float32)
    mask = mask_ref[0] if mask_ref is not None else None
    for li in range(depth):
        x = _block_body(
            x, mod_ref[0, li].astype(jnp.float32),
            wqkv_ref[li], bqkv_ref[li], wout_ref[li], bout_ref[li],
            w1_ref[li], b1_ref[li], w2_ref[li], b2_ref[li], mask,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            mm_dtype=mm_dtype,
        )
    o_ref[0] = x.astype(o_ref.dtype)


def _stack_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref, **kw):
    _stack_kernel_masked(
        x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, None, o_ref, **kw
    )


def _stack_kernel_g(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref,
                    bout_ref, w1_ref, b1_ref, w2_ref, b2_ref, mask_ref,
                    o_ref, *, depth, num_heads, head_dim, scale,
                    mm_dtype, n_tok):
    """Grouped stack kernel: all ``depth`` blocks on one VMEM-resident
    FLAT (G*N, H) panel of G batch elements. ``mask_ref`` is the
    (G*N, G*N) block-diagonal mask (always present in grouped mode)."""
    gn = x_ref.shape[0]
    oh = _onehot_rows(gn, gn // n_tok, n_tok)
    x = x_ref[...].astype(jnp.float32)
    mask = mask_ref[...]
    for li in range(depth):
        x = _block_body_g(
            x, mod_ref[:, li].astype(jnp.float32), oh,
            wqkv_ref[li], bqkv_ref[li], wout_ref[li], bout_ref[li],
            w1_ref[li], b1_ref[li], w2_ref[li], b2_ref[li], mask,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            mm_dtype=mm_dtype,
        )
    o_ref[...] = x.astype(o_ref.dtype)


def _grouped_mask(mask, n, g):
    """(G*N, G*N) block-diagonal attention mask for flat grouped panels:
    token i attends j iff they belong to the same batch element (and the
    shared (N, N) mask, when given, allows it). Static shapes only —
    built once at trace time, DMA'd as a constant input."""
    seg = jnp.arange(g * n) // n
    bd = seg[:, None] == seg[None, :]
    if mask is not None:
        bd = bd & jnp.tile(mask, (g, g))
    return bd


def _safe_group(group, n):
    """Mosaic-safe batch group for the flat grouped panels: the (G*N, ·)
    blocks put G*N on the sublane axis, which Mosaic requires to be a
    multiple of 8 (the same constraint ops/fused_spline.py and
    fused_energy_decoder.py document — a 540-row block from group=4 at
    N=135 fails to lower). Round G up MINIMALLY: the smallest G' >= G
    with (G'*N) % 8 == 0 is a multiple of 8/gcd(N, 8), not of 8 — e.g.
    N=6 needs only G'=4 from G=2, and over-rounding to 8 would quadruple
    the quadratic (G*N, G*N) score footprint the VMEM gate prices.
    _pad_batch absorbs the excess rows."""
    g = max(1, int(group))
    if g > 1 and (g * n) % 8:
        m = 8 // math.gcd(n, 8)
        g = -(-g // m) * m
    return g


def _pad_batch(arrs, b, group):
    """Zero-pad the leading batch axis of each array to a multiple of
    ``group`` (zero rows are numerically inert here: LN of zeros is zeros,
    softmax rows are uniform, and the pad slice is dropped by the caller)."""
    pad = (-b) % group
    if pad == 0:
        return arrs, b
    return [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in arrs], \
        b + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def fused_dit_stack(x, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask,
                    num_heads, scale, group=1, bwd="pallas"):
    """The whole DiT-block stack as ONE Pallas kernel per batch element.

    x (B, N, H); mods (B, L, 6, H); weights stacked on a leading (L, ...)
    axis; optional shared (N, N) mask. Removes the L-1 inter-block HBM
    round trips of the per-block megakernel. Weight panels ride pre-cast
    to bf16 on TPU (the cast is loop-invariant, so XLA hoists it out of
    the sampling scan).

    The backward recomputes each block's input with the per-block forward
    megakernel and then runs the backward megakernel per block in reverse —
    fully Pallas, no composed fallback — so `fused_block: true` trains on
    the kernels end to end.

    ``group`` > 1 processes G batch elements per grid cell (the
    fused_energy_decoder trick): the panel matmuls see G*N rows, which is
    what makes small-subnet shapes (cINN ViT1D) reach the MXU. Ragged
    batches are zero-padded to a multiple of G and sliced back.

    ``bwd`` selects the backward over the train-saved residuals:
    "pallas" = the residual-consuming backward megakernel; "xla" = the
    hybrid arm (composed-XLA backward, batched dW matmuls — see
    :func:`_block_bwd_res_xla`)."""
    out, _ = _stack_fwd(x, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
                        mask, num_heads, scale, group)
    return out


def stack_vmem_estimate(n, hdim, fdim, depth, num_heads, group=1):
    """Approximate VMEM footprint (bytes) of the stack kernel: bf16 weights
    resident + double-buffered panels + live score blocks. Grouped mode
    (flat G*N panel) pays quadratically for its (G*N, G*N) scores + mask,
    which is what caps the usable group size via the 98M gate."""
    wbytes = 2 * depth * (hdim * 3 * hdim + hdim * hdim + 2 * hdim * fdim)
    rows = group * n
    panels = 4 * rows * (2 * hdim + 3 * hdim + fdim) * 2
    if hdim // num_heads <= 64:
        # head-packed attention (_attn_merged): (H*rows, rows) scores/exp
        # plus the (H*rows, hdim) qt/qbd/merge panels — an H-fold live set
        # the per-head loop never materializes
        scores = (12 * rows * rows * num_heads
                  + 14 * num_heads * rows * hdim)
    else:
        scores = 12 * rows * rows
    scores += rows * rows if group > 1 else 0
    return wbytes + panels + scores


def _stack_fwd(x, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask,
               num_heads, scale, group=1):
    b, n, hdim = x.shape
    depth = wqkv.shape[0]
    d = hdim // num_heads
    fdim = w1.shape[-1]
    mm_dtype = jnp.float32 if _interpret() else jnp.bfloat16
    g = _safe_group(group, n)
    res = (x, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask)
    if mask is not None and mask.ndim != 2:
        raise ValueError("fused_dit_stack supports a shared (N, N) mask")
    head_scale = d**-0.5 if scale is None else scale
    vmem = min(128 * 1024 * 1024,
               max(64 * 1024 * 1024,
                   int(1.3 * stack_vmem_estimate(n, hdim, fdim, depth,
                                                 num_heads, g))))
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    # biases stay f32 (XLA adds f32 biases on the composed path); weight
    # matrices pre-cast to the matmul dtype to halve their VMEM residency
    wargs = [wqkv.astype(mm_dtype), bqkv, wout.astype(mm_dtype), bout,
             w1.astype(mm_dtype), b1, w2.astype(mm_dtype), b2]
    wspecs = [const(depth, hdim, 3 * hdim), const(depth, 3 * hdim),
              const(depth, hdim, hdim), const(depth, hdim),
              const(depth, hdim, fdim), const(depth, fdim),
              const(depth, fdim, hdim), const(depth, hdim)]

    if g > 1:
        # flat grouped panel: (G*N, H) rows, block-diagonal mask — see
        # _block_body_g for why everything must stay 2-D
        (xp, modsp), bp = _pad_batch([x, mods], b, g)
        gn = g * n
        out = pl.pallas_call(
            functools.partial(
                _stack_kernel_g, depth=depth, num_heads=num_heads,
                head_dim=d, scale=head_scale, mm_dtype=mm_dtype, n_tok=n,
            ),
            grid=(bp // g,),
            in_specs=[pl.BlockSpec((gn, hdim), lambda i: (i, 0)),
                      pl.BlockSpec((g, depth, 6, hdim),
                                   lambda i: (i, 0, 0, 0)),
                      *wspecs, const(gn, gn)],
            out_specs=pl.BlockSpec((gn, hdim), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((bp * n, hdim), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=vmem,
            ),
            interpret=_interpret(),
        )(xp.reshape(bp * n, hdim), modsp, *wargs, _grouped_mask(mask, n, g))
        return out.reshape(bp, n, hdim)[:b], res

    in_specs = [
        pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, depth, 6, hdim), lambda i: (i, 0, 0, 0)),
        *wspecs,
    ]
    args = [x, mods, *wargs]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    kernel = functools.partial(
        _stack_kernel_masked if mask is not None else _stack_kernel,
        depth=depth,
        num_heads=num_heads,
        head_dim=d,
        scale=head_scale,
        mm_dtype=mm_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hdim), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*args)
    return out, res


# ---------------------------------------------------------------------------
# TRAIN mode: residual-saving backward (VERDICT r3 #1)
#
# The measured-and-rejected backward recomputed the whole forward per block
# in-kernel (flash style) — net slower than the composed train step. The
# train-mode forward kernels below write the per-block residual set whose
# recompute costs matmuls — block inputs (f32, they feed LayerNorm stats)
# plus qkv / ctx / a1(pre-gelu MLP hidden) / y (mm_dtype) — and the
# residual-consuming backward kernel re-derives only the cheap pieces
# (LN stats, softmax from saved qkv, gelu) in VMEM. Saved big-matmul
# recompute per block: the qkv panel, both MLP panels and PV; re-done: the
# per-head score matmul (q k^T, needed for p anyway) and the (H, H)
# out-projection. When the residual windows would bust VMEM the vjp-fwd
# falls back to the recompute backward — sampling primals are untouched
# either way (they run the residual-free kernels).
# ---------------------------------------------------------------------------


def train_residual_bytes(n, hdim, fdim, depth, res_bytes, save_a1=True):
    """Per-batch-element bytes of the train kernels' residual set. The a1
    (pre-gelu MLP hidden, F = 4H per token — the largest chunk) is dropped
    when VMEM is tight; the backward then recomputes it with one h2 @ w1
    matmul while still skipping the qkv / W2 / PV recomputes."""
    return ((depth + 1) * n * hdim * 4
            + depth * n * (3 * hdim + hdim + (fdim if save_a1 else 0) + hdim)
            * res_bytes)


def _store_block_res(li, x, r, xs_ref, qkvs_ref, ctxs_ref, a1s_ref, ys_ref):
    qkv, ctx, a1, y = r
    xs_ref[0, li] = x.astype(xs_ref.dtype)
    qkvs_ref[0, li] = qkv.astype(qkvs_ref.dtype)
    ctxs_ref[0, li] = ctx.astype(ctxs_ref.dtype)
    if a1s_ref is not None:
        a1s_ref[0, li] = a1.astype(a1s_ref.dtype)
    ys_ref[0, li] = y.astype(ys_ref.dtype)


def _fit_residuals(base, n, hdim, fdim, depth, mm_dtype):
    """(save_a1, rbytes) for the largest residual tier whose 1.3x-margined
    VMEM request fits the 128M cap; (False, None) when none fits (the
    caller falls back to the recompute backward)."""
    rb = 4 if mm_dtype == jnp.float32 else 2
    for save_a1 in (True, False):
        rbytes = train_residual_bytes(n, hdim, fdim, depth, rb, save_a1)
        if 1.3 * (base + 2 * rbytes) <= 128 * 1024 * 1024:
            return save_a1, rbytes
    return False, None


def _res_out_specs(out_specs, out_shape, b, n, hdim, fdim, depth, mm_dtype,
                   save_a1):
    """Append the residual out specs/shapes (xs, qkvs, ctxs, ys[, a1s]) to
    the primary output's."""
    blk = lambda *tail: pl.BlockSpec((1,) + tail, lambda i: (i,) + (0,) * len(tail))
    out_specs = out_specs + [
        blk(depth + 1, n, hdim), blk(depth, n, 3 * hdim),
        blk(depth, n, hdim), blk(depth, n, hdim),
    ]
    out_shape = out_shape + [
        jax.ShapeDtypeStruct((b, depth + 1, n, hdim), jnp.float32),
        jax.ShapeDtypeStruct((b, depth, n, 3 * hdim), mm_dtype),
        jax.ShapeDtypeStruct((b, depth, n, hdim), mm_dtype),
        jax.ShapeDtypeStruct((b, depth, n, hdim), mm_dtype),
    ]
    if save_a1:
        out_specs.append(blk(depth, n, fdim))
        out_shape.append(jax.ShapeDtypeStruct((b, depth, n, fdim), mm_dtype))
    return out_specs, out_shape


def _pack_saved(outs, save_a1):
    """(xs, qkvs, ctxs, a1s | None, ys) from the train kernel's outputs."""
    _, xs, qkvs, ctxs, ys = outs[:5]
    return (xs, qkvs, ctxs, outs[5] if save_a1 else None, ys)


def _stack_train_kernel_masked(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref,
                               bout_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                               mask_ref, *out_refs, depth, num_heads,
                               head_dim, scale, mm_dtype):
    """Stack kernel that additionally emits the backward residual set.
    ``out_refs`` = (o, xs, qkvs, ctxs, ys[, a1s]) — a1s only when saved."""
    o_ref, xs_ref, qkvs_ref, ctxs_ref, ys_ref = out_refs[:5]
    a1s_ref = out_refs[5] if len(out_refs) > 5 else None
    x = x_ref[0].astype(jnp.float32)
    mask = mask_ref[0] if mask_ref is not None else None
    for li in range(depth):
        xin = x
        x, r = _block_body(
            x, mod_ref[0, li].astype(jnp.float32),
            wqkv_ref[li], bqkv_ref[li], wout_ref[li], bout_ref[li],
            w1_ref[li], b1_ref[li], w2_ref[li], b2_ref[li], mask,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            mm_dtype=mm_dtype, want_res=True,
        )
        _store_block_res(li, xin, r, xs_ref, qkvs_ref, ctxs_ref, a1s_ref,
                         ys_ref)
    xs_ref[0, depth] = x.astype(xs_ref.dtype)
    o_ref[0] = x.astype(o_ref.dtype)


def _stack_train_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref,
                        bout_ref, w1_ref, b1_ref, w2_ref, b2_ref, *out_refs,
                        **kw):
    _stack_train_kernel_masked(
        x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, None, *out_refs, **kw
    )


def _vit_train_kernel_masked(tok_ref, pos_ref, mods_ref, fmod_ref, wemb_ref,
                             bemb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                             w1_ref, b1_ref, w2_ref, b2_ref, wfin_ref,
                             bfin_ref, mask_ref, *out_refs, depth, num_heads,
                             head_dim, scale, mm_dtype):
    """Whole-ViT kernel that additionally emits the backward residual set
    (block inputs incl. the embed output at [0] and the last block output
    at [depth] — the final layer's backward needs it). ``out_refs`` =
    (o, xs, qkvs, ctxs, ys[, a1s]) — a1s only when saved."""
    o_ref, xs_ref, qkvs_ref, ctxs_ref, ys_ref = out_refs[:5]
    a1s_ref = out_refs[5] if len(out_refs) > 5 else None

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    tok = tok_ref[0].astype(jnp.float32)
    x = mm(tok, wemb_ref[...]) + bemb_ref[...][None, :].astype(jnp.float32)
    x = x + pos_ref[...].astype(jnp.float32)
    mask = mask_ref[0] if mask_ref is not None else None
    for li in range(depth):
        xin = x
        x, r = _block_body(
            x, mods_ref[0, li].astype(jnp.float32),
            wqkv_ref[li], bqkv_ref[li], wout_ref[li], bout_ref[li],
            w1_ref[li], b1_ref[li], w2_ref[li], b2_ref[li], mask,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            mm_dtype=mm_dtype, want_res=True,
        )
        _store_block_res(li, xin, r, xs_ref, qkvs_ref, ctxs_ref, a1s_ref,
                         ys_ref)
    xs_ref[0, depth] = x.astype(xs_ref.dtype)
    fm = fmod_ref[0].astype(jnp.float32)  # (2, H)
    u = _ln(x) * (1.0 + fm[1:2]) + fm[0:1]
    out = mm(u, wfin_ref[...]) + bfin_ref[...][None, :].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _vit_train_kernel(tok_ref, pos_ref, mods_ref, fmod_ref, wemb_ref,
                      bemb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                      w1_ref, b1_ref, w2_ref, b2_ref, wfin_ref, bfin_ref,
                      *out_refs, **kw):
    _vit_train_kernel_masked(
        tok_ref, pos_ref, mods_ref, fmod_ref, wemb_ref, bemb_ref,
        wqkv_ref, bqkv_ref, wout_ref, bout_ref, w1_ref, b1_ref, w2_ref,
        b2_ref, wfin_ref, bfin_ref, None, *out_refs, **kw
    )


def _bwd_res_kernel(*refs, num_heads, head_dim, scale, mm_dtype, have_a1,
                    have_mask):
    """Residual-consuming backward megakernel: loads the train-mode
    forward's saved intermediates and backpropagates the block with no
    big-matmul recompute (only LN stats, softmax-from-saved-qkv, gelu and
    the (H, H) out-projection are re-derived in VMEM; without ``have_a1``
    the pre-gelu hidden is additionally recomputed with one h2 @ w1
    matmul). Weight/bias grads accumulate across the sequential grid
    (zero-initialized at cell 0).

    ``refs`` = (x, qkv, ctx, [a1,] y, mod, wqkv, wout, bout, w1, b1, w2,
    g, [mask,] dx, dmod, dwqkv, dbqkv, dwout, dbout, dw1, db1, dw2, db2)."""
    it = iter(refs)
    x_ref, qkvs_ref, ctxs_ref = next(it), next(it), next(it)
    a1s_ref = next(it) if have_a1 else None
    ys_ref, mod_ref = next(it), next(it)
    wqkv_ref, wout_ref, bout_ref = next(it), next(it), next(it)
    w1_ref, b1_ref, w2_ref, g_ref = next(it), next(it), next(it), next(it)
    mask_ref = next(it) if have_mask else None
    (dx_ref, dmod_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
     dw1_ref, db1_ref, dw2_ref, db2_ref) = (next(it) for _ in range(10))

    def mm(a, w, dims=((1,), (0,))):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref, dw1_ref,
                    db1_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[0].astype(jnp.float32)      # (N, H) block input
    qkv = qkvs_ref[0].astype(jnp.float32)  # (N, 3H) saved
    ctx = ctxs_ref[0].astype(jnp.float32)  # (N, H)  saved merged context
    y = ys_ref[0].astype(jnp.float32)      # (N, H)  saved MLP output
    mod = mod_ref[0].astype(jnp.float32)   # (6, H)
    g = g_ref[0].astype(jnp.float32)       # (N, H)
    h_tot, d = num_heads, head_dim

    def ln_fwd(z):
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + _LN_EPS)
        return (z - mu) * inv, inv

    def ln_bwd(du, u, inv):
        return inv * (
            du - jnp.mean(du, axis=-1, keepdims=True)
            - u * jnp.mean(du * u, axis=-1, keepdims=True)
        )

    # ---- cheap re-derivations (no saved-matmul recompute) -----------------
    u, inv1 = ln_fwd(x)
    h = u * (1.0 + mod[1:2]) + mod[0:1]
    attn = mm(ctx, wout_ref[...]) + bout_ref[...][None, :]
    x1 = x + mod[2:3] * attn
    u2, inv2 = ln_fwd(x1)
    h2 = u2 * (1.0 + mod[4:5]) + mod[3:4]
    if a1s_ref is not None:
        a1 = a1s_ref[0].astype(jnp.float32)  # (N, F) saved pre-gelu hidden
    else:
        a1 = mm(h2, w1_ref[...]) + b1_ref[...][None, :]
    hid = jax.nn.gelu(a1, approximate=True)

    # ---- backward ---------------------------------------------------------
    dy = g * mod[5:6]
    dmod5 = jnp.sum(g * y, axis=0)
    dhid = mm(dy, w2_ref[...], ((1,), (1,)))
    dw2_ref[...] += mm(hid, dy, ((0,), (0,)))
    db2_ref[...] += jnp.sum(dy, axis=0)
    _, gelu_vjp = jax.vjp(lambda z: jax.nn.gelu(z, approximate=True), a1)
    da1 = gelu_vjp(dhid)[0]
    dh2 = mm(da1, w1_ref[...], ((1,), (1,)))
    dw1_ref[...] += mm(h2, da1, ((0,), (0,)))
    db1_ref[...] += jnp.sum(da1, axis=0)
    dmod4 = jnp.sum(dh2 * u2, axis=0)
    dmod3 = jnp.sum(dh2, axis=0)
    du2 = dh2 * (1.0 + mod[4:5])
    dx1 = g + ln_bwd(du2, u2, inv2)
    dattn = dx1 * mod[2:3]
    dmod2 = jnp.sum(dx1 * attn, axis=0)
    dctx = mm(dattn, wout_ref[...], ((1,), (1,)))
    dwout_ref[...] += mm(ctx, dattn, ((0,), (0,)))
    dbout_ref[...] += jnp.sum(dattn, axis=0)
    # attention: p re-derived per head from the saved qkv panel
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for hi in range(h_tot):
        q = qkv[:, hi * d:(hi + 1) * d]
        k = qkv[:, (h_tot + hi) * d:(h_tot + hi + 1) * d]
        v = qkv[:, (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d]
        s = mm(q, k, ((1,), (1,))) * scale
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / jnp.where(l == 0.0, 1.0, l)
        gh = dctx[:, hi * d:(hi + 1) * d]
        dv = mm(p, gh, ((0,), (0,)))
        dp = mm(gh, v, ((1,), (1,)))
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) * scale
        dqkv_parts_q.append(mm(ds, k, ((1,), (0,))))
        dqkv_parts_k.append(mm(ds, q, ((0,), (0,))))
        dqkv_parts_v.append(dv)
    dqkv = jnp.concatenate(dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=-1)
    dh = mm(dqkv, wqkv_ref[...], ((1,), (1,)))
    dwqkv_ref[...] += mm(h, dqkv, ((0,), (0,)))
    dbqkv_ref[...] += jnp.sum(dqkv, axis=0)
    dmod1 = jnp.sum(dh * u, axis=0)
    dmod0 = jnp.sum(dh, axis=0)
    du = dh * (1.0 + mod[1:2])
    dx = dx1 + ln_bwd(du, u, inv1)

    dx_ref[0] = dx.astype(dx_ref.dtype)
    dmod_ref[0] = jnp.stack(
        [dmod0, dmod1, dmod2, dmod3, dmod4, dmod5], axis=0
    ).astype(dmod_ref.dtype)


def fused_dit_block_bwd_res(xin, qkv, ctx, a1, y, mod6, wqkv, wout, bout,
                            w1, b1, w2, g, mask, num_heads, scale):
    """Gradient of one DiT block from SAVED residuals, as one Pallas kernel.

    ``a1`` may be None (dropped when VMEM was tight) — the kernel then
    recomputes it with one h2 @ w1 matmul. Returns (dx, dmod6, dwqkv,
    dbqkv, dwout, dbout, dw1, db1, dw2, db2) — the same tuple as
    :func:`fused_dit_block_bwd` (see :func:`_bwd_res_kernel`)."""
    b, n, hdim = xin.shape
    d = hdim // num_heads
    fdim = w1.shape[1]

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    row = lambda *tail: pl.BlockSpec((1,) + tail, lambda i: (i,) + (0,) * len(tail))
    in_specs = [row(n, hdim), row(n, 3 * hdim), row(n, hdim)]
    args = [xin, qkv, ctx]
    if a1 is not None:
        in_specs.append(row(n, fdim))
        args.append(a1)
    in_specs += [
        row(n, hdim), row(6, hdim),
        const(hdim, 3 * hdim), const(hdim, hdim), const(hdim,),
        const(hdim, fdim), const(fdim,), const(fdim, hdim),
        row(n, hdim),
    ]
    args += [y, mod6, wqkv, wout, bout, w1, b1, w2, g]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    out_specs = [
        row(n, hdim), row(6, hdim),
        const(hdim, 3 * hdim), const(3 * hdim,),
        const(hdim, hdim), const(hdim,),
        const(hdim, fdim), const(fdim,),
        const(fdim, hdim), const(hdim,),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, hdim), jnp.float32),
        jax.ShapeDtypeStruct((b, 6, hdim), mod6.dtype),
        jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
        jax.ShapeDtypeStruct((3 * hdim,), jnp.float32),
        jax.ShapeDtypeStruct(wout.shape, jnp.float32),
        jax.ShapeDtypeStruct((hdim,), jnp.float32),
        jax.ShapeDtypeStruct(w1.shape, jnp.float32),
        jax.ShapeDtypeStruct((fdim,), jnp.float32),
        jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        jax.ShapeDtypeStruct((hdim,), jnp.float32),
    ]
    kernel = functools.partial(
        _bwd_res_kernel,
        num_heads=num_heads,
        head_dim=d,
        scale=d**-0.5 if scale is None else scale,
        mm_dtype=jnp.float32 if _interpret() else jnp.bfloat16,
        have_a1=a1 is not None,
        have_mask=mask is not None,
    )
    wbytes = 4 * (hdim * 3 * hdim + hdim * hdim + 2 * hdim * fdim)
    panels = 4 * n * (6 * hdim + 2 * 3 * hdim + 3 * fdim) * 2
    scores = 4 * n * n * 4  # live s/e/p/dp blocks, one head at a time
    vmem = min(128 * 1024 * 1024,
               max(64 * 1024 * 1024, 3 * wbytes + panels + scores))
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # weight-grad accumulation requires strictly sequential cells
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*args)
    return tuple(outs)


def _block_bwd_res_xla(xin, qkv, ctx, a1, y, mod6, wqkv, wout, bout,
                       w1, b1, w2, g, mask, num_heads, scale):
    """Gradient of one DiT block from SAVED residuals in plain XLA ops —
    the hybrid train arm (VERDICT r4 next #2): the megakernel forward
    already paid the residual writes; here every weight grad is a single
    batched (B*N, .) x (., .) matmul, dodging the sequential weight-grad
    grid that made the all-Pallas residual backward lose. Same cheap
    re-derivations as :func:`_bwd_res_kernel` (LN stats, softmax from the
    saved qkv, gelu, the (H, H) out-projection), same return tuple as
    :func:`fused_dit_block_bwd_res`; bf16 multiplicands + f32 accumulation
    mirror the kernel's mm contract."""
    mm_dtype = jnp.float32 if _interpret() else jnp.bfloat16
    b, n, hdim = xin.shape
    h_tot = num_heads
    d = hdim // h_tot
    scale = d**-0.5 if scale is None else scale

    def mm(a, w, dims):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32)

    act_w = lambda a, w: mm(a, w, ((2,), (0,)))       # (B,N,I)@(I,O)
    act_wT = lambda a, w: mm(a, w, ((2,), (1,)))      # (B,N,O)@(I,O)^T
    dw = lambda a, gr: mm(a, gr, ((0, 1), (0, 1)))    # batched dW: (I,O)

    x = xin.astype(jnp.float32)
    qkv = qkv.astype(jnp.float32)
    ctx = ctx.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mod = mod6.astype(jnp.float32)
    g = g.astype(jnp.float32)
    m = lambda k: mod[:, k:k + 1]                     # (B, 1, H)

    def ln_fwd(z):
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + _LN_EPS)
        return (z - mu) * inv, inv

    def ln_bwd(du, u, inv):
        return inv * (
            du - jnp.mean(du, axis=-1, keepdims=True)
            - u * jnp.mean(du * u, axis=-1, keepdims=True)
        )

    # ---- cheap re-derivations (no saved-matmul recompute) -----------------
    u, inv1 = ln_fwd(x)
    h = u * (1.0 + m(1)) + m(0)
    attn = act_w(ctx, wout) + bout.astype(jnp.float32)
    x1 = x + m(2) * attn
    u2, inv2 = ln_fwd(x1)
    h2 = u2 * (1.0 + m(4)) + m(3)
    if a1 is not None:
        a1 = a1.astype(jnp.float32)
    else:
        a1 = act_w(h2, w1) + b1.astype(jnp.float32)
    hid = jax.nn.gelu(a1, approximate=True)

    # ---- backward ---------------------------------------------------------
    dy = g * m(5)
    dmod5 = jnp.sum(g * y, axis=1)
    dhid = act_wT(dy, w2)
    dw2 = dw(hid, dy)
    db2 = jnp.sum(dy, axis=(0, 1))
    _, gelu_vjp = jax.vjp(lambda z: jax.nn.gelu(z, approximate=True), a1)
    da1 = gelu_vjp(dhid)[0]
    dh2 = act_wT(da1, w1)
    dw1 = dw(h2, da1)
    db1 = jnp.sum(da1, axis=(0, 1))
    dmod4 = jnp.sum(dh2 * u2, axis=1)
    dmod3 = jnp.sum(dh2, axis=1)
    du2 = dh2 * (1.0 + m(4))
    dx1 = g + ln_bwd(du2, u2, inv2)
    dattn = dx1 * m(2)
    dmod2 = jnp.sum(dx1 * attn, axis=1)
    dctx = act_wT(dattn, wout)
    dwout = dw(ctx, dattn)
    dbout = jnp.sum(dattn, axis=(0, 1))

    # attention backward, batched (B, H, N, D): p re-derived from saved qkv
    def heads(z, off):
        return jnp.transpose(
            z[..., off * hdim:(off + 1) * hdim].reshape(b, n, h_tot, d),
            (0, 2, 1, 3))

    q, k, v = heads(qkv, 0), heads(qkv, 1), heads(qkv, 2)
    mmh = lambda a, w, dims: jax.lax.dot_general(
        a.astype(mm_dtype), w.astype(mm_dtype),
        (dims, ((0, 1), (0, 1))), preferred_element_type=jnp.float32)
    s = mmh(q, k, ((3,), (3,))) * scale               # (B, Hh, N, N)
    if mask is not None:
        s = jnp.where(mask[None, None], s, _NEG_INF)
    smax = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - smax)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(l == 0.0, 1.0, l)
    gh = jnp.transpose(dctx.reshape(b, n, h_tot, d), (0, 2, 1, 3))
    dv = mmh(p, gh, ((2,), (2,)))                     # (B, Hh, N, D)
    dp = mmh(gh, v, ((3,), (3,)))                     # (B, Hh, N, N)
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) * scale
    dq = mmh(ds, k, ((3,), (2,)))
    dk = mmh(ds, q, ((2,), (2,)))
    merge = lambda z: jnp.transpose(z, (0, 2, 1, 3)).reshape(b, n, hdim)
    dqkv = jnp.concatenate([merge(dq), merge(dk), merge(dv)], axis=-1)

    dh = act_wT(dqkv, wqkv)
    dwqkv = dw(h, dqkv)
    dbqkv = jnp.sum(dqkv, axis=(0, 1))
    dmod1 = jnp.sum(dh * u, axis=1)
    dmod0 = jnp.sum(dh, axis=1)
    du = dh * (1.0 + m(1))
    dx = dx1 + ln_bwd(du, u, inv1)
    dmod = jnp.stack([dmod0, dmod1, dmod2, dmod3, dmod4, dmod5],
                     axis=1).astype(mod6.dtype)
    return (dx, dmod, dwqkv, dbqkv, dwout, dbout, dw1, db1, dw2, db2)


def _blocks_bwd(dx, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask,
                num_heads, scale, xs_list=None, saved=None, bwd="pallas"):
    """Shared reversed per-block backward over a block stack. Exactly one
    of ``saved`` (train-kernel residual tuple -> residual-consuming
    kernels) or ``xs_list`` (recomputed block inputs -> recompute kernels)
    must be given; with ``saved``, ``bwd="xla"`` selects the composed-XLA
    residual backward (batched dW matmuls) over the Pallas one.
    Returns (dx0, dmods (B, L, 6, H), [8 stacked w-grads])."""
    depth = wqkv.shape[0]
    dmods = [None] * depth
    dws = [[None] * depth for _ in range(8)]
    for li in reversed(range(depth)):
        if saved is not None:
            xs, qkvs, ctxs, a1s, ys = saved
            bwd_fn = (_block_bwd_res_xla if bwd == "xla"
                      else fused_dit_block_bwd_res)
            grads = bwd_fn(
                xs[:, li], qkvs[:, li], ctxs[:, li],
                a1s[:, li] if a1s is not None else None, ys[:, li],
                mods[:, li], wqkv[li], wout[li], bout[li], w1[li], b1[li],
                w2[li], dx, mask, num_heads, scale,
            )
        else:
            grads = fused_dit_block_bwd(
                xs_list[li], mods[:, li], wqkv[li], bqkv[li], wout[li],
                bout[li], w1[li], b1[li], w2[li], b2[li], dx, mask,
                num_heads, scale,
            )
        dx, dmods[li] = grads[0], grads[1]
        for wi in range(8):
            dws[wi][li] = grads[2 + wi]
    return dx, jnp.stack(dmods, axis=1), [jnp.stack(dw) for dw in dws]


def _stack_fwd_train(x, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask,
                     num_heads, scale, group=1, bwd="pallas"):
    """vjp-fwd of the block stack: run the TRAIN kernel (residual-saving,
    always ungrouped — the grouped grid only matters for tiny-subnet
    sampling) when the residual windows fit VMEM; fall back to the
    residual-free forward + recompute backward otherwise."""
    b, n, hdim = x.shape
    depth = wqkv.shape[0]
    d = hdim // num_heads
    fdim = w1.shape[-1]
    mm_dtype = jnp.float32 if _interpret() else jnp.bfloat16
    res = (x, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask)
    base = stack_vmem_estimate(n, hdim, fdim, depth, num_heads, 1)
    save_a1, rbytes = _fit_residuals(base, n, hdim, fdim, depth, mm_dtype)
    if (mask is not None and mask.ndim != 2) or rbytes is None:
        out, _ = _stack_fwd(x, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
                            mask, num_heads, scale, group)
        return out, (res, None)

    head_scale = d**-0.5 if scale is None else scale
    vmem = min(128 * 1024 * 1024,
               max(64 * 1024 * 1024, int(1.3 * (base + 2 * rbytes))))
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    row = lambda *tail: pl.BlockSpec((1,) + tail, lambda i: (i,) + (0,) * len(tail))
    wargs = [wqkv.astype(mm_dtype), bqkv, wout.astype(mm_dtype), bout,
             w1.astype(mm_dtype), b1, w2.astype(mm_dtype), b2]
    wspecs = [const(depth, hdim, 3 * hdim), const(depth, 3 * hdim),
              const(depth, hdim, hdim), const(depth, hdim),
              const(depth, hdim, fdim), const(depth, fdim),
              const(depth, fdim, hdim), const(depth, hdim)]
    in_specs = [row(n, hdim), pl.BlockSpec((1, depth, 6, hdim),
                                           lambda i: (i, 0, 0, 0)), *wspecs]
    args = [x, mods, *wargs]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])
    out_specs, out_shape = _res_out_specs(
        [row(n, hdim)], [jax.ShapeDtypeStruct((b, n, hdim), x.dtype)],
        b, n, hdim, fdim, depth, mm_dtype, save_a1)
    kernel = functools.partial(
        _stack_train_kernel_masked if mask is not None else
        _stack_train_kernel,
        depth=depth, num_heads=num_heads, head_dim=d, scale=head_scale,
        mm_dtype=mm_dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*args)
    return outs[0], (res, _pack_saved(outs, save_a1))


def _stack_bwd(num_heads, scale, group, bwd, res, g):
    """Stack backward. With train-kernel residuals (the common case) every
    block runs the residual-consuming backward — the Pallas kernel, or
    with ``bwd="xla"`` the composed-XLA hybrid — zero forward recompute
    either way. The fallback recomputes each block's input with the
    per-block forward megakernel (L-1 extra forwards) and runs the
    recompute backward kernel. ``group`` only shapes the forward's grid;
    the backward is group-independent."""
    res, saved = res
    x, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask = res
    depth = wqkv.shape[0]

    xs_list = None
    if saved is None:
        def block_ws(li):
            return (wqkv[li], bqkv[li], wout[li], bout[li], w1[li], b1[li],
                    w2[li], b2[li])

        xs_list = [x]
        for li in range(depth - 1):
            xs_list.append(fused_dit_block(xs_list[-1], mods[:, li],
                                           *block_ws(li), mask, num_heads,
                                           scale))

    dx, dmods, dws = _blocks_bwd(
        g, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask, num_heads,
        scale, xs_list=xs_list, saved=saved, bwd=bwd,
    )
    return (dx, dmods, *dws, None)


fused_dit_stack.defvjp(_stack_fwd_train, _stack_bwd)


def _bwd_kernel_masked(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                       w1_ref, b1_ref, w2_ref, b2_ref, g_ref, mask_ref,
                       dx_ref, dmod_ref, dwqkv_ref, dbqkv_ref, dwout_ref,
                       dbout_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                       num_heads, head_dim, scale, mm_dtype):
    """Backward megakernel: recomputes the forward's intermediates per batch
    cell in VMEM (flash-attention style), then backpropagates the whole
    block — attention included — emitting per-cell dx/dmod and accumulating
    the weight/bias grads across the sequential grid into constant-indexed
    outputs (zero-initialized at cell 0)."""

    def mm(a, w, dims=((1,), (0,))):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref, dw1_ref,
                    db1_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[0].astype(jnp.float32)  # (N, H)
    mod = mod_ref[0].astype(jnp.float32)  # (6, H)
    g = g_ref[0].astype(jnp.float32)  # (N, H)
    h_tot, d = num_heads, head_dim

    def ln_fwd(z):
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + _LN_EPS)
        return (z - mu) * inv, inv

    def ln_bwd(du, u, inv):
        # VJP of u = (z - mean(z)) * rsqrt(var(z) + eps) without affine
        return inv * (
            du - jnp.mean(du, axis=-1, keepdims=True)
            - u * jnp.mean(du * u, axis=-1, keepdims=True)
        )

    # ---- forward recompute ------------------------------------------------
    u, inv1 = ln_fwd(x)
    h = u * (1.0 + mod[1:2]) + mod[0:1]
    qkv = mm(h, wqkv_ref[...]) + bqkv_ref[...][None, :]
    ps, ctxs = [], []
    for hi in range(h_tot):
        q = qkv[:, hi * d:(hi + 1) * d]
        k = qkv[:, (h_tot + hi) * d:(h_tot + hi + 1) * d]
        v = qkv[:, (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d]
        s = mm(q, k, ((1,), (1,))) * scale
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / jnp.where(l == 0.0, 1.0, l)
        ps.append(p)
        ctxs.append(mm(p, v))
    ctx = jnp.concatenate(ctxs, axis=-1)
    attn = mm(ctx, wout_ref[...]) + bout_ref[...][None, :]
    x1 = x + mod[2:3] * attn
    u2, inv2 = ln_fwd(x1)
    h2 = u2 * (1.0 + mod[4:5]) + mod[3:4]
    a1 = mm(h2, w1_ref[...]) + b1_ref[...][None, :]
    hid = jax.nn.gelu(a1, approximate=True)
    y = mm(hid, w2_ref[...]) + b2_ref[...][None, :]

    # ---- backward ---------------------------------------------------------
    # out = x1 + mod5 * y
    dy = g * mod[5:6]
    dmod5 = jnp.sum(g * y, axis=0)
    # y = hid @ w2 + b2
    dhid = mm(dy, w2_ref[...], ((1,), (1,)))
    dw2_ref[...] += mm(hid, dy, ((0,), (0,)))
    db2_ref[...] += jnp.sum(dy, axis=0)
    # hid = gelu(a1)
    _, gelu_vjp = jax.vjp(lambda z: jax.nn.gelu(z, approximate=True), a1)
    da1 = gelu_vjp(dhid)[0]
    # a1 = h2 @ w1 + b1
    dh2 = mm(da1, w1_ref[...], ((1,), (1,)))
    dw1_ref[...] += mm(h2, da1, ((0,), (0,)))
    db1_ref[...] += jnp.sum(da1, axis=0)
    # h2 = u2 * (1 + mod4) + mod3
    dmod4 = jnp.sum(dh2 * u2, axis=0)
    dmod3 = jnp.sum(dh2, axis=0)
    du2 = dh2 * (1.0 + mod[4:5])
    dx1 = g + ln_bwd(du2, u2, inv2)
    # x1 = x + mod2 * attn
    dattn = dx1 * mod[2:3]
    dmod2 = jnp.sum(dx1 * attn, axis=0)
    # attn = ctx @ wout + bout
    dctx = mm(dattn, wout_ref[...], ((1,), (1,)))
    dwout_ref[...] += mm(ctx, dattn, ((0,), (0,)))
    dbout_ref[...] += jnp.sum(dattn, axis=0)
    # attention per head
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for hi in range(h_tot):
        q = qkv[:, hi * d:(hi + 1) * d]
        k = qkv[:, (h_tot + hi) * d:(h_tot + hi + 1) * d]
        v = qkv[:, (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d]
        p = ps[hi]
        gh = dctx[:, hi * d:(hi + 1) * d]
        dv = mm(p, gh, ((0,), (0,)))
        dp = mm(gh, v, ((1,), (1,)))
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))) * scale
        dqkv_parts_q.append(mm(ds, k, ((1,), (0,))))
        dqkv_parts_k.append(mm(ds, q, ((0,), (0,))))
        dqkv_parts_v.append(dv)
    dqkv = jnp.concatenate(dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=-1)
    # qkv = h @ wqkv + bqkv
    dh = mm(dqkv, wqkv_ref[...], ((1,), (1,)))
    dwqkv_ref[...] += mm(h, dqkv, ((0,), (0,)))
    dbqkv_ref[...] += jnp.sum(dqkv, axis=0)
    # h = u * (1 + mod1) + mod0
    dmod1 = jnp.sum(dh * u, axis=0)
    dmod0 = jnp.sum(dh, axis=0)
    du = dh * (1.0 + mod[1:2])
    dx = dx1 + ln_bwd(du, u, inv1)

    dx_ref[0] = dx.astype(dx_ref.dtype)
    dmod_ref[0] = jnp.stack(
        [dmod0, dmod1, dmod2, dmod3, dmod4, dmod5], axis=0
    ).astype(dmod_ref.dtype)


def _bwd_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, g_ref, *out_refs, **kw):
    _bwd_kernel_masked(
        x_ref, mod_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
        w1_ref, b1_ref, w2_ref, b2_ref, g_ref, None, *out_refs, **kw
    )


def fused_dit_block_bwd(x, mod6, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
                        g, mask, num_heads, scale):
    """Gradient of the DiT block wrt every input, as one Pallas kernel.

    Returns (dx, dmod6, dwqkv, dbqkv, dwout, dbout, dw1, db1, dw2, db2).
    """
    b, n, hdim = x.shape
    d = hdim // num_heads
    fdim = w1.shape[1]

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    in_specs = [
        pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 6, hdim), lambda i: (i, 0, 0)),
        const(hdim, 3 * hdim), const(3 * hdim,),
        const(hdim, hdim), const(hdim,),
        const(hdim, fdim), const(fdim,),
        const(fdim, hdim), const(hdim,),
        pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
    ]
    args = [x, mod6, wqkv, bqkv, wout, bout, w1, b1, w2, b2, g]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    out_specs = [
        pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 6, hdim), lambda i: (i, 0, 0)),
        const(hdim, 3 * hdim), const(3 * hdim,),
        const(hdim, hdim), const(hdim,),
        const(hdim, fdim), const(fdim,),
        const(fdim, hdim), const(hdim,),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, hdim), x.dtype),
        jax.ShapeDtypeStruct((b, 6, hdim), mod6.dtype),
        jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
        jax.ShapeDtypeStruct(bqkv.shape, jnp.float32),
        jax.ShapeDtypeStruct(wout.shape, jnp.float32),
        jax.ShapeDtypeStruct(bout.shape, jnp.float32),
        jax.ShapeDtypeStruct(w1.shape, jnp.float32),
        jax.ShapeDtypeStruct(b1.shape, jnp.float32),
        jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        jax.ShapeDtypeStruct(b2.shape, jnp.float32),
    ]
    kernel = functools.partial(
        _bwd_kernel_masked if mask is not None else _bwd_kernel,
        num_heads=num_heads,
        head_dim=d,
        scale=d**-0.5 if scale is None else scale,
        mm_dtype=jnp.float32 if _interpret() else jnp.bfloat16,
    )
    wbytes = 4 * (hdim * 3 * hdim + hdim * hdim + 2 * hdim * fdim)
    panels = 4 * n * (4 * hdim + 2 * 3 * hdim + 2 * fdim) * 2
    scores = 4 * n * n * (2 + num_heads)  # per-head p kept + live s/dp blocks
    vmem = min(128 * 1024 * 1024,
               max(64 * 1024 * 1024, 3 * wbytes + panels + scores))
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # weight-grad accumulation requires strictly sequential cells
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*args)
    dx, dmod, dwqkv, dbqkv, dwout, dbout, dw1, db1, dw2, db2 = outs
    cast = lambda gr, ref: gr.astype(ref.dtype)
    return (dx, dmod, cast(dwqkv, wqkv), cast(dbqkv, bqkv), cast(dwout, wout),
            cast(dbout, bout), cast(dw1, w1), cast(db1, b1), cast(dw2, w2),
            cast(db2, b2))


def _vit_kernel_masked(tok_ref, pos_ref, mods_ref, fmod_ref, wemb_ref,
                       bemb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                       w1_ref, b1_ref, w2_ref, b2_ref, wfin_ref, bfin_ref,
                       mask_ref, o_ref, *, depth, num_heads, head_dim, scale,
                       mm_dtype):
    """The whole ViT forward on one VMEM-resident panel: patch embedding +
    positional add, all blocks, and the FinalLayer (LN + adaLN modulate +
    zero-init projection). Per eval, HBM sees one read of the (N, P)
    tokens and one write of the (N, OUT) prediction — nothing else."""

    def mm(a, w, dims=((1,), (0,))):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    tok = tok_ref[0].astype(jnp.float32)  # (N, P)
    x = mm(tok, wemb_ref[...]) + bemb_ref[...][None, :].astype(jnp.float32)
    x = x + pos_ref[...].astype(jnp.float32)
    mask = mask_ref[0] if mask_ref is not None else None
    for li in range(depth):
        x = _block_body(
            x, mods_ref[0, li].astype(jnp.float32),
            wqkv_ref[li], bqkv_ref[li], wout_ref[li], bout_ref[li],
            w1_ref[li], b1_ref[li], w2_ref[li], b2_ref[li], mask,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            mm_dtype=mm_dtype,
        )
    fm = fmod_ref[0].astype(jnp.float32)  # (2, H)
    u = _ln(x) * (1.0 + fm[1:2]) + fm[0:1]
    out = mm(u, wfin_ref[...]) + bfin_ref[...][None, :].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _vit_kernel(tok_ref, pos_ref, mods_ref, fmod_ref, wemb_ref, bemb_ref,
                wqkv_ref, bqkv_ref, wout_ref, bout_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, wfin_ref, bfin_ref, o_ref, **kw):
    _vit_kernel_masked(
        tok_ref, pos_ref, mods_ref, fmod_ref, wemb_ref, bemb_ref,
        wqkv_ref, bqkv_ref, wout_ref, bout_ref, w1_ref, b1_ref, w2_ref,
        b2_ref, wfin_ref, bfin_ref, None, o_ref, **kw
    )


def _vit_kernel_g(tok_ref, pos_ref, mods_ref, fmod_ref, wemb_ref,
                  bemb_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, wfin_ref, bfin_ref,
                  mask_ref, o_ref, *, depth, num_heads, head_dim,
                  scale, mm_dtype, n_tok):
    """Grouped whole-ViT kernel: embedding + all blocks + FinalLayer on one
    FLAT (G*N, P) token panel of G batch elements (see :func:`_block_body_g`
    for the 2-D-only layout rationale). ``pos_ref`` arrives pre-tiled to
    (G*N, H); ``mask_ref`` is the (G*N, G*N) block-diagonal mask."""

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    gn = tok_ref.shape[0]
    oh = _onehot_rows(gn, gn // n_tok, n_tok)
    tok = tok_ref[...].astype(jnp.float32)  # (G*N, P)
    x = mm(tok, wemb_ref[...]) + bemb_ref[...][None, :].astype(jnp.float32)
    x = x + pos_ref[...].astype(jnp.float32)
    mask = mask_ref[...]
    for li in range(depth):
        x = _block_body_g(
            x, mods_ref[:, li].astype(jnp.float32), oh,
            wqkv_ref[li], bqkv_ref[li], wout_ref[li], bout_ref[li],
            w1_ref[li], b1_ref[li], w2_ref[li], b2_ref[li], mask,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            mm_dtype=mm_dtype,
        )
    fm = fmod_ref[...].astype(jnp.float32)  # (G, 2, H)
    u = _ln(x) * (1.0 + _mod_bcast(oh, fm, 1)) + _mod_bcast(oh, fm, 0)
    out = mm(u, wfin_ref[...]) + bfin_ref[...][None, :].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20))
def fused_vit_forward(tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv, wout,
                      bout, w1, b1, w2, b2, wfin, bfin, mask, num_heads,
                      scale, group=1, bwd="pallas"):
    """Whole-ViT sampler forward as ONE Pallas kernel per batch element.

    tokens (B, N, P); pos (N, H); mods (B, L, 6, H); fmod (B, 2, H)
    [shift, scale]; wemb (P, H); block weights stacked (L, ...); wfin
    (H, OUT). Returns (B, N, OUT). The backward is the VJP of the
    composed jnp reference — this is the SAMPLING path, gradients through
    it are a correctness fallback, not a hot path.

    ``group`` > 1 processes G batch elements per grid cell (the
    fused_energy_decoder trick): panel matmuls see G*N rows, which is what
    makes small-subnet shapes (cINN ViT1D: N=135, H=192) reach the MXU."""
    out, _ = _vit_fwd(tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv,
                      wout, bout, w1, b1, w2, b2, wfin, bfin, mask,
                      num_heads, scale, group)
    return out


def _vit_fwd(tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv, wout, bout,
             w1, b1, w2, b2, wfin, bfin, mask, num_heads, scale, group=1):
    b, n, pdim = tokens.shape
    hdim = wemb.shape[1]
    depth = wqkv.shape[0]
    d = hdim // num_heads
    fdim = w1.shape[-1]
    out_dim = wfin.shape[1]
    mm_dtype = jnp.float32 if _interpret() else jnp.bfloat16
    g = _safe_group(group, n)
    res = (tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv, wout,
           bout, w1, b1, w2, b2, wfin, bfin, mask)
    if mask is not None and mask.ndim != 2:
        raise ValueError("fused_vit_forward supports a shared (N, N) mask")
    head_scale = d**-0.5 if scale is None else scale
    vmem = min(
        128 * 1024 * 1024,
        max(64 * 1024 * 1024,
            int(1.3 * (stack_vmem_estimate(n, hdim, fdim, depth, num_heads, g)
                       + 2 * (pdim * hdim + hdim * out_dim)
                       + g * 4 * n * (hdim + pdim + out_dim)))),
    )
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    wargs = [wemb.astype(mm_dtype), bemb,
             wqkv.astype(mm_dtype), bqkv, wout.astype(mm_dtype), bout,
             w1.astype(mm_dtype), b1, w2.astype(mm_dtype), b2,
             wfin.astype(mm_dtype), bfin]
    wspecs = [const(pdim, hdim), const(hdim,),
              const(depth, hdim, 3 * hdim), const(depth, 3 * hdim),
              const(depth, hdim, hdim), const(depth, hdim),
              const(depth, hdim, fdim), const(depth, fdim),
              const(depth, fdim, hdim), const(depth, hdim),
              const(hdim, out_dim), const(out_dim,)]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel",), vmem_limit_bytes=vmem,
    )

    if g > 1:
        # flat grouped panel + block-diag mask (see _block_body_g)
        (tokp, modsp, fmodp), bp = _pad_batch([tokens, mods, fmod], b, g)
        gn = g * n
        out = pl.pallas_call(
            functools.partial(
                _vit_kernel_g, depth=depth, num_heads=num_heads,
                head_dim=d, scale=head_scale, mm_dtype=mm_dtype, n_tok=n,
            ),
            grid=(bp // g,),
            in_specs=[pl.BlockSpec((gn, pdim), lambda i: (i, 0)),
                      const(gn, hdim),
                      pl.BlockSpec((g, depth, 6, hdim),
                                   lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec((g, 2, hdim), lambda i: (i, 0, 0)),
                      *wspecs, const(gn, gn)],
            out_specs=pl.BlockSpec((gn, out_dim), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((bp * n, out_dim), tokens.dtype),
            compiler_params=cparams,
            interpret=_interpret(),
        )(tokp.reshape(bp * n, pdim), jnp.tile(pos.astype(jnp.float32), (g, 1)),
          modsp, fmodp, *wargs, _grouped_mask(mask, n, g))
        return out.reshape(bp, n, out_dim)[:b], res

    in_specs = [
        pl.BlockSpec((1, n, pdim), lambda i: (i, 0, 0)),
        const(n, hdim),
        pl.BlockSpec((1, depth, 6, hdim), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, 2, hdim), lambda i: (i, 0, 0)),
        *wspecs,
    ]
    args = [tokens, pos, mods, fmod, *wargs]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    kernel = functools.partial(
        _vit_kernel_masked if mask is not None else _vit_kernel,
        depth=depth,
        num_heads=num_heads,
        head_dim=d,
        scale=head_scale,
        mm_dtype=mm_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, out_dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, out_dim), tokens.dtype),
        compiler_params=cparams,
        interpret=_interpret(),
    )(*args)
    return out, res


def vit_forward_reference(tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv,
                          wout, bout, w1, b1, w2, b2, wfin, bfin, mask,
                          num_heads, scale):
    """Composed jnp equivalent of the whole-ViT kernel (test oracle + the
    kernel's backward)."""
    x = tokens.astype(jnp.float32) @ wemb + bemb + pos
    for li in range(wqkv.shape[0]):
        x = dit_block_reference(
            x, mods[:, li], wqkv[li], bqkv[li], wout[li], bout[li],
            w1[li], b1[li], w2[li], b2[li], mask, num_heads, scale,
        )
    fm = fmod.astype(jnp.float32)
    u = _ln(x) * (1.0 + fm[:, 1:2]) + fm[:, 0:1]
    return u @ wfin + bfin


def _vit_fwd_train(tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv, wout,
                   bout, w1, b1, w2, b2, wfin, bfin, mask, num_heads, scale,
                   group=1, bwd="pallas"):
    """vjp-fwd of the whole-ViT kernel: run the TRAIN kernel
    (residual-saving, always ungrouped) when the residual windows fit
    VMEM; fall back to the residual-free forward + recompute backward
    otherwise. The sampling primal (``fused_vit_forward`` called without
    differentiation) never takes this path."""
    b, n, pdim = tokens.shape
    hdim = wemb.shape[1]
    depth = wqkv.shape[0]
    d = hdim // num_heads
    fdim = w1.shape[-1]
    out_dim = wfin.shape[1]
    mm_dtype = jnp.float32 if _interpret() else jnp.bfloat16
    res = (tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv, wout,
           bout, w1, b1, w2, b2, wfin, bfin, mask)
    base = (stack_vmem_estimate(n, hdim, fdim, depth, num_heads, 1)
            + 2 * (pdim * hdim + hdim * out_dim)
            + 4 * n * (hdim + pdim + out_dim))
    save_a1, rbytes = _fit_residuals(base, n, hdim, fdim, depth, mm_dtype)
    if (mask is not None and mask.ndim != 2) or rbytes is None:
        out, _ = _vit_fwd(tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv,
                          wout, bout, w1, b1, w2, b2, wfin, bfin, mask,
                          num_heads, scale, group)
        return out, (res, None)

    head_scale = d**-0.5 if scale is None else scale
    vmem = min(128 * 1024 * 1024,
               max(64 * 1024 * 1024, int(1.3 * (base + 2 * rbytes))))
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    row = lambda *tail: pl.BlockSpec((1,) + tail, lambda i: (i,) + (0,) * len(tail))
    wargs = [wemb.astype(mm_dtype), bemb,
             wqkv.astype(mm_dtype), bqkv, wout.astype(mm_dtype), bout,
             w1.astype(mm_dtype), b1, w2.astype(mm_dtype), b2,
             wfin.astype(mm_dtype), bfin]
    wspecs = [const(pdim, hdim), const(hdim,),
              const(depth, hdim, 3 * hdim), const(depth, 3 * hdim),
              const(depth, hdim, hdim), const(depth, hdim),
              const(depth, hdim, fdim), const(depth, fdim),
              const(depth, fdim, hdim), const(depth, hdim),
              const(hdim, out_dim), const(out_dim,)]
    in_specs = [row(n, pdim), const(n, hdim),
                pl.BlockSpec((1, depth, 6, hdim), lambda i: (i, 0, 0, 0)),
                row(2, hdim), *wspecs]
    args = [tokens, pos, mods, fmod, *wargs]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])
    out_specs, out_shape = _res_out_specs(
        [row(n, out_dim)],
        [jax.ShapeDtypeStruct((b, n, out_dim), tokens.dtype)],
        b, n, hdim, fdim, depth, mm_dtype, save_a1)
    kernel = functools.partial(
        _vit_train_kernel_masked if mask is not None else _vit_train_kernel,
        depth=depth, num_heads=num_heads, head_dim=d, scale=head_scale,
        mm_dtype=mm_dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*args)
    return outs[0], (res, _pack_saved(outs, save_a1))


def _vit_bwd(num_heads, scale, group, bwd, res, g):
    """Kernel-path backward: jnp VJPs for the (tiny) embedder and final
    layer, and per-block backward megakernels in reverse — the block math
    (the FLOPs) never touches the composed path. With train-kernel
    residuals (the common case) the blocks run the residual-consuming
    kernel with zero forward recompute; the fallback recomputes block
    inputs with per-block forward megakernels first. ``group`` only
    shapes the forward's grid; the backward is group-independent."""
    res, saved = res
    (tokens, pos, mods, fmod, wemb, bemb, wqkv, bqkv, wout, bout, w1, b1,
     w2, b2, wfin, bfin, mask) = res
    depth = wqkv.shape[0]

    def embed(tokens, wemb, bemb, pos):
        return tokens.astype(jnp.float32) @ wemb + bemb + pos

    xs_list = None
    if saved is None:
        def block_ws(li):
            return (wqkv[li], bqkv[li], wout[li], bout[li], w1[li], b1[li],
                    w2[li], b2[li])

        x0, embed_vjp = jax.vjp(embed, tokens, wemb, bemb, pos)
        xs_list = [x0]
        for li in range(depth):
            xs_list.append(fused_dit_block(xs_list[-1], mods[:, li],
                                           *block_ws(li), mask, num_heads,
                                           scale))
        x_last = xs_list[depth]
    else:
        _, embed_vjp = jax.vjp(embed, tokens, wemb, bemb, pos)
        x_last = saved[0][:, depth].astype(jnp.float32)

    def final(xl, fmod, wfin, bfin):
        fm = fmod.astype(jnp.float32)
        u = _ln(xl) * (1.0 + fm[:, 1:2]) + fm[:, 0:1]
        return u @ wfin + bfin

    _, final_vjp = jax.vjp(final, x_last, fmod, wfin, bfin)
    dx, dfmod, dwfin, dbfin = final_vjp(g)

    dx, dmods, dws = _blocks_bwd(
        dx, mods, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask, num_heads,
        scale, xs_list=xs_list, saved=saved, bwd=bwd,
    )
    dtokens, dwemb, dbemb, dpos = embed_vjp(dx)
    return (dtokens, dpos, dmods, dfmod, dwemb, dbemb,
            *dws, dwfin, dbfin, None)


fused_vit_forward.defvjp(_vit_fwd_train, _vit_bwd)


def dit_block_reference(x, mod6, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
                        mask, num_heads, scale):
    """Composed reference with identical math; attention rides the fused
    qkv kernel. The test oracle for the forward and backward megakernels
    (tests/test_attention.py)."""
    from vit4hep_tpu.ops.fused_qkv_attention import fused_qkv_attention

    x = x.astype(jnp.float32)
    mod = mod6.astype(jnp.float32)
    h = _ln(x) * (1.0 + mod[:, 1:2]) + mod[:, 0:1]
    qkv = h @ wqkv + bqkv
    ctx = fused_qkv_attention(qkv, num_heads, mask, scale)
    x1 = x + mod[:, 2:3] * (ctx @ wout + bout)
    h2 = _ln(x1) * (1.0 + mod[:, 4:5]) + mod[:, 3:4]
    y = jax.nn.gelu(h2 @ w1 + b1, approximate=True) @ w2 + b2
    return x1 + mod[:, 5:6] * y


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_dit_block(x, mod6, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
                    mask, num_heads, scale):
    """One-kernel adaLN-Zero DiT block. See module docstring for shapes."""
    out, _ = _block_fwd(x, mod6, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
                        mask, num_heads, scale)
    return out


def _block_fwd(x, mod6, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask,
               num_heads, scale):
    b, n, hdim = x.shape
    d = hdim // num_heads
    fdim = w1.shape[1]

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    in_specs = [
        pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, 6, hdim), lambda i: (i, 0, 0)),
        const(hdim, 3 * hdim), const(3 * hdim,),
        const(hdim, hdim), const(hdim,),
        const(hdim, fdim), const(fdim,),
        const(fdim, hdim), const(hdim,),
    ]
    args = [x, mod6, wqkv, bqkv, wout, bout, w1, b1, w2, b2]
    if mask is not None:
        if mask.ndim != 2:
            raise ValueError("fused_dit_block supports a shared (N, N) mask")
        in_specs.append(pl.BlockSpec((1, n, n), lambda i: (0, 0, 0)))
        args.append(mask[None])

    kernel = functools.partial(
        _block_kernel_masked if mask is not None else _block_kernel,
        num_heads=num_heads,
        head_dim=d,
        scale=d**-0.5 if scale is None else scale,
        mm_dtype=jnp.float32 if _interpret() else jnp.bfloat16,
    )
    # VMEM budget: f32 weights + their bf16 casts (~1.5x), double-buffered
    # x/mod/out panels, the (N, 3H) qkv + (N, F) MLP hidden (+bf16 casts),
    # and the attention live set — one head's f32 score blocks on the
    # per-head path; (H*N, N) scores + (H*N, hdim) qt/qbd/merge panels on
    # the head-packed path (d <= 64, see _attn_merged).
    wbytes = 4 * (hdim * 3 * hdim + hdim * hdim + 2 * hdim * fdim)
    panels = 4 * n * (2 * hdim + 3 * hdim + fdim) * 2
    if d <= 64:
        scores = 12 * n * n * num_heads + 14 * num_heads * n * hdim
    else:
        scores = 12 * n * n
    vmem = min(128 * 1024 * 1024,
               max(48 * 1024 * 1024, 2 * wbytes + panels + scores))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hdim), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem,
        ),
        interpret=_interpret(),
    )(*args)
    return out, (x, mod6, wqkv, bqkv, wout, bout, w1, b1, w2, b2, mask)


def _block_bwd(num_heads, scale, res, g):
    *diff_args, mask = res
    grads = fused_dit_block_bwd(*diff_args, g, mask, num_heads, scale)
    return grads + (None,)


fused_dit_block.defvjp(_block_fwd, _block_bwd)
