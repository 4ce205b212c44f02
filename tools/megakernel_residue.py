"""Itemize the DiT megakernel's MFU residue per in-kernel segment.

VERDICT r3 weak #4: ds2/ds3 sampling sit at ~62% MFU and the lane-pad head
sweep bounded only ~5 points of the 38% residue; the rest was attributed to
"qkv/MLP panel geometry plus in-kernel elementwise work" without numbers.
This tool times each SEGMENT of the block body in the megakernel's own
layout: one Pallas kernel per segment, x panel + weights resident in VMEM,
the segment repeated R times in-kernel behind a data dependency (so
per-cell DMA and dispatch amortize to noise), grid over batch like the real
kernel. Segment times are compared against (a) the full _block_body kernel
timed the same way and (b) each segment's own MXU floor — turning the 38%
into a per-segment table (BASELINE.md round-4 campaign).

Segments (per block eval):
  qkv     (N, H) @ (H, 3H) panel matmul + bias
  scores  per-head q k^T + mask-free softmax (the (N, N) VPU work)
  pv      per-head p @ v + concat to (N, H)
  out     (N, H) @ (H, H) projection
  mlp1    (N, H) @ (H, F) + tanh-gelu
  mlp2    (N, F) @ (F, H)
  glue    2x LayerNorm + modulate + gated residuals (pure VPU/elementwise)

Run: python tools/megakernel_residue.py [ds2|ds3|both] (axon TPU; --smoke CPU)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit4hep_tpu.ops.pallas_utils import interpret as _interpret

V5E_MXU_TFLOPS = 197e12

R = 8          # in-kernel segment repeats
OUTER = 20     # kernel dispatches inside one jit (scan)


def _mm_factory(mm_dtype):
    def mm(a, w, dims=((1,), (0,))):
        return jax.lax.dot_general(
            a.astype(mm_dtype), w.astype(mm_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )
    return mm


def _ln(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6)


def _segment_bodies(num_heads, head_dim, scale, mm_dtype):
    """name -> fn(x, qkv_panel, hid_panel, ws) returning a same-shape-as-x
    update (the repeat loop folds it back with a tiny coefficient so the
    compiler cannot dead-code or hoist iterations)."""
    mm = _mm_factory(mm_dtype)
    h_tot, d = num_heads, head_dim

    def seg_qkv(x, qkv, hid, ws):
        o = mm(x, ws["wqkv"]) + ws["bqkv"][None, :]
        return o[:, :x.shape[1]]

    def seg_qk(x, qkv, hid, ws):
        outs = []
        for hi in range(h_tot):
            q = qkv[:, hi * d:(hi + 1) * d]
            k = qkv[:, (h_tot + hi) * d:(h_tot + hi + 1) * d]
            s = mm(q, k, ((1,), (1,))) * scale
            outs.append(s[:, :d])
        return jnp.concatenate(outs, axis=-1)

    def seg_scores(x, qkv, hid, ws):
        outs = []
        for hi in range(h_tot):
            q = qkv[:, hi * d:(hi + 1) * d]
            k = qkv[:, (h_tot + hi) * d:(h_tot + hi + 1) * d]
            s = mm(q, k, ((1,), (1,))) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            outs.append(p[:, :d] / jnp.where(l == 0.0, 1.0, l))
        return jnp.concatenate(outs, axis=-1)

    def seg_pv(x, qkv, hid, ws):
        # p must be (N, N): use the q k^T product as a stand-in prob matrix
        # (identical shape/layout; the timed op is the (N, N) @ (N, d) PV
        # matmul — the extra q k^T is subtracted out via the `qk` row)
        outs = []
        for hi in range(h_tot):
            q = qkv[:, hi * d:(hi + 1) * d]
            k = qkv[:, (h_tot + hi) * d:(h_tot + hi + 1) * d]
            p = mm(q, k, ((1,), (1,)))  # (N, N) stand-in for the prob matrix
            v = qkv[:, (2 * h_tot + hi) * d:(2 * h_tot + hi + 1) * d]
            outs.append(mm(p, v))
        return jnp.concatenate(outs, axis=-1)

    def seg_out(x, qkv, hid, ws):
        return mm(x, ws["wout"]) + ws["bout"][None, :]

    def seg_mlp1(x, qkv, hid, ws):
        o = jax.nn.gelu(mm(x, ws["w1"]) + ws["b1"][None, :], approximate=True)
        return o[:, :x.shape[1]]

    def seg_mlp2(x, qkv, hid, ws):
        return mm(hid, ws["w2"]) + ws["b2"][None, :]

    def seg_glue(x, qkv, hid, ws):
        mod = ws["mod"]
        h1 = _ln(x) * (1.0 + mod[1:2]) + mod[0:1]
        x1 = x + mod[2:3] * h1
        h2 = _ln(x1) * (1.0 + mod[4:5]) + mod[3:4]
        return x1 + mod[5:6] * h2

    return {
        "qkv": seg_qkv, "qk": seg_qk, "scores": seg_scores, "pv": seg_pv,
        "out": seg_out, "mlp1": seg_mlp1, "mlp2": seg_mlp2, "glue": seg_glue,
    }


def _seg_kernel(x_ref, qkv_ref, hid_ref, wqkv_ref, bqkv_ref, wout_ref,
                bout_ref, w1_ref, b1_ref, w2_ref, b2_ref, mod_ref, o_ref, *,
                seg, num_heads, head_dim, scale, mm_dtype):
    ws = dict(wqkv=wqkv_ref[...], bqkv=bqkv_ref[...].astype(jnp.float32),
              wout=wout_ref[...], bout=bout_ref[...].astype(jnp.float32),
              w1=w1_ref[...], b1=b1_ref[...].astype(jnp.float32),
              w2=w2_ref[...], b2=b2_ref[...].astype(jnp.float32),
              mod=mod_ref[0].astype(jnp.float32))
    body = _segment_bodies(num_heads, head_dim, scale, mm_dtype)[seg]
    x = x_ref[0].astype(jnp.float32)
    qkv = qkv_ref[0].astype(jnp.float32)
    hid = hid_ref[0].astype(jnp.float32)
    for _ in range(R):
        upd = body(x, qkv, hid, ws)
        x = x + 1e-6 * upd[:, :x.shape[1]]
        qkv = qkv + 1e-6 * jnp.concatenate([upd[:, :x.shape[1]]] * 3, -1)
        hid = hid + 1e-6 * jnp.concatenate(
            [upd[:, :x.shape[1]]] * (hid.shape[1] // x.shape[1]), -1)
    o_ref[0] = x.astype(o_ref.dtype)


def _full_kernel(x_ref, qkv_ref, hid_ref, wqkv_ref, bqkv_ref, wout_ref,
                 bout_ref, w1_ref, b1_ref, w2_ref, b2_ref, mod_ref, o_ref, *,
                 num_heads, head_dim, scale, mm_dtype):
    from vit4hep_tpu.ops.fused_dit_block import _block_body

    x = x_ref[0].astype(jnp.float32)
    for _ in range(R):
        x = _block_body(
            x, mod_ref[0].astype(jnp.float32), wqkv_ref[...], bqkv_ref[...],
            wout_ref[...], bout_ref[...], w1_ref[...], b1_ref[...],
            w2_ref[...], b2_ref[...], None,
            num_heads=num_heads, head_dim=head_dim, scale=scale,
            mm_dtype=mm_dtype,
        )
    o_ref[0] = x.astype(o_ref.dtype)


def _run(name, kernel_fn, b, n, hdim, fdim, args, vmem):
    prog = pl.pallas_call(
        kernel_fn,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, 3 * hdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, fdim), lambda i: (i, 0, 0)),
            pl.BlockSpec((hdim, 3 * hdim), lambda i: (0, 0)),
            pl.BlockSpec((3 * hdim,), lambda i: (0,)),
            pl.BlockSpec((hdim, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim,), lambda i: (0,)),
            pl.BlockSpec((hdim, fdim), lambda i: (0, 0)),
            pl.BlockSpec((fdim,), lambda i: (0,)),
            pl.BlockSpec((fdim, hdim), lambda i: (0, 0)),
            pl.BlockSpec((hdim,), lambda i: (0,)),
            pl.BlockSpec((1, 6, hdim), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, hdim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hdim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=vmem),
        interpret=_interpret(),
    )

    def scanned(*a):
        def body(x, _):
            return prog(x, *a[1:]), None
        x, _ = jax.lax.scan(body, a[0], None, length=OUTER)
        return x

    jitted = jax.jit(scanned)
    out = jitted(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = jitted(*args)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    return dt / (OUTER * R)  # seconds per segment-eval over the whole batch


def itemize(tag, n, hdim, fdim, heads, batch):
    d = hdim // heads
    scale = d ** -0.5
    mm_dtype = jnp.float32 if _interpret() else jnp.bfloat16
    rng = np.random.default_rng(0)
    f32 = np.float32
    x = jnp.asarray(rng.normal(size=(batch, n, hdim)) * 0.1, f32)
    qkv = jnp.asarray(rng.normal(size=(batch, n, 3 * hdim)) * 0.1, f32)
    hid = jnp.asarray(rng.normal(size=(batch, n, fdim)) * 0.1, f32)
    ws = [jnp.asarray(rng.normal(size=s) * 0.05, f32) for s in
          [(hdim, 3 * hdim), (3 * hdim,), (hdim, hdim), (hdim,),
           (hdim, fdim), (fdim,), (fdim, hdim), (hdim,)]]
    mod = jnp.asarray(rng.normal(size=(batch, 6, hdim)) * 0.1, f32)
    args = (x, qkv, hid, *[w.astype(mm_dtype) if w.ndim == 2 else w
                           for w in ws], mod)
    vmem = 100 * 1024 * 1024

    # per-segment MXU floors (FLOPs per eval over the batch)
    flops = {
        "qkv": 2 * batch * n * hdim * 3 * hdim,
        "qk": 2 * batch * n * n * hdim,
        "softmax": 0,
        "pv": 2 * batch * n * n * hdim,
        "out": 2 * batch * n * hdim * hdim,
        "mlp1": 2 * batch * n * hdim * fdim,
        "mlp2": 2 * batch * n * fdim * hdim,
        "glue": 0,
    }

    print(f"\n== {tag}: n={n} hdim={hdim} fdim={fdim} heads={heads} "
          f"batch={batch} (R={R}, OUTER={OUTER}) ==")
    raw = {}
    for seg in ("qkv", "qk", "scores", "pv", "out", "mlp1", "mlp2", "glue"):
        k = functools.partial(_seg_kernel, seg=seg, num_heads=heads,
                              head_dim=d, scale=scale, mm_dtype=mm_dtype)
        raw[seg] = _run(seg, k, batch, n, hdim, fdim, args, vmem)
    kf = functools.partial(_full_kernel, num_heads=heads, head_dim=d,
                           scale=scale, mm_dtype=mm_dtype)
    t_full = _run("full", kf, batch, n, hdim, fdim, args, vmem)

    # derived: the scores micro = qk + softmax; the pv micro = qk + pv
    rows = [
        ("qkv", raw["qkv"]),
        ("qk", raw["qk"]),
        ("softmax", max(0.0, raw["scores"] - raw["qk"])),
        ("pv", max(0.0, raw["pv"] - raw["qk"])),
        ("out", raw["out"]),
        ("mlp1", raw["mlp1"]),
        ("mlp2", raw["mlp2"]),
        ("glue", raw["glue"]),
    ]
    total_seg = sum(t for _, t in rows)
    print(f"{'segment':8s} {'ms/eval':>9s} {'share':>7s} {'seg MFU':>8s}")
    for seg, t in rows:
        fl = flops[seg]
        mfu = fl / t / V5E_MXU_TFLOPS * 100 if fl and t > 0 else 0.0
        print(f"{seg:8s} {t * 1e3:9.3f} {t / t_full * 100:6.1f}% {mfu:7.1f}%")
    fl_tot = sum(flops.values())
    print(f"{'SUM':8s} {total_seg * 1e3:9.3f} {total_seg / t_full * 100:6.1f}%")
    print(f"{'full':8s} {t_full * 1e3:9.3f} {100.0:6.1f}% "
          f"{fl_tot / t_full / V5E_MXU_TFLOPS * 100:7.1f}%")


def main():
    smoke = "--smoke" in sys.argv
    which = next((a for a in sys.argv[1:] if not a.startswith("--")), "both")
    global R, OUTER
    if smoke:
        R, OUTER = 2, 2
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}")
    if which in ("ds2", "both"):
        itemize("ds2", 135, 480, 1920, 6, 8 if smoke else 256)
    if which in ("ds3", "both"):
        itemize("ds3", 450, 480, 1920, 6, 4 if smoke else 64)


if __name__ == "__main__":
    main()
