"""Roofline the two flat stages: the energy CFM and the cINN sampler.

VERDICT round 2, next #4: energy (2494 u-vec/s) and cINN (91.9 showers/s)
have been flat for two rounds with no quantitative account of what fraction
of peak they represent. This tool applies the tools/roofline_ds3.py
methodology to both workloads (reference ``models/base_model.py:127-147``
sampling loop and ``nn/cfm/transformer_cfm.py:12-119`` energy net):

- measures, per jitted program (INNER iterations inside one jit so the
  ~28 ms/dispatch tunnel floor is <2%): the end-to-end stage rate, the
  per-net-eval time, and micro components (decoder stack alone, one ViT1D
  subnet forward, one coupling inverse, the RQS inverse alone),
- prints each next to analytic MXU / HBM / VPU floors derived from the
  shipped config constants (cfm_ds2_energy.yaml, cinn_ds2_electrons.yaml).

Both stages run small panels (energy d_model 128, cINN subnet hidden 192 —
at or below the 128-lane MXU tile), so the expected verdict is
HBM-round-trip/latency-bound with a low MXU ceiling from lane padding; the
numbers decide between "fuse the stack" (the energy decoder megakernel,
ops/fused_energy_decoder.py) and "document the floor and close the metric".

Run: python tools/roofline_small_stages.py [energy|cinn|both]
(axon TPU; CPU works for smoke-testing but floors are v5e-specific).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin overrides JAX_PLATFORMS from the environment;
    # re-assert it (same guard as main.py) so CPU smoke runs stay on CPU
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

V5E_MXU_TFLOPS = 197e12
V5E_HBM_BPS = 819e9
V5E_VPU_OPS = 6.16e12

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


def timed(fn, *args):
    """Seconds per INNER-iteration program (dispatch floor subtracted)."""
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    out = jitted(*args)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    return max(0.0, time.perf_counter() - t0 - _DISPATCH_FLOOR[0]) / INNER


def report(name, t, flop, byts, vops):
    mfu = flop / t / V5E_MXU_TFLOPS * 100 if t > 0 else float("inf")
    print(f"{name:22s} {t * 1e3:8.3f} ms | floors(ms): "
          f"MXU {flop / V5E_MXU_TFLOPS * 1e3:7.3f}  "
          f"HBM {byts / V5E_HBM_BPS * 1e3:7.3f}  "
          f"VPU {vops / V5E_VPU_OPS * 1e3:7.3f} | MFU {mfu:5.1f}%")


def _load(rel, patch=None):
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    raw = _load_yaml(os.path.join(_REPO, "configs", rel))
    if patch:
        patch(raw)
    return instantiate(raw)


def _scan_of(apply_fn, x0, *consts):
    def prog(x, *cs):
        def body(h, _):
            return apply_fn(h, *cs), None
        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h
    return prog, (x0, *consts)


# ---------------------------------------------------------------------------
def roofline_energy(batch=1024):
    """cfm_ds2_energy.yaml: 80 RK4 net evals over a 4-layer decoder at
    (B, 45, 64). Floors per net EVAL."""
    model = _load("model/cfm/cfm_ds2_energy.yaml")
    p = model.net.cfg
    # d_model, NOT dim_embedding: with embeds=true the decoder runs at
    # 2*dim_embedding (x-embed ++ condition-embed) — using 64 here once
    # understated every floor ~4x (round-3 review finding)
    n, d, f, L = p.dims_in, p.d_model, p.dim_feedforward, p.num_decoder_layers
    te = p.encode_t_dim
    f32 = 4

    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    c = jax.device_put(np.random.randn(batch, 1).astype(np.float32))
    x0 = jax.device_put(np.random.randn(batch, n).astype(np.float32))

    # ---- end-to-end stage rate ----
    smp = jax.jit(lambda pr, cc, k: jnp.sum(model.sample_batch(pr, cc, k)))
    float(smp(params, c, key))
    t0 = time.perf_counter()
    for i in range(3):
        float(smp(params, c, jax.random.fold_in(key, i)))
    rate = batch * 3 / (time.perf_counter() - t0)
    from vit4hep_tpu.ops.ode import grid_steps
    evals = 4 * grid_steps(model.ode_kwargs.get("step_size", 0.05))
    t_eval_e2e = batch / rate / evals
    print(f"energy stage: {rate:.1f} u-vec/s  ({evals} net evals/sample, "
          f"=> {t_eval_e2e * 1e3:.3f} ms/eval e2e)")

    # ---- per-eval measurement: scan of net forwards ----
    def net_eval(x, cc):
        t = jnp.full((x.shape[0], 1), 0.5)
        return model.net.apply(params, x, t, cc)

    def net_scan(x, cc):
        def body(h, _):
            v = net_eval(h, cc)
            return h + 1e-6 * v, None  # carry depends on the eval
        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    t_eval = timed(net_scan, x0, c)

    # ---- analytic floors per eval ----
    # MACs/element: L decoder layers (self-attn 4nd^2+2n^2d, cross ~2nd^2,
    # ff 2ndf) + head ((te+d)f + f)·n
    macs = batch * (L * (6 * n * d * d + 2 * n * n * d + 2 * n * d * f)
                    + n * (te + d) * f + n * f)
    flop = 2 * macs
    # composed-path HBM traffic: ~10 materialized activation panels per
    # layer (qkv, scores, ctx, proj, 3 LN, ff hidden x2, residuals)
    act = batch * n * d * f32
    sc = batch * p.nhead * n * n * f32
    ffh = batch * n * f * f32
    hbm_composed = L * (2 * (3 * act + 2 * sc + 4 * act + 2 * ffh + 3 * act)) \
        + 2 * (batch * n * (te + d) * f32 + ffh)
    # fused-kernel HBM traffic: x once in/out + weights per grid cell
    wbytes = L * (4 * d * d + 2 * d * f) * f32 + (te + d) * f * f32
    g = getattr(p, "fused_group", 16)
    hbm_fused = 2 * act + (batch // g) * wbytes + batch * (L + 1) * d * f32
    vops = batch * (L * (p.nhead * n * n * 6 + n * f) + n * f)  # softmax+relu

    report("energy eval (e2e)", t_eval_e2e, flop, hbm_composed, vops)
    report("energy eval (scan)", t_eval, flop, hbm_composed, vops)
    print(f"  fused-kernel HBM floor: {hbm_fused / V5E_HBM_BPS * 1e3:.3f} ms "
          f"(vs composed {hbm_composed / V5E_HBM_BPS * 1e3:.3f}) — "
          f"upper bound {'%.0f' % (rate * t_eval_e2e / max(hbm_fused / V5E_HBM_BPS, flop / (V5E_MXU_TFLOPS * 0.25)))}x "
          f"if HBM-bound (MXU term assumes 25% eff. from d_model-{d} "
          f"lane padding)")

    # ---- fused-kernel per-eval time (the decision number) ----
    import dataclasses
    net_f = type(model.net)(cfg=dataclasses.replace(p, fused_block=True))

    def net_scan_fused(x, cc):
        def body(h, _):
            t = jnp.full((h.shape[0], 1), 0.5)
            return h + 1e-6 * net_f.apply(params, h, t, cc), None
        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    t_eval_f = timed(net_scan_fused, x0, c)
    report("energy eval (fused)", t_eval_f, flop, hbm_fused, vops)


# ---------------------------------------------------------------------------
def roofline_cinn(batch=256):
    """cinn_ds2_electrons.yaml: 20 sequential [BinnedRQS coupling + permute]
    inverses, each coupling = 1 ViT1D subnet forward (depth 3, hidden 192,
    135 tokens) + RQS spline inverse."""
    model = _load("model/cinn/cinn_ds2_electrons.yaml")
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    c = jax.device_put(np.random.randn(batch, model.condition_dim)
                       .astype(np.float32) * 0.1)

    smp = jax.jit(lambda pr, cc, k: jnp.sum(model.sample_batch(pr, cc, k)))
    float(smp(params, c, key))
    t0 = time.perf_counter()
    for i in range(3):
        float(smp(params, c, jax.random.fold_in(key, i)))
    rate = batch * 3 / (time.perf_counter() - t0)
    nb = len(model.net.blocks) // 2  # coupling+permute pairs
    t_block_e2e = batch / rate / nb
    print(f"cinn stage: {rate:.1f} showers/s ({nb} coupling inverses/sample, "
          f"=> {t_block_e2e * 1e3:.3f} ms/coupling e2e)")

    # ---- one subnet forward, scanned ----
    from vit4hep_tpu.models.vit import ViT1D

    cb = next(b for b in model.net.blocks if hasattr(b, "subnet_ctor"))
    # rebuild the first coupling's subnet exactly as the flow does
    subnet = cb.subnet_ctor(cb.n_params)
    T_half = subnet.cfg.prod_num_patches
    P = subnet.cfg.patch_dim
    x_half = jax.device_put(
        np.random.randn(batch, T_half, P).astype(np.float32))
    cond = jax.device_put(
        np.random.randn(batch, model.condition_dim).astype(np.float32) * 0.1)
    sp = subnet.init(key, x_half, cond)

    def subnet_scan(x, cc):
        def body(h, _):
            o = subnet.apply(sp, h, cc)
            return h + 1e-6 * o[..., :P], None
        h, _ = jax.lax.scan(body, x, None, length=INNER)
        return h

    t_sub = timed(subnet_scan, x_half, cond)

    vk = subnet.cfg
    hdim, depth, heads = vk.hidden_dim, vk.depth, vk.num_heads
    n_tok = T_half
    f32 = 4
    macs = batch * depth * (6 * n_tok * hdim * hdim + 2 * n_tok * n_tok * hdim)
    flop = 2 * macs
    act = batch * n_tok * hdim * f32
    sc = batch * heads * n_tok * n_tok * f32
    ffh = batch * n_tok * 4 * hdim * f32
    hbm = depth * 2 * (4 * act + 2 * sc + 2 * ffh + 4 * act)
    vops = batch * depth * (heads * n_tok * n_tok * 6 + n_tok * 4 * hdim * 10)
    report("cinn subnet fwd", t_sub, flop, hbm, vops)
    # each two-sided coupling runs subnet1 and subnet2 SEQUENTIALLY
    # (bijectors.BinnedRQSCouplingBlock._run: y2 needs x1, y1 needs y2), so
    # the per-sample subnet count is 2*nb, not nb
    print(f"  {2 * nb} sequential subnets at this rate = "
          f"{batch / (2 * nb * t_sub):.1f} showers/s ceiling from subnets alone")

    # ---- block-level micros on the real (bound) flow ----
    # full coupling inverse and permute inverse, straight from the nets the
    # sampler actually runs (sample_net twin when shipped, composed otherwise)
    full_tokens = jax.device_put(
        np.random.randn(batch, 2 * T_half, P).astype(np.float32) * 0.5)

    def _block_scan(net, idx):
        def fn(pr, h0, cc):
            def body(h, _):
                o, _ld = net.bind(pr).blocks[idx].inverse(h, cc)
                return jnp.clip(h + 1e-3 * (o - h), -8.0, 8.0), None
            h, _ = jax.lax.scan(body, h0, None, length=INNER)
            return h
        return timed(fn, params, full_tokens, cond)

    i_cb = next(i for i, b in enumerate(model.net.blocks)
                if hasattr(b, "subnet_ctor"))
    i_pm = next(i for i, b in enumerate(model.net.blocks)
                if b.__class__.__name__ == "Permute")
    coup_flop = 2 * flop  # 2 sequential subnets per coupling
    t_coup = _block_scan(model.net, i_cb)
    report("cinn coupling inv (composed)", t_coup, coup_flop, 0, 0)
    if model.sample_net is not None:
        t_coup_k = _block_scan(model.sample_net, i_cb)
        report("cinn coupling inv (twin)", t_coup_k, coup_flop, 0, 0)
        print(f"  {nb} couplings at twin rate = "
              f"{batch / (nb * t_coup_k):.1f} showers/s ceiling from couplings alone")
    t_perm = _block_scan(model.net, i_pm)
    perm_bytes = 2 * batch * 2 * T_half * P * f32
    report("cinn permute inv", t_perm, 0, perm_bytes, 0)

    # ---- RQS inverse alone, scanned ----
    from vit4hep_tpu.ops.rqs import binned_constrain, binned_rqs

    nsp = cb.n_params
    theta = jax.device_put(
        np.random.randn(batch, T_half * P, nsp).astype(np.float32))
    y = jax.device_put(
        np.random.rand(batch, T_half * P).astype(np.float32) * 4 - 2)

    def rqs_scan(yv, th):
        def body(h, _):
            pr = binned_constrain(th, cb.bins, tuple(cb.min_bin_sizes),
                                  tuple(cb.default_domain),
                                  cb.identity_tails, cb.domain_clamping)
            o, _ld = binned_rqs(h, pr, rev=True)
            return jnp.clip(h + 1e-6 * o, -7.9, 7.9), None
        h, _ = jax.lax.scan(body, yv, None, length=INNER)
        return h

    try:
        t_rqs = timed(rqs_scan, y, theta)
        n_el = batch * T_half * P
        report("cinn rqs inverse", t_rqs, 0,
               2 * n_el * (nsp + 2) * f32, n_el * 120)
    except Exception as e:  # signature drift guard — micro is optional
        print(f"  (rqs-only micro skipped: {type(e).__name__}: {e})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--smoke"]
    smoke = "--smoke" in sys.argv  # CPU plumbing check: tiny batch/INNER
    which = args[0] if args else "both"
    if smoke:
        INNER = 2
    float(jnp.zeros(()))  # absorb first-fetch tunnel backlog
    print(f"device: {jax.devices()[0].platform}, "
          f"dispatch floor {measure_dispatch_floor() * 1e3:.1f} ms")
    if which in ("energy", "both"):
        roofline_energy(batch=8 if smoke else 1024)
    if which in ("cinn", "both"):
        roofline_cinn(batch=8 if smoke else 256)
