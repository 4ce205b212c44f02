"""Roofline the energy stage and the cINN sampler (VERDICT round 2, next #4).

Applies the tools/roofline_ds3.py methodology to the two flat metrics:

- **energy stage** (`cfm_ds2_energy.yaml`): ParallelTransformer CFM, d_model
  128 (embeds=true => 2*64), 4 encoder + 4 decoder layers, ff 512, 45/46
  tokens, batch 1024, RK4 20 steps => 80 net evals/sample. Reference
  workload: /root/reference/nn/cfm/transformer_cfm.py:12-119.
- **cINN sampler** (`cinn_ds2_electrons.yaml`): 20-block two-sided RQS flow,
  ViT1D(192, depth 3, 4 heads) subnets on 135-token halves => 40 sequential
  subnet evals per inverse pass, batch 256. Reference workload:
  /root/reference/models/base_model.py:127-147.

Each timed program loops INNER times inside one jit (the ~28 ms/dispatch
tunnel floor is measured and subtracted), and every measurement ends in a
device->host scalar fetch (exact sync on the axon tunnel).

Run: python tools/roofline_stages.py [energy|cinn]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

V5E_MXU_TFLOPS = 197e12
V5E_VPU_OPS = 6.16e12
V5E_HBM_BPS = 819e9

INNER = 40
_DISPATCH_FLOOR = [0.0]
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _model_from_yaml(rel_path):
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    return instantiate(_load_yaml(os.path.join(_REPO, "configs", rel_path)))


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


def timed(fn, *args, inner=None):
    """Seconds per inner iteration of jit(fn)(*args) (fn loops `inner` times)."""
    inner = inner or INNER
    jfn = jax.jit(fn)
    out = jfn(*args)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    t0 = time.perf_counter()
    out = jfn(*args)
    float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    return max(0.0, time.perf_counter() - t0 - _DISPATCH_FLOOR[0]) / inner


def report(name, t, flop, byts, vops=0):
    mfu = flop / t / V5E_MXU_TFLOPS * 100 if flop else 0.0
    print(f"{name:24s} {t * 1e3:8.3f} ms | floors: "
          f"MXU {flop / V5E_MXU_TFLOPS * 1e3:7.3f}  "
          f"HBM {byts / V5E_HBM_BPS * 1e3:7.3f}  "
          f"VPU {vops / V5E_VPU_OPS * 1e3:7.3f} ms | MFU {mfu:5.1f}%")


# ---------------------------------------------------------------------------
# energy stage
# ---------------------------------------------------------------------------
def roofline_energy(batch=1024):
    model = _model_from_yaml("model/cfm/cfm_ds2_energy.yaml")
    net = model.net
    p = net.cfg
    d = p.d_model
    n_tok = p.dims_in
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (batch, n_tok))
    t = jnp.full((batch, 1), 0.4)
    c = jax.random.normal(jax.random.fold_in(key, 2), (batch, p.dims_c))

    def eval_scan(params, x, t, c):
        def body(h, _):
            return model.forward(params, h, t, c), None
        out, _ = jax.lax.scan(body, x, None, length=INNER)
        return out

    t_eval = timed(eval_scan, params, x, t, c)

    # analytic floors per eval (batch x tokens rows):
    rows = batch * n_tok
    ff = p.dim_feedforward
    # encoder layer: self-attn (4 d^2) + ff (2 d ff); decoder adds cross-attn
    macs_enc = p.num_encoder_layers * (4 * d * d + 2 * d * ff)
    macs_dec = p.num_decoder_layers * (8 * d * d + 2 * d * ff)
    macs_scores = (p.num_encoder_layers + 2 * p.num_decoder_layers) * 2 * n_tok * d
    flop = 2 * rows * (macs_enc + macs_dec + macs_scores)
    # HBM: weights once + activation round trips (post-LN torch layout:
    # ~6 materialized passes per layer is typical for unfused XLA)
    w_bytes = 4 * (macs_enc + macs_dec)  # params ~ MACs/row for dense nets
    act_pass = rows * d * 4
    n_layers = p.num_encoder_layers + p.num_decoder_layers
    byts = w_bytes + 6 * n_layers * act_pass
    report("net eval (scan)", t_eval, flop, byts)

    # full sampler rate for context
    cond = jax.random.normal(jax.random.fold_in(key, 3), (batch, p.dims_c))
    fn = jax.jit(lambda pp, cc, kk: jnp.sum(model.sample_batch(pp, cc, kk)))
    float(fn(params, cond, key))
    t0 = time.perf_counter()
    float(fn(params, cond, jax.random.fold_in(key, 9)))
    dt = time.perf_counter() - t0
    n_evals = 80
    print(f"sample_batch: {batch / dt:.1f} u-vec/s  "
          f"({dt / n_evals * 1e3:.3f} ms/eval vs scan {t_eval * 1e3:.3f})")
    return t_eval, flop


# ---------------------------------------------------------------------------
# cINN sampler
# ---------------------------------------------------------------------------
def roofline_cinn(batch=256):
    model = _model_from_yaml("model/cinn/cinn_ds2_electrons.yaml")
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    z = jax.random.normal(jax.random.fold_in(key, 1),
                          model.x_shape(batch), jnp.float32)
    c = jax.random.normal(jax.random.fold_in(key, 2), (batch, 46))

    # one full inverse pass (what sample_batch runs once per batch)
    def inverse_once(params, z, c):
        x, _ = model.forward(params, z, c, rev=True)
        return x

    t_inv = timed(inverse_once, params, z, c, inner=1)

    # one ViT1D subnet forward at the coupling's actual half shapes, scanned
    from vit4hep_tpu.models.vit import ViT1D

    tokens = model.to_patches(jnp.asarray(np.zeros((2,) + tuple(np.asarray(
        model.x_shape(2))[1:]), np.float32)))
    n_tok, pdim = tokens.shape[1], tokens.shape[2]
    half = pdim // 2
    from vit4hep_tpu.utils.config import _load_yaml

    raw = _load_yaml(os.path.join(_REPO, "configs/model/cinn/cinn_ds2_electrons.yaml"))
    vk = dict(raw.get("vit_kwargs", {}))
    hid = int(vk.get("hidden_dim", 192))
    depth = int(vk.get("depth", 3))
    heads = int(vk.get("num_heads", 4))
    bins = int(dict(raw.get("cinn_kwargs", {})).get("bins", 10))
    n_params_out = 3 * bins + 1  # FrEIA RQS params per scalar (2 tails)
    sub = ViT1D(dict(
        dim=1, condition_dim=46, hidden_dim=hid, out_channels=n_params_out,
        depth=depth, num_heads=heads, mlp_ratio=4.0, learn_pos_embed=True,
        num_patches=[[n_tok, 1, 1]], patch_dim=half,
    ))
    xs = jax.random.normal(jax.random.fold_in(key, 3), (batch, n_tok, half))
    sp = sub.init(key, xs, c)

    def subnet_scan(sp, xs, c):
        def body(h, _):
            out = sub.apply(sp, h, c)
            return h + 1e-6 * out[..., :half], None
        out, _ = jax.lax.scan(body, xs, None, length=INNER)
        return out

    t_sub = timed(subnet_scan, sp, xs, c)

    # RQS spline inverse alone (constrain + invert) at the coupling shapes
    from vit4hep_tpu.ops.rqs import binned_constrain, binned_rqs

    theta = jax.random.normal(jax.random.fold_in(key, 4),
                              (batch, n_tok, half, n_params_out))
    ys = jax.random.uniform(jax.random.fold_in(key, 5),
                            (batch, n_tok, half), minval=-7, maxval=7)

    def rqs_scan(theta, ys):
        def body(h, _):
            sp = binned_constrain(theta, bins, min_bin_sizes=(0.001, 0.001),
                                  default_domain=(-8.0, 8.0, -8.0, 8.0))
            out, _ld = binned_rqs(h, sp, rev=True)
            return out, None
        out, _ = jax.lax.scan(body, ys, None, length=INNER)
        return out

    try:
        t_rqs = timed(rqs_scan, theta, ys)
    except Exception as e:  # signature drift tolerable: report and continue
        print("rqs timing skipped:", e)
        t_rqs = float("nan")

    n_subnets = 40  # 20 blocks x 2 two-sided subnet evals (sequential)
    macs_sub = (12 * hid * hid * n_tok + 2 * n_tok * n_tok * hid) * depth
    flop_sub = 2 * macs_sub * batch
    w_sub = 12 * hid * hid * depth * 4
    act_sub = batch * n_tok * hid * 4
    report("subnet eval (scan)", t_sub, flop_sub, w_sub + 8 * depth * act_sub)
    if t_rqs == t_rqs:
        report("rqs inverse (scan)", t_rqs, 0,
               theta.size * 4 + 2 * ys.size * 4, ys.size * 40)
    report("flow inverse (1 pass)", t_inv, flop_sub * n_subnets,
           n_subnets * (w_sub + 8 * depth * act_sub))
    print(f"subnets x{n_subnets} account for {n_subnets * t_sub / t_inv * 100:.0f}% "
          f"of the inverse pass; sampler rate = {batch / t_inv:.1f} showers/s "
          f"(tokens={n_tok}, half_dim={half}, hidden={hid})")
    return t_inv, t_sub


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    float(jnp.zeros(()))  # absorb first-fetch backlog
    print(f"device: {jax.devices()[0].platform}; dispatch floor "
          f"{measure_dispatch_floor() * 1e3:.1f} ms (subtracted)")
    if which in ("energy", "both"):
        roofline_energy()
    if which in ("cinn", "both"):
        roofline_cinn()
