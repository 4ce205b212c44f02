"""cINN ds2 TRAIN-step roofline (VERDICT r4 next #1).

Flow/energy training throughput had never been measured anywhere; bench.py
round 5 adds ``cinn_ds2_train_it_s``. This tool explains that number: the
max-likelihood step (-log_prob through all 20 RQS couplings + ViT1D
subnets, grad, AdamW, EMA — reference models/base_model.py:149-153 driven
by experiments/base_experiment.py:433-553) decomposed with the
tools/train_roofline.py methodology, plus the stage micros that decide
whether the COMPOSED likelihood spline (constrain + searchsorted + logdet
— the path ops/fused_spline.py deliberately skips) is the wall:

  full step        bench.py's scanned train program: it/s + subnet-matmul MFU
  fwd-only         -log_prob loss scan: fwd vs bwd+update split
  fwd+bwd          value_and_grad without optimizer/EMA/skip: update share
  subnet fwd       one ViT1D forward (2 per coupling, 40 per log_prob eval)
  spline fwd       composed constrain + binned_rqs forward (likelihood dir)
  coupling fwd     one real block.forward (sanity: ~ 2*(subnet+spline))

MFU accounting: per log_prob eval the matmul FLOPs are 40 subnet forwards
(nb couplings x 2 subnets); the train step costs ~3x forward matmuls
(fwd + dL/dx + dL/dW). Subnet per-eval MACs use BASELINE.md's per-block
formula 12 H^2 N + 2 N^2 H at the ViT1D shape (N=135, H=192, depth 3).

Run (serial on this 1-vCPU host): python tools/cinn_train_roofline.py
[--smoke]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    # axon plugin overrides JAX_PLATFORMS from the env; re-assert it
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import jax
import jax.numpy as jnp

import tools.roofline_small_stages as rs

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BF16_PEAK_TFLOPS = 197.0  # v5e

# cINN ds2 geometry: (1,45,16,9) voxels, patch (3,8,1) -> 270 tokens of
# patch_dim 24; couplings split tokens even/odd -> subnets see N=135
N_HALF, HID, DEPTH = 135, 192, 3


def _subnet_tflops_per_eval(batch):
    macs = DEPTH * (12 * HID * HID * N_HALF + 2 * N_HALF * N_HALF * HID)
    return batch * 2.0 * macs / 1e12


def main():
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    smoke = "--smoke" in sys.argv
    batch = 8 if smoke else 64  # configs/training/cinn/ds23.yaml batchsize
    inner = 2 if smoke else 10
    n_iters = 1 if smoke else 3

    model = instantiate(_load_yaml(os.path.join(
        _REPO, "configs", "model/cinn/cinn_ds2_electrons.yaml")))
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 1, 45, 16, 9)).astype(np.float32))
    c = jnp.asarray(np.random.default_rng(1).normal(
        size=(batch, 46)).astype(np.float32))

    nb = sum(1 for b in model.net.blocks if hasattr(b, "subnet_ctor"))
    fwd_t = 2 * nb * _subnet_tflops_per_eval(batch)  # TF per log_prob eval

    # ---- full train step (bench.py _timed_train pattern) -------------------
    from vit4hep_tpu.experiments import train_state as ts

    class TCfg(dict):
        __getattr__ = dict.get
        lr = 1e-3
        iterations = 1000

    tx = ts.make_optimizer(TCfg())
    state = ts.create_train_state(params, tx, use_ema=True)
    step = ts.make_train_step(
        lambda p, xx, cc, rng: model.batch_loss(p, xx, cc, rng),
        tx, clip_grad_value=None, clip_grad_norm=1.0, max_grad_norm=50.0,
        ema_decay=0.9999,
    )

    @jax.jit
    def run(st, k):
        def body(carry, i):
            s, _ = step(carry, (x, c), jax.random.fold_in(k, i))
            return s, None
        st, _ = jax.lax.scan(body, st, jnp.arange(inner))
        return st

    state = run(state, jax.random.PRNGKey(1))
    sync = lambda: float(jnp.sum(jax.tree.leaves(state.params)[0]))
    sync()
    t0 = time.perf_counter()
    for i in range(n_iters):
        state = run(state, jax.random.PRNGKey(2 + i))
    sync()
    per_step = (time.perf_counter() - t0) / (inner * n_iters)
    print(f"full step : {1 / per_step:7.2f} it/s  {per_step * 1e3:7.2f} ms  "
          f"MFU {3 * fwd_t / per_step / BF16_PEAK_TFLOPS * 100:5.1f}% "
          f"(batch {batch}, {nb} couplings)")

    # ---- fwd-only loss scan ------------------------------------------------
    @jax.jit
    def fwd_only(p, k):
        def body(carry, i):
            return carry + model.batch_loss(p, x, c, jax.random.fold_in(k, i)), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(inner))
        return acc

    float(fwd_only(params, jax.random.PRNGKey(3)))
    t0 = time.perf_counter()
    for i in range(n_iters):
        float(fwd_only(params, jax.random.PRNGKey(4 + i)))
    t_fwd = (time.perf_counter() - t0) / (inner * n_iters)
    print(f"fwd-only  : {t_fwd * 1e3:7.2f} ms  "
          f"MFU {fwd_t / t_fwd / BF16_PEAK_TFLOPS * 100:5.1f}%  "
          f"(bwd+update = {(per_step - t_fwd) * 1e3:.2f} ms, "
          f"{(per_step - t_fwd) / per_step * 100:.0f}% of step)")

    # ---- fwd+bwd without optimizer/EMA/skip --------------------------------
    from vit4hep_tpu.experiments.train_state import global_norm

    @jax.jit
    def grad_only(p, k):
        def body(carry, i):
            loss, grads = jax.value_and_grad(model.batch_loss)(
                p, x, c, jax.random.fold_in(k, i))
            return carry + loss + global_norm(grads), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(inner))
        return acc

    float(grad_only(params, jax.random.PRNGKey(5)))
    t0 = time.perf_counter()
    for i in range(n_iters):
        float(grad_only(params, jax.random.PRNGKey(6 + i)))
    t_gb = (time.perf_counter() - t0) / (inner * n_iters)
    print(f"fwd+bwd   : {t_gb * 1e3:7.2f} ms  "
          f"MFU {3 * fwd_t / t_gb / BF16_PEAK_TFLOPS * 100:5.1f}%  "
          f"(update+control = {(per_step - t_gb) * 1e3:.2f} ms)")

    # ---- stage micros (roofline_small_stages methodology) ------------------
    cb = next(b for b in model.net.blocks if hasattr(b, "subnet_ctor"))
    i_cb = next(i for i, b in enumerate(model.net.blocks)
                if hasattr(b, "subnet_ctor"))
    subnet = cb.subnet_ctor(cb.n_params)
    T_half, P, nsp = subnet.cfg.prod_num_patches, subnet.cfg.patch_dim, cb.n_params
    x_half = jax.device_put(np.random.randn(batch, T_half, P).astype(np.float32))
    sp = subnet.init(key, x_half, c)

    def scan(body0):
        def fn(h0, *cs):
            def body(h, _):
                return body0(h, *cs), None
            h, _ = jax.lax.scan(body, h0, None, length=rs.INNER)
            return h
        return fn

    t_sub = rs.timed(
        scan(lambda h, cc: h + 1e-6 * subnet.apply(sp, h, cc)[..., :P]),
        x_half, c)
    tf_sub = _subnet_tflops_per_eval(batch)
    print(f"subnet fwd: {t_sub * 1e3:7.3f} ms/eval  "
          f"MFU {tf_sub / t_sub / BF16_PEAK_TFLOPS * 100:5.1f}%")

    # composed likelihood spline: constrain + binned_rqs forward + logdet
    from vit4hep_tpu.ops import rqs

    theta = jax.device_put(
        np.random.randn(batch, T_half * P, nsp).astype(np.float32))
    x0 = jax.device_put(
        (np.random.rand(batch, T_half * P) * 4 - 2).astype(np.float32))

    def spline_fwd(h, th):
        pr = rqs.binned_constrain(
            th, cb.bins, tuple(cb.min_bin_sizes), tuple(cb.default_domain),
            cb.identity_tails, cb.domain_clamping)
        y, ld = rqs.binned_rqs(h, pr, rev=False)
        return jnp.clip(h + 1e-6 * (y + ld[:, None]), -7.9, 7.9)

    t_spl = rs.timed(scan(spline_fwd), x0, theta)
    print(f"spline fwd: {t_spl * 1e3:7.3f} ms/eval (composed "
          f"constrain+searchsorted+logdet)")

    # spline fwd+bwd: the cost the TRAIN step pays per coupling side
    def spline_fwd_grad(h, th):
        def loss(hh, tt):
            pr = rqs.binned_constrain(
                tt, cb.bins, tuple(cb.min_bin_sizes),
                tuple(cb.default_domain), cb.identity_tails,
                cb.domain_clamping)
            y, ld = rqs.binned_rqs(hh, pr, rev=False)
            return jnp.sum(y) + jnp.sum(ld)
        gh, gt = jax.grad(loss, argnums=(0, 1))(h, th)
        return jnp.clip(h + 1e-6 * (gh + jnp.sum(gt, axis=-1)), -7.9, 7.9)

    t_splg = rs.timed(scan(spline_fwd_grad), x0, theta)
    print(f"spline f+b: {t_splg * 1e3:7.3f} ms/eval (vjp through the "
          f"composed spline)")

    # full coupling forward on the real flow
    full = jax.device_put(
        (np.random.randn(batch, 2 * T_half, P) * 0.5).astype(np.float32))

    def coup_fwd(h, cc):
        o, _ld = model.net.bind(params).blocks[i_cb].forward(h, cc)
        return jnp.clip(h + 1e-3 * (o - h), -8.0, 8.0)

    t_coup = rs.timed(scan(coup_fwd), full, c)
    print(f"coupling  : {t_coup * 1e3:7.3f} ms/eval "
          f"(2x(subnet+spline) = {2 * (t_sub + t_spl) * 1e3:.3f} ms)")

    # ---- budget ------------------------------------------------------------
    t_sub_all = 2 * nb * t_sub
    t_spl_all = 2 * nb * t_spl
    print(f"\nper log_prob eval ({nb} couplings):")
    print(f"  subnets   {t_sub_all * 1e3:8.2f} ms "
          f"({t_sub_all / t_fwd * 100:5.1f}% of fwd-only)")
    print(f"  splines   {t_spl_all * 1e3:8.2f} ms "
          f"({t_spl_all / t_fwd * 100:5.1f}% of fwd-only)")
    print(f"  glue      {(t_fwd - t_sub_all - t_spl_all) * 1e3:8.2f} ms "
          f"({(t_fwd - t_sub_all - t_spl_all) / t_fwd * 100:5.1f}%)")
    print(f"subnet-matmul ceiling: "
          f"{1 / (3 * t_sub_all):.1f} it/s (3x fwd subnet time)")


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        rs.INNER = 2
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}, dispatch floor "
          f"{rs.measure_dispatch_floor() * 1e3:.1f} ms")
    main()
