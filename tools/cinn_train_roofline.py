"""cINN ds2 TRAIN-step roofline (VERDICT r4 next #1).

Flow/energy training throughput had never been measured anywhere; bench.py
round 5 adds ``cinn_ds2_train_it_s``. This tool explains that number: the
max-likelihood step (-log_prob through all 20 RQS couplings + ViT1D
subnets, grad, AdamW, EMA — reference models/base_model.py:149-153 driven
by experiments/base_experiment.py:433-553) decomposed with the
tools/train_roofline.py methodology.

First on-chip read (2026-08-20): full step 7.44 it/s at 11.6% MFU while
fwd-only runs 7.3 ms at 71.2% MFU — the BACKWARD (+update) is 95% of the
step, ~17x the forward instead of the ~2x a matmul-bound chain would pay.
The stage micros below localize that pathology (subnet vjp? spline vjp?
split/interleave scatters? optimizer over the 53M-param flow?), so they
run FIRST and every arm is fenced — a ResourceExhausted in one arm (seen
when three 20-coupling programs are resident at once) no longer kills the
readout.

Arms:
  subnet fwd / f+b      one ViT1D forward / value_and_grad through it
  spline fwd / f+b      composed constrain + binned_rqs likelihood dir
  coupling fwd / f+b    one real block.forward / vjp through it
  full step             bench.py's scanned train program: it/s + MFU
  fwd-only              -log_prob loss scan
  fwd+bwd               value_and_grad without optimizer/EMA/skip

MFU accounting: per log_prob eval the matmul FLOPs are 40 subnet forwards
(nb couplings x 2 subnets); the train step costs ~3x forward matmuls.
Subnet per-eval MACs use BASELINE.md's per-block formula at the ViT1D
shape (N=135, H=192, depth 3).

Run (serial on this 1-vCPU host): python tools/cinn_train_roofline.py
[--smoke] [--skip-micros]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

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


def fenced(name):
    """Run an arm; a device OOM or compile failure prints and moves on."""
    def deco(fn):
        try:
            fn()
        except Exception:
            print(f"[{name} FAILED]", flush=True)
            traceback.print_exc()
    return deco


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
    tf_sub = _subnet_tflops_per_eval(batch)

    # ---- stage micros FIRST (small programs; localize the backward wall) --
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

    from vit4hep_tpu.ops import rqs

    theta = jax.device_put(
        np.random.randn(batch, T_half * P, nsp).astype(np.float32))
    x0 = jax.device_put(
        (np.random.rand(batch, T_half * P) * 4 - 2).astype(np.float32))
    full = jax.device_put(
        (np.random.randn(batch, 2 * T_half, P) * 0.5).astype(np.float32))

    if "--skip-micros" not in sys.argv:
        @fenced("subnet fwd")
        def _():
            t = rs.timed(scan(
                lambda h, cc: h + 1e-6 * subnet.apply(sp, h, cc)[..., :P]),
                x_half, c)
            print(f"subnet fwd: {t * 1e3:8.3f} ms/eval  "
                  f"MFU {tf_sub / t / BF16_PEAK_TFLOPS * 100:5.1f}%",
                  flush=True)

        @fenced("subnet f+b")
        def _():
            def body(h, cc):
                def loss(hh):
                    return jnp.sum(subnet.apply(sp, hh, cc))
                return h + 1e-6 * jax.grad(loss)(h)
            t = rs.timed(scan(body), x_half, c)
            print(f"subnet f+b: {t * 1e3:8.3f} ms/eval  "
                  f"MFU {3 * tf_sub / t / BF16_PEAK_TFLOPS * 100:5.1f}% "
                  f"(x-grad only; w-grads ride the full step)", flush=True)

        @fenced("subnet f+b w-grads")
        def _():
            from vit4hep_tpu.experiments.train_state import global_norm

            def body(h, cc):
                def loss(pp, hh):
                    return jnp.sum(subnet.apply(pp, hh, cc))
                gp, gh = jax.grad(loss, argnums=(0, 1))(sp, h)
                return h + 1e-6 * (gh + global_norm(gp))
            t = rs.timed(scan(body), x_half, c)
            print(f"subnet f+b+w: {t * 1e3:6.3f} ms/eval  "
                  f"MFU {3 * tf_sub / t / BF16_PEAK_TFLOPS * 100:5.1f}% "
                  f"(full vjp incl. weight grads)", flush=True)

        def spline_fwd(h, th):
            # perturb theta from the carry so binned_constrain is NOT
            # loop-invariant (XLA would hoist it out of the timing scan —
            # the first on-chip read showed 0.016 ms/eval, less than one
            # HBM pass over theta)
            th = th * (1.0 + 1e-9 * h[0, 0])
            pr = rqs.binned_constrain(
                th, cb.bins, tuple(cb.min_bin_sizes), tuple(cb.default_domain),
                cb.identity_tails, cb.domain_clamping)
            y, ld = rqs.binned_rqs(h, pr, rev=False)
            return jnp.clip(h + 1e-6 * (y + ld[:, None]), -7.9, 7.9)

        @fenced("spline fwd")
        def _():
            t = rs.timed(scan(spline_fwd), x0, theta)
            print(f"spline fwd: {t * 1e3:8.3f} ms/eval (composed "
                  f"constrain+searchsorted+logdet)", flush=True)

        @fenced("spline f+b")
        def _():
            def body(h, th):
                def loss(hh, tt):
                    pr = rqs.binned_constrain(
                        tt, cb.bins, tuple(cb.min_bin_sizes),
                        tuple(cb.default_domain), cb.identity_tails,
                        cb.domain_clamping)
                    y, ld = rqs.binned_rqs(hh, pr, rev=False)
                    return jnp.sum(y) + jnp.sum(ld)
                gh, gt = jax.grad(loss, argnums=(0, 1))(h, th)
                return jnp.clip(h + 1e-6 * (gh + jnp.sum(gt, axis=-1)), -7.9, 7.9)
            t = rs.timed(scan(body), x0, theta)
            print(f"spline f+b: {t * 1e3:8.3f} ms/eval (vjp through the "
                  f"composed spline)", flush=True)

        @fenced("coupling fwd")
        def _():
            def body(h, cc):
                o, _ld = model.net.bind(params).blocks[i_cb].forward(h, cc)
                return jnp.clip(h + 1e-3 * (o - h), -8.0, 8.0)
            t = rs.timed(scan(body), full, c)
            print(f"coupling  : {t * 1e3:8.3f} ms/eval", flush=True)

        @fenced("coupling f+b")
        def _():
            def body(h, cc):
                def loss(hh):
                    o, ld = model.net.bind(params).blocks[i_cb].forward(hh, cc)
                    return jnp.sum(o) + jnp.sum(ld)
                return jnp.clip(h + 1e-6 * jax.grad(loss)(h), -8.0, 8.0)
            t = rs.timed(scan(body), full, c)
            print(f"coupling f+b: {t * 1e3:6.3f} ms/eval (x-grad)", flush=True)

    # ---- full train step (bench.py _timed_train pattern) -------------------
    from vit4hep_tpu.experiments import train_state as ts
    from vit4hep_tpu.experiments.train_state import global_norm

    class TCfg(dict):
        __getattr__ = dict.get
        lr = 1e-3
        iterations = 1000

    per_step_box = [None]
    t_fwd_box = [None]

    @fenced("full step")
    def _():
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
        per_step_box[0] = per_step
        print(f"full step : {1 / per_step:7.2f} it/s  "
              f"{per_step * 1e3:7.2f} ms  "
              f"MFU {3 * fwd_t / per_step / BF16_PEAK_TFLOPS * 100:5.1f}% "
              f"(batch {batch}, {nb} couplings)", flush=True)

    @fenced("fwd-only")
    def _():
        # CINN.batch_loss IGNORES rng, so a body built on fixed (x, c) is
        # loop-invariant and XLA hoists it out of the scan (first on-chip
        # read: 7.18 "ms/eval" vs the 42 ms the stage micros add up to).
        # Perturb x per iteration to defeat LICM.
        @jax.jit
        def fwd_only(p, k):
            def body(carry, i):
                xx = x * (1.0 + 1e-6 * i)
                return carry + model.batch_loss(
                    p, xx, c, jax.random.fold_in(k, i)), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(inner))
            return acc

        float(fwd_only(params, jax.random.PRNGKey(3)))
        t0 = time.perf_counter()
        for i in range(n_iters):
            float(fwd_only(params, jax.random.PRNGKey(4 + i)))
        t_fwd = (time.perf_counter() - t0) / (inner * n_iters)
        t_fwd_box[0] = t_fwd
        msg = (f"fwd-only  : {t_fwd * 1e3:7.2f} ms  "
               f"MFU {fwd_t / t_fwd / BF16_PEAK_TFLOPS * 100:5.1f}%")
        if per_step_box[0]:
            ps = per_step_box[0]
            msg += (f"  (bwd+update = {(ps - t_fwd) * 1e3:.2f} ms, "
                    f"{(ps - t_fwd) / ps * 100:.0f}% of step)")
        print(msg, flush=True)

    @fenced("fwd+bwd")
    def _():
        @jax.jit
        def grad_only(p, k):
            def body(carry, i):
                xx = x * (1.0 + 1e-6 * i)  # defeat LICM (see fwd-only)
                loss, grads = jax.value_and_grad(model.batch_loss)(
                    p, xx, c, jax.random.fold_in(k, i))
                return carry + loss + global_norm(grads), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(inner))
            return acc

        float(grad_only(params, jax.random.PRNGKey(5)))
        t0 = time.perf_counter()
        for i in range(n_iters):
            float(grad_only(params, jax.random.PRNGKey(6 + i)))
        t_gb = (time.perf_counter() - t0) / (inner * n_iters)
        msg = (f"fwd+bwd   : {t_gb * 1e3:7.2f} ms  "
               f"MFU {3 * fwd_t / t_gb / BF16_PEAK_TFLOPS * 100:5.1f}%")
        if per_step_box[0]:
            msg += (f"  (update+control = "
                    f"{(per_step_box[0] - t_gb) * 1e3:.2f} ms)")
        print(msg, flush=True)


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        rs.INNER = 2
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}, dispatch floor "
          f"{rs.measure_dispatch_floor() * 1e3:.1f} ms", flush=True)
    main()
