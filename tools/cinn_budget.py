"""Post-kernel-wave cINN per-coupling budget (VERDICT r3 weak #2 / next #2).

The shipped cINN ds2 sampler reads ~1430 showers/s while the PRE-wave
roofline published a subnet-only ceiling of 4845 showers/s — leaving ~3.4x
formally unaccounted. This tool decomposes one coupling+permute pair at the
SHIPPED kernel tier (packed attention in the ViT1D subnets + the
single-pass Pallas spline inverse) into its sequential stages, each scanned
INNER times inside one jit (the roofline_small_stages methodology: the
~28 ms dispatch floor is subtracted and amortized to <2%):

  subnet fwd        one ViT1D forward on the passive half (the workload runs
                    2 per coupling, sequentially — y2 needs x1, y1 needs y2)
  spline stage      fused_binned_rqs_inverse (swapaxes relayout + constrain
                    + Pallas inverse; the relayout share also shown alone)
  coupling inv      the real block.inverse (sanity: ~ 2*(subnet+spline))
  permute inv       token-axis gather between couplings
  e2e               sample_batch; nb*(coupling+permute) should land within
                    ~10% of it, or the residue is in the flow glue

Reference workload being matched: models/base_model.py:127-147 (sequential
block inverses over the 20-block GraphINN).

Run: python tools/cinn_budget.py  (axon TPU; --smoke for CPU plumbing)
"""

from __future__ import annotations

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

import tools.roofline_small_stages as rs

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(batch=256):
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    model = instantiate(_load_yaml(os.path.join(
        _REPO, "configs", "model/cinn/cinn_ds2_electrons.yaml")))
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    cond = jax.device_put(
        np.random.randn(batch, model.condition_dim).astype(np.float32) * 0.1)

    # ---- e2e ---------------------------------------------------------------
    smp = jax.jit(lambda pr, cc, k: jnp.sum(model.sample_batch(pr, cc, k)))
    float(smp(params, cond, key))
    t0 = time.perf_counter()
    for i in range(3):
        float(smp(params, cond, jax.random.fold_in(key, i)))
    t_batch_raw = (time.perf_counter() - t0) / 3
    rate = batch / t_batch_raw
    # the micros subtract the ~25 ms/dispatch tunnel floor; subtract it from
    # the e2e batch time too or it masquerades as per-pair flow glue
    # (1 dispatch / 20 pairs ~ 1.1 ms/pair at the measured floor)
    t_batch = max(1e-9, t_batch_raw - rs._DISPATCH_FLOOR[0])
    nb = len(model.net.blocks) // 2
    t_pair = t_batch / nb
    print(f"e2e: {rate:.1f} showers/s raw "
          f"({batch / t_batch:.1f} compute-only after subtracting the "
          f"{rs._DISPATCH_FLOOR[0] * 1e3:.1f} ms dispatch floor) = "
          f"{t_pair * 1e3:.3f} ms per coupling+permute pair "
          f"(batch {batch}, {nb} pairs)")

    # ---- stage micros ------------------------------------------------------
    cb = next(b for b in model.net.blocks if hasattr(b, "subnet_ctor"))
    i_cb = next(i for i, b in enumerate(model.net.blocks)
                if hasattr(b, "subnet_ctor"))
    i_pm = next(i for i, b in enumerate(model.net.blocks)
                if b.__class__.__name__ == "Permute")
    subnet = cb.subnet_ctor(cb.n_params)
    T_half, P, nsp = subnet.cfg.prod_num_patches, subnet.cfg.patch_dim, cb.n_params
    x_half = jax.device_put(np.random.randn(batch, T_half, P).astype(np.float32))
    sp = subnet.init(key, x_half, cond)

    def scan(body0):
        def fn(h0, *cs):
            def body(h, _):
                return body0(h, *cs), None
            h, _ = jax.lax.scan(body, h0, None, length=rs.INNER)
            return h
        return fn

    # subnet forward (shipped tier: packed attention at d=48)
    t_sub = rs.timed(
        scan(lambda h, cc: h + 1e-6 * subnet.apply(sp, h, cc)[..., :P]),
        x_half, cond)

    # theta relayout alone (informational — the (B,D,P)->(B,P,D) swapaxes
    # runs INSIDE fused_binned_rqs_inverse, so the spline row already
    # includes it; this isolates its share)
    theta0 = jax.device_put(
        np.random.randn(batch, T_half * P, nsp).astype(np.float32))

    def relayout(h):
        t = jnp.swapaxes(h, 1, 2)
        return h + 1e-6 * jnp.swapaxes(t, 1, 2)

    t_rel = rs.timed(scan(relayout), theta0) / 2  # two swaps per iter

    # spline stage (swapaxes + constrain + Pallas inverse), shipped flags
    from vit4hep_tpu.ops.fused_spline import fused_binned_rqs_inverse

    theta = jax.device_put(
        np.random.randn(batch, T_half * P, nsp).astype(np.float32))
    y0 = jax.device_put(
        (np.random.rand(batch, T_half * P) * 4 - 2).astype(np.float32))

    def spline(h, th):
        o, _ld = fused_binned_rqs_inverse(
            h, th, cb.bins, tuple(cb.min_bin_sizes),
            tuple(cb.default_domain), cb.identity_tails, cb.domain_clamping)
        return jnp.clip(h + 1e-6 * o, -7.9, 7.9)

    t_spl = rs.timed(scan(spline), y0, theta)

    # full coupling inverse + permute inverse on the real flow
    full = jax.device_put(
        (np.random.randn(batch, 2 * T_half, P) * 0.5).astype(np.float32))

    def block_inv(idx):
        def body(h, cc):
            o, _ld = model.net.bind(params).blocks[idx].inverse(h, cc)
            return jnp.clip(h + 1e-3 * (o - h), -8.0, 8.0)
        return rs.timed(scan(body), full, cond)

    t_coup = block_inv(i_cb)
    t_perm = block_inv(i_pm)

    # ---- budget table ------------------------------------------------------
    ms = lambda t: t * 1e3
    parts = [
        ("subnet fwd (x2 per coupling)", 2 * t_sub),
        ("spline stage incl. relayout (x2)", 2 * t_spl),
        ("coupling glue (coup - parts)", t_coup - 2 * (t_sub + t_spl)),
        ("permute inv", t_perm),
    ]
    print(f"\n{'stage':34s} {'ms/pair':>9s} {'share of e2e':>13s}")
    for name, t in parts:
        print(f"{name:34s} {ms(t):9.3f} {t / t_pair * 100:12.1f}%")
    t_sum = t_coup + t_perm
    print(f"{'  (of spline: relayout alone)':34s} {ms(2 * t_rel):9.3f}")
    print(f"{'[coupling inv, measured whole]':34s} {ms(t_coup):9.3f}")
    print(f"{'sum coupling+permute':34s} {ms(t_sum):9.3f} "
          f"{t_sum / t_pair * 100:12.1f}%")
    print(f"{'e2e per pair':34s} {ms(t_pair):9.3f} {100.0:12.1f}%")
    print(f"\nflow-glue residue (e2e - nb*(coup+perm)): "
          f"{ms(t_pair - t_sum) * nb:.2f} ms/batch "
          f"({(t_pair - t_sum) / t_pair * 100:.1f}% of e2e)")
    print(f"subnet-only ceiling at shipped tier: "
          f"{batch / (2 * nb * t_sub):.1f} showers/s")


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        rs.INNER = 2
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}, dispatch floor "
          f"{rs.measure_dispatch_floor() * 1e3:.1f} ms")
    main(batch=8 if "--smoke" in sys.argv else 256)
