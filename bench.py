"""Headline benchmark: the full north-star metric set (BASELINE.md).

Primary metric (the headline JSON fields): CaloChallenge ds2 sampling
throughput (showers/sec/chip). The ``extra`` dict records the rest of the
north-star set so the per-round driver record catches regressions in any of
them (VERDICT round 1, weak #1):

- ``ds3_sampling_showers_s``  — ds3 sampling (450 tokens x patch_dim 90)
- ``ds2_train_it_s``          — full ds2 train step (batch 64): loss + grad
                                hygiene + AdamW + EMA, state scan-carried
- ``ds3_train_it_s``          — full ds3 train step (batch 16)
- ``ds1_sampling_showers_s``  — ds1 photons (5 sections, 88 tokens x patch_dim 5)
- ``cinn_ds2_showers_s``      — one jitted inverse pass through the 20-block
                                RQS flow (cinn_ds2_electrons.yaml)
- ``energy_u_vec_s``          — energy-model (ParallelTransformer CFM) sampling
- ``lemurs_showers_s``        — LEMURS CFM sampling (135 tokens, 53-dim cond;
                                reference experiments/lemurs/experiment.py:198-296)
- ``calohadronic_showers_s``  — CaloHadronic CFM sampling (606 tokens — the
                                longest shipped sequence)
- ``calogan_showers_s``       — CaloGAN e+ CFM sampling (84 tokens)
- ``cinn_ds2_train_it_s``     — cINN max-likelihood train step (batch 64 per
                                configs/training/cinn/ds23.yaml): -log_prob
                                through all 20 RQS couplings + ViT1D subnets,
                                grad, AdamW, EMA (reference
                                models/base_model.py:149-153)
- ``energy_ds2_train_it_s``   — energy-model CFM train step (batch 256 per
                                configs/training/cfm/energy.yaml; reference
                                nn/cfm/transformer_cfm.py under the train loop)

Workloads are pinned to the *shipped* config files (configs/model/...), which
mirror the reference definitions (reference configs/model/cfm/
cfm_ds2_electrons.yaml:18-31, cfm_ds3_electrons.yaml:30-31,
cinn_ds2_electrons.yaml, cfm_ds2_energy.yaml; batch 256 per reference
configs/training/default.yaml:3; RK4 step 0.05 => 80 net evals/shower).

The sampler is one jitted XLA program per batch (x_T ~ N, lax.scan over the
RK4 grid); the train-step measurement scans 20 steps inside one jit so the
~28 ms/dispatch tunnel overhead cannot pollute it (the state is the scan
carry, so XLA updates it in place across the 20 inner steps; the OUTER jit
boundary is deliberately not donated — one state copy per 20 steps, kept so
numbers stay comparable across banked captures and so the A/B tools that
share this pattern can reuse an initial state across arms; the production
train step, experiments/base.py, does donate its per-dispatch state). ``vs_baseline`` is
measured against an equivalent torch-CPU net eval (the reference's own
PyTorch stack on the CPU of this host), extrapolated to showers/sec; the
BASELINE.json target is >= 20x that number.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "showers/sec", "vs_baseline": N,
     "extra": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

BATCH = 256
N_WARMUP = 1
N_ITERS = 8

_REPO = os.path.dirname(os.path.abspath(__file__))

# measured anchors for the extras (BASELINE.md; energy re-anchored round 2
# when its workload was pinned to batch 1024 — round-1's 2762 used a
# different ad-hoc batch; the three non-CaloChallenge families were first
# measured round 3 via tools/family_rates.py, so their anchors are round-3)
ROUND1 = {
    "ds2_sampling_showers_s": 182.4,
    "ds3_sampling_showers_s": 38.7,
    "ds2_train_it_s": 55.9,
    "ds3_train_it_s": 54.7,        # round-1 xla path, same-session A/B
    "ds1_sampling_showers_s": 414.6,
    "cinn_ds2_showers_s": 90.5,
    "energy_u_vec_s": 2467.0,
    "lemurs_showers_s": 315.4,         # round-3 anchor (2026-08-19)
    "calohadronic_showers_s": 69.3,    # round-3 anchor (2026-08-19)
    "calogan_showers_s": 453.6,        # round-3 anchor (2026-08-19)
    # first measured round 5 (VERDICT r4 weak #1: no flow/energy train
    # number existed anywhere before); anchors = the round-5 first capture
    # (BENCH_MIDROUND_r05.json, 2026-08-21)
    "cinn_ds2_train_it_s": 7.63,
    "energy_ds2_train_it_s": 143.82,
}

# skip remaining secondary metrics once this much wall time is spent: a
# degraded tunnel must not starve the driver's per-round record of the
# headline metric (the JSON line still records every key, null if skipped)
EXTRA_TIME_BUDGET_S = 2400.0  # 11 extras x (compile + timed iters) on a healthy tunnel


def _model_from_yaml(rel_path: str):
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    return instantiate(_load_yaml(os.path.join(_REPO, "configs", rel_path)))


def _flops_per_shower(tokens=135, hidden=480, depth=6, evals=80) -> float:
    """Matmul FLOPs of one shower: `evals` net evals of a hidden-wide,
    depth-deep DiT (12 H^2 MACs/token/block + 2 N H attention MACs/token)."""
    per_block = 12 * hidden * hidden * tokens + 2 * tokens * tokens * hidden
    return 2.0 * per_block * depth * evals


def _timed_sampler(model, cond_dim, batch=BATCH, n_iters=N_ITERS, seed=0):
    """showers/sec of model.sample_batch as one jitted program per batch.

    Each timed iteration ends in a device->host fetch of a scalar reduction
    of the sample, so the measurement is an exact synchronization (on some
    tunneled attachments ``block_until_ready`` returns before execution).
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    params = model.init_params(key)
    cond = jax.device_put(np.random.randn(batch, cond_dim).astype(np.float32))

    fn = jax.jit(lambda p, c, k: jnp.sum(model.sample_batch(p, c, k)))
    for i in range(N_WARMUP):
        float(fn(params, cond, jax.random.fold_in(key, i)))

    t0 = time.perf_counter()
    for i in range(n_iters):
        s = float(fn(params, cond, jax.random.fold_in(key, 1000 + i)))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return batch * n_iters / dt


def bench_ds2() -> tuple[float, float]:
    """Returns (showers/sec, implied TFLOP/s) for the flagship ds2 sampler.

    The first fetch of a process can pay a large backlog penalty on a
    degraded tunnel — it is absorbed by a warm-up fetch before timing. The
    implied-TFLOPs figure still flags any residual timing artifact (a v5e
    peaks at ~200 bf16 TFLOP/s).
    """
    import jax.numpy as jnp

    # warm-up fetch: absorbs the first-transfer/backlog penalty of the link
    float(jnp.zeros(()))
    model = _model_from_yaml("model/cfm/cfm_ds2_electrons.yaml")
    rate = _timed_sampler(model, cond_dim=46)
    return rate, rate * _flops_per_shower(tokens=135) / 1e12


def bench_ds3() -> float:
    model = _model_from_yaml("model/cfm/cfm_ds3_electrons.yaml")
    return _timed_sampler(model, cond_dim=46, n_iters=4)


def bench_ds1() -> float:
    """ds1 photons: 5 detector sections, 88 multi-section tokens x patch_dim 5
    (reference configs/model/cfm/cfm_ds1_photons.yaml)."""
    model = _model_from_yaml("model/cfm/cfm_ds1_photons.yaml")
    return _timed_sampler(model, cond_dim=6, n_iters=8)


def bench_cinn_ds2() -> float:
    model = _model_from_yaml("model/cinn/cinn_ds2_electrons.yaml")
    return _timed_sampler(model, cond_dim=46, n_iters=4)


def bench_energy() -> float:
    """n_iters 8 (was 4): the round-4 recapture showed within-session spread
    is ±1% but official inter-session readings drift ±6% (BASELINE.md
    round-4 campaign) — more timed iters halve the per-capture noise share."""
    model = _model_from_yaml("model/cfm/cfm_ds2_energy.yaml")
    return _timed_sampler(model, cond_dim=1, batch=1024, n_iters=8)


def bench_lemurs() -> float:
    """LEMURS CFM sampling (135 tokens, the ds2 geometry with 53-dim cond)."""
    model = _model_from_yaml("model/cfm_lemurs/cfm_lemurs.yaml")
    return _timed_sampler(model, cond_dim=53, n_iters=8)


def bench_calohadronic() -> float:
    """CaloHadronic CFM sampling — 606 tokens (30 ECal + 576 HCal), the
    longest shipped sequence (exercises the fused-layout VMEM ceiling)."""
    model = _model_from_yaml("model/cfm_calohad/cfm_calohad.yaml")
    return _timed_sampler(model, cond_dim=59, n_iters=3)


def bench_calogan() -> float:
    """CaloGAN e+ CFM sampling (84 tokens)."""
    model = _model_from_yaml("model/cfm_calogan/cfm_eplus.yaml")
    return _timed_sampler(model, cond_dim=4, n_iters=8)


def bench_train_ds2(batch=64, inner=20, n_iters=3) -> float:
    """Full ds2 train-step throughput (it/s): `inner` scan-carried steps
    inside ONE jitted program, so per-dispatch tunnel overhead (~28 ms) does
    not bound the measurement (BASELINE.md round-1 finding). See the module
    docstring for why the outer jit boundary is not donated."""
    return _timed_train("model/cfm/cfm_ds2_electrons.yaml",
                        shape=(1, 45, 16, 9), batch=batch,
                        inner=inner, n_iters=n_iters)


def bench_train_ds3(batch=16, inner=20, n_iters=3) -> float:
    """Full ds3 train-step throughput (it/s), batch 16 (BASELINE.md)."""
    return _timed_train("model/cfm/cfm_ds3_electrons.yaml",
                        shape=(1, 45, 50, 18), batch=batch,
                        inner=inner, n_iters=n_iters)


def bench_train_cinn_ds2(batch=64, inner=20, n_iters=3) -> float:
    """cINN ds2 max-likelihood train-step throughput (it/s): -log_prob
    through the full 20-coupling RQS flow (constrain + searchsorted spline
    + logdet + ViT1D subnets), grad, AdamW, EMA — batch 64 per the shipped
    configs/training/cinn/ds23.yaml (reference models/base_model.py:149-153
    driven by experiments/base_experiment.py:433-553)."""
    return _timed_train("model/cinn/cinn_ds2_electrons.yaml",
                        shape=(1, 45, 16, 9), batch=batch,
                        inner=inner, n_iters=n_iters)


def bench_train_energy_ds2(batch=256, inner=20, n_iters=3) -> float:
    """Energy-model (ParallelTransformer CFM) ds2 train-step throughput
    (it/s) at batch 256 per configs/training/cfm/energy.yaml (reference
    nn/cfm/transformer_cfm.py:12-119 under the train loop)."""
    return _timed_train("model/cfm/cfm_ds2_energy.yaml",
                        shape=(45,), batch=batch,
                        inner=inner, n_iters=n_iters, cond_dim=1)


def _timed_train(yaml_rel, shape, batch, inner=20, n_iters=3,
                 cond_dim=46) -> float:
    import jax
    import jax.numpy as jnp

    from vit4hep_tpu.experiments import train_state as ts

    model = _model_from_yaml(yaml_rel)
    params = model.init_params(jax.random.PRNGKey(0))

    class TCfg(dict):
        __getattr__ = dict.get
        lr = 1e-3
        iterations = 1000

    tx = ts.make_optimizer(TCfg())
    state = ts.create_train_state(params, tx, use_ema=True)
    step = ts.make_train_step(
        lambda p, x, c, rng: model.batch_loss(p, x, c, rng),
        tx, clip_grad_value=None, clip_grad_norm=1.0, max_grad_norm=50.0,
        ema_decay=0.9999,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch,) + shape).astype(np.float32))
    c = jnp.asarray(np.random.default_rng(1).normal(
        size=(batch, cond_dim)).astype(np.float32))

    @jax.jit
    def run(state, key):
        def body(carry, i):
            s, _ = step(carry, (x, c), jax.random.fold_in(key, i))
            return s, None
        state, _ = jax.lax.scan(body, state, jnp.arange(inner))
        return state

    state = run(state, jax.random.PRNGKey(1))  # compile + warmup
    float(jnp.sum(jax.tree.leaves(state.params)[0]))  # sync
    t0 = time.perf_counter()
    for i in range(n_iters):
        state = run(state, jax.random.PRNGKey(2 + i))
    # fetch a scalar from the final state: exact sync
    float(jnp.sum(jax.tree.leaves(state.params)[0]))
    dt = time.perf_counter() - t0
    return inner * n_iters / dt


def bench_torch_cpu_baseline(device="cpu", batch=32, tokens=135, patch_dim=48):
    """Reference-equivalent net eval in eager torch, extrapolated to
    showers/sec — the measured side of BASELINE.md's "vs A100" anchor.

    Builds the same-size DiT (480/6x6) in plain torch.nn and times forward
    passes; showers/sec = batch / (80 evals * t_per_eval). Pass
    ``device="cuda"`` on a GPU host (e.g. an A100) to settle the
    ≥3x-A100 target with a direct measurement; ds3 shapes via
    ``tokens=450, patch_dim=90, batch=256``.
    """
    try:
        import torch
        import torch.nn as nn
    except ImportError:
        return float("nan")
    if device != "cpu" and not torch.cuda.is_available():
        return float("nan")

    hidden, depth, heads, cond_dim = 480, 6, 6, 46

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(hidden, elementwise_affine=False)
            self.attn = nn.MultiheadAttention(hidden, heads, batch_first=True)
            self.norm2 = nn.LayerNorm(hidden, elementwise_affine=False)
            self.mlp = nn.Sequential(
                nn.Linear(hidden, 4 * hidden), nn.GELU(), nn.Linear(4 * hidden, hidden)
            )
            self.ada = nn.Linear(hidden, 6 * hidden)

        def forward(self, x, c):
            s1, sc1, g1, s2, sc2, g2 = self.ada(torch.nn.functional.silu(c)).chunk(6, -1)
            h = self.norm1(x) * (1 + sc1[:, None]) + s1[:, None]
            x = x + g1[:, None] * self.attn(h, h, h, need_weights=False)[0]
            h = self.norm2(x) * (1 + sc2[:, None]) + s2[:, None]
            return x + g2[:, None] * self.mlp(h)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.x_emb = nn.Linear(patch_dim, hidden)
            self.c_emb = nn.Sequential(nn.Linear(cond_dim + 1, hidden), nn.SiLU(),
                                       nn.Linear(hidden, hidden))
            self.blocks = nn.ModuleList(Block() for _ in range(depth))
            self.final = nn.Linear(hidden, patch_dim)

        def forward(self, x, t, c):
            x = self.x_emb(x)
            c = self.c_emb(torch.cat([c, t], -1))
            for b in self.blocks:
                x = b(x, c)
            return self.final(x)

    net = Net().eval().to(device)
    x = torch.randn(batch, tokens, patch_dim, device=device)
    t = torch.rand(batch, 1, device=device)
    c = torch.randn(batch, cond_dim, device=device)
    with torch.inference_mode():
        net(x, t, c)  # warmup
        if device != "cpu":
            torch.cuda.synchronize()
        t0 = time.perf_counter()
        n_evals = 4 if device == "cpu" else 40
        for _ in range(n_evals):
            out = net(x, t, c)
        if device != "cpu":
            torch.cuda.synchronize()
        else:
            float(out.sum())
        dt_per_eval = (time.perf_counter() - t0) / n_evals
    return batch / (80 * dt_per_eval)


def _newest_healthy_capture(repo_dir):
    """Newest self-preserved bench capture, for the wedged-tunnel fallback:
    a wedged round's record then still references driver-comparable numbers.
    Newest by mtime (lexicographic would prefer `_partial` files and
    mis-order r10 before r9); preserved captures wrap the bench record
    under "parsed". An unreadable newest file (torn manual bank, disk
    full) falls back to the next-newest readable one — "healthy" means
    readable, not merely newest. Returns None when none is readable."""
    try:
        import glob
        caps = sorted(glob.glob(os.path.join(
            repo_dir, "BENCH_MIDROUND_r*.json")), key=os.path.getmtime)
    except Exception:
        return None
    for path in reversed(caps):
        try:
            with open(path) as f:
                cap = json.load(f)
            rec = cap.get("parsed", cap)
            return {"file": os.path.basename(path),
                    "value": rec.get("value"),
                    "extra": rec.get("extra")}
        except Exception:
            continue
    return None


def _probe_device(timeout_s=420.0):
    """Bounded liveness check: a wedged axon tunnel hangs device->host
    fetches forever (CLAUDE.md), which would leave the driver with NO
    json line at all. Run a tiny fetch on a watchdog thread; on timeout,
    emit a parseable failure record and hard-exit. The timeout leaves
    margin over the measured healthy first-fetch backlog (80-240 s), and
    the exit is os._exit after an explicit flush — sys.exit would run
    JAX/PJRT atexit teardown, which itself hangs on the wedged device
    before block-buffered stdout ever reaches the driver."""
    import threading

    ok = []

    def probe():
        import jax.numpy as jnp

        ok.append(float(jnp.zeros(()) + 1.0))

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if not ok:
        last_healthy = _newest_healthy_capture(
            os.path.dirname(os.path.abspath(__file__)))
        print(json.dumps({
            "metric": "calochallenge_ds2_sampling_throughput",
            "value": None,
            "unit": "showers/sec",
            "vs_baseline": None,
            "error": f"device unreachable: tiny fetch hung > {timeout_s:.0f}s "
                     "(wedged axon tunnel)",
            "last_healthy_capture": last_healthy,
        }))
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(2)


def _bank_partial(record):
    """Write the in-progress record after every metric (atomic replace): a
    mid-run wedge or kill then still leaves everything measured so far, and
    the wedged-probe fallback's newest-capture glob picks the file up."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_MIDROUND_r05_partial.json")
    try:
        with open(path + ".tmp", "w") as f:
            json.dump(record, f, indent=1)
        os.replace(path + ".tmp", path)
    except Exception:
        pass


def main():
    _probe_device()
    value, implied_tflops = bench_ds2()
    _bank_partial({"metric": "calochallenge_ds2_sampling_throughput",
                   "value": round(value, 2), "unit": "showers/sec",
                   "implied_tflops": round(implied_tflops, 1),
                   "note": "partial (headline only)", "extra": {}})

    extra = {}
    extra_specs = [
        ("ds3_sampling_showers_s", bench_ds3, "showers/sec"),
        ("ds2_train_it_s", bench_train_ds2, "it/sec (batch 64)"),
        ("ds3_train_it_s", bench_train_ds3, "it/sec (batch 16)"),
        ("ds1_sampling_showers_s", bench_ds1, "showers/sec"),
        ("cinn_ds2_showers_s", bench_cinn_ds2, "showers/sec"),
        ("energy_u_vec_s", bench_energy, "u-vectors/sec"),
        ("lemurs_showers_s", bench_lemurs, "showers/sec"),
        ("calohadronic_showers_s", bench_calohadronic, "showers/sec"),
        ("calogan_showers_s", bench_calogan, "showers/sec"),
        ("cinn_ds2_train_it_s", bench_train_cinn_ds2, "it/sec (batch 64)"),
        ("energy_ds2_train_it_s", bench_train_energy_ds2,
         "it/sec (batch 256)"),
    ]
    t_start = time.perf_counter()
    for name, fn, unit in extra_specs:
        if time.perf_counter() - t_start > EXTRA_TIME_BUDGET_S:
            extra[name] = {"value": None, "unit": unit, "vs_round1": None,
                           "skipped": "time_budget"}
            continue
        # a failure in one secondary metric must not kill the headline record
        try:
            v = fn()
            anchor = ROUND1.get(name)
            extra[name] = {
                "value": round(v, 2), "unit": unit,
                "vs_round1": (round(v / anchor, 3) if anchor else None),
            }
        except Exception:
            traceback.print_exc()
            extra[name] = {"value": None, "unit": unit, "vs_round1": None}
        _bank_partial({"metric": "calochallenge_ds2_sampling_throughput",
                       "value": round(value, 2), "unit": "showers/sec",
                       "implied_tflops": round(implied_tflops, 1),
                       "note": f"partial (through {name})", "extra": extra})

    baseline = bench_torch_cpu_baseline()
    vs = value / baseline if baseline == baseline else None  # NaN check
    print(json.dumps({
        "metric": "calochallenge_ds2_sampling_throughput",
        "value": round(value, 2),
        "unit": "showers/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "implied_tflops": round(implied_tflops, 1),
        # a v5e peaks at ~200 bf16 TFLOP/s; anything past ~300 means the
        # tunnel returned before the work ran (wedged-tunnel artifact)
        "suspect_timing": bool(implied_tflops > 300.0),
        "extra": extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
