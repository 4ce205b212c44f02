"""Headline benchmark: CaloChallenge ds2 sampling throughput (showers/sec/chip).

Workload pinned to the reference definition (BASELINE.md):
- shape net  : ViT hidden 480, depth 6, 6 heads, mlp_ratio 4
               (reference configs/model/cfm/cfm_ds2_electrons.yaml:18-22)
- tokens     : 135 patches x patch_dim 48 (num_patches [[15,1,9]], patch [3,16,1])
- ODE solver : RK4, step_size 0.05, t in [0,1]  => 20 steps = 80 net evals/shower
- batch      : 256 (configs/training/default.yaml:3)

The sampler is one jitted XLA program per batch (x_T ~ N, lax.scan over the RK4
grid). ``vs_baseline`` is measured against an equivalent torch-CPU net eval
(the reference's own PyTorch stack on the CPU of this host), extrapolated to
showers/sec; the BASELINE.json target is >= 20x that number.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "showers/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 256
N_WARMUP = 1
N_ITERS = 8

DS2_MODEL_CFG = {
    "_target_": "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM",
    "in_channels": 1,
    "shape": [45, 16, 9],
    "patch_shape": [3, 16, 1],
    "time_distribution": "uniform",
    "trajectory": "linear",
    "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.05}},
    "net": {
        "_target_": "nn.vit.ViT",
        "param": {
            "dim": 3,
            "condition_dim": 46,
            "hidden_dim": 480,
            "out_channels": 1,
            "depth": 6,
            "num_heads": 6,
            "mlp_ratio": 4,
            "pos_embedding_coords": "cylindrical",
            "learn_pos_embed": True,
            "causal_attn": False,
            "checkpoint_grads": False,
            "num_patches": [[15, 1, 9]],
            "patch_dim": 48,
            "compute_dtype": "float32",
        },
    },
}


def _flops_per_shower() -> float:
    """Rough matmul FLOPs of one ds2 shower: 80 net evals of a 480-wide,
    depth-6 DiT over 135 tokens (12 H^2 MACs/token/block)."""
    hidden, depth, tokens, evals = 480, 6, 135, 80
    return 2 * 12 * hidden * hidden * tokens * depth * evals


def bench_jax() -> tuple[float, float]:
    """Returns (showers/sec, implied TFLOP/s).

    Each timed iteration ends in a device->host fetch of a scalar reduction of
    the sample, so the measurement is an exact synchronization (on some
    tunneled attachments ``block_until_ready`` returns before execution). The
    first fetch of a process can pay a large backlog penalty on a degraded
    tunnel — it is absorbed by a warm-up fetch before timing. The
    implied-TFLOPs figure still flags any residual timing artifact (a v5e
    peaks at ~200 bf16 TFLOP/s).
    """
    import jax
    import jax.numpy as jnp

    from vit4hep_tpu.utils.config import instantiate

    model = instantiate(DS2_MODEL_CFG)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    cond = jax.device_put(np.random.randn(BATCH, 46).astype(np.float32))

    # warm-up fetch: absorbs the first-transfer/backlog penalty of the link
    float(jnp.zeros(()))

    # scalar output -> the per-iteration sync is a 4-byte transfer
    fn = jax.jit(lambda p, c, k: jnp.sum(model.sample_batch(p, c, k)))
    for i in range(N_WARMUP):
        float(fn(params, cond, jax.random.fold_in(key, i)))

    t0 = time.perf_counter()
    for i in range(N_ITERS):
        s = float(fn(params, cond, jax.random.fold_in(key, 1000 + i)))
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    rate = BATCH * N_ITERS / dt
    return rate, rate * _flops_per_shower() / 1e12


def bench_torch_cpu_baseline() -> float:
    """Reference-equivalent net eval on torch CPU, extrapolated to showers/sec.

    Builds the same-size DiT (480/6x6, 135 tokens x 48) in plain torch.nn and
    times forward passes; showers/sec = batch / (80 evals * t_per_eval).
    """
    try:
        import torch
        import torch.nn as nn
    except ImportError:
        return float("nan")

    hidden, depth, heads, tokens, patch_dim, cond_dim = 480, 6, 6, 135, 48, 46

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

    net = Net().eval()
    batch = 32
    x = torch.randn(batch, tokens, patch_dim)
    t = torch.rand(batch, 1)
    c = torch.randn(batch, cond_dim)
    with torch.inference_mode():
        net(x, t, c)  # warmup
        t0 = time.perf_counter()
        n_evals = 4
        for _ in range(n_evals):
            net(x, t, c)
        dt_per_eval = (time.perf_counter() - t0) / n_evals
    return batch / (80 * dt_per_eval)


def main():
    value, implied_tflops = bench_jax()
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
    }))


if __name__ == "__main__":
    sys.exit(main())
