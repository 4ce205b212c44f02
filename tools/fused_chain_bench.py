"""On-chip A/B: staged two-stage generation vs the fused one-program chain.

Measures generate(E_inc) -> shower end-to-end at ds2 scale (energy model
cfm_ds2_energy + shape model cfm_ds2_electrons, 45-u chain between them):

  staged  the experiments/calochallenge.py sample_n structure: energy
          batches dispatched then FETCHED to host, numpy u-transform chain,
          re-upload, shape batches dispatched (reference
          experiments/calochallenge/experiment.py:170-247)
  fused   experiments/fused_chain.make_fused_generate: ONE jitted program
          per batch (energy RK4 -> on-device u map -> shape RK4), all
          batches dispatched back-to-back, single fetch at the end

Run: python tools/fused_chain_bench.py [n_samples] (axon TPU; --smoke CPU)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH = 256


def _models():
    from vit4hep_tpu.utils.config import _load_yaml, instantiate

    e = instantiate(_load_yaml(os.path.join(
        _REPO, "configs", "model/cfm/cfm_ds2_energy.yaml")))
    s = instantiate(_load_yaml(os.path.join(
        _REPO, "configs", "model/cfm/cfm_ds2_electrons.yaml")))
    return e, s


def _transforms(tmp):
    """Representative u chains: the energy model's standardizer (reversed at
    generation) and the shape model's logit + standardizer (forward)."""
    from vit4hep_tpu.data.calochallenge.transforms import (
        ExclusiveLogitTransform, GlobalStandardizeFromFile)

    np.save(os.path.join(tmp, "means.npy"), np.float32(0.05))
    np.save(os.path.join(tmp, "stds.npy"), np.float32(1.2))
    e_chain = [GlobalStandardizeFromFile(model_dir=tmp)]
    # rescale=False clips into (delta, 1-delta) first — keeps the chain
    # NaN-free on arbitrary sampled u values (timing must not ride NaNs)
    s_chain = [ExclusiveLogitTransform(delta=1e-6, rescale=False),
               GlobalStandardizeFromFile(model_dir=tmp)]
    return e_chain, s_chain


def main(n_samples, smoke):
    from vit4hep_tpu.experiments.fused_chain import make_fused_generate

    e_model, s_model = _models()
    key = jax.random.PRNGKey(0)
    e_params = e_model.init_params(key)
    s_params = s_model.init_params(jax.random.fold_in(key, 1))
    tmp = tempfile.mkdtemp()
    e_chain, s_chain = _transforms(tmp)

    conds = (np.random.default_rng(0).uniform(0.0, 1.0, (n_samples, 1))
             .astype(np.float32))
    nb = n_samples // BATCH

    # ---- staged ------------------------------------------------------------
    e_fn = jax.jit(lambda p, c, k: e_model.sample_batch(p, c, k))
    s_fn = jax.jit(lambda p, c, k: s_model.sample_batch(p, c, k))

    def staged(seed):
        k = jax.random.PRNGKey(seed)
        pend = [e_fn(e_params, jnp.asarray(conds[i * BATCH:(i + 1) * BATCH]),
                     jax.random.fold_in(k, i)) for i in range(nb)]
        u = np.concatenate([np.asarray(p) for p in pend], axis=0)
        for fn in e_chain[::-1]:
            u, _ = fn(u, None, rev=True)
        for fn in s_chain:
            u, _ = fn(u, None)
        c2 = np.concatenate([np.asarray(u, np.float32), conds], axis=1)
        pend = [s_fn(s_params, jnp.asarray(c2[i * BATCH:(i + 1) * BATCH]),
                     jax.random.fold_in(k, 1000 + i)) for i in range(nb)]
        return float(sum(jnp.sum(p) for p in pend))

    # ---- fused -------------------------------------------------------------
    gen = jax.jit(make_fused_generate(s_model, e_model, e_chain, s_chain))

    def fused(seed):
        k = jax.random.PRNGKey(seed)
        pend = [gen(s_params, e_params,
                    jnp.asarray(conds[i * BATCH:(i + 1) * BATCH]),
                    jax.random.fold_in(k, i))[0] for i in range(nb)]
        return float(sum(jnp.sum(p) for p in pend))

    iters = 1 if smoke else 3
    for name, fn in (("staged", staged), ("fused", fused)):
        fn(0)  # compile + warm
        t0 = time.perf_counter()
        for i in range(iters):
            fn(1 + i)
        dt = time.perf_counter() - t0
        print(f"{name:7s} {n_samples * iters / dt:8.1f} showers/s "
              f"({dt / iters:.3f} s per {n_samples}-sample pass)", flush=True)


if __name__ == "__main__":
    smoke = "--smoke" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if smoke:
        BATCH = 16  # CPU plumbing check only — ds2 batches are TPU material
    n = int(args[0]) if args else (2 * BATCH if smoke else 4096)
    float(jnp.zeros(()))
    print(f"device: {jax.devices()[0].platform}, n={n}, batch {BATCH}")
    main(n, smoke)
