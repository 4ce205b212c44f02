"""Fused two-stage generation: one jitted program == the staged chain.

Trains the same tiny energy + shape models as test_two_stage_e2e, then:
- `fused_generation: true` routes sample_n through ONE jitted program per
  batch (energy RK4 -> on-device u mapping -> shape RK4,
  experiments/fused_chain.py) and must reproduce a manually-staged run with
  IDENTICAL keys to f32 tolerance (the only difference is numpy f64 vs
  on-device f32 arithmetic in the u mapping);
- the AOT generator export (utils/serving.export_generator) round-trips
  and reproduces the fused program's output for the same seed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_two_stage_e2e import (  # noqa: F401  (geo fixture)
    N_ALPHA, N_LAYERS, N_R, N_VOX, _energy_cfg, _shape_cfg, geo)

pytestmark = pytest.mark.slow  # full e2e drive; run in snapshot/full suites


def test_fused_generation_matches_staged(tmp_path, geo):
    from vit4hep_tpu.experiments.calochallenge import CaloChallenge
    from vit4hep_tpu.experiments.fused_chain import make_fused_generate

    exp_e = CaloChallenge(_energy_cfg(tmp_path, geo))
    exp_e()

    cfg = _shape_cfg(tmp_path, geo)
    cfg["fused_generation"] = True
    cfg["n_samples"] = 32
    exp_s = CaloChallenge(cfg)
    exp_s()

    # pin the key state, run the fused path
    exp_s.base_key = jax.random.PRNGKey(123)
    samples_f, conds_f = exp_s.sample_n()
    assert samples_f.shape == (32, 1, N_LAYERS, N_ALPHA, N_R)
    assert conds_f.shape == (32, N_LAYERS + 1)
    assert np.isfinite(samples_f).all()

    # manually-staged run with the SAME keys: energy sample on device, u
    # mapping in numpy (the staged path's loops), shape sample on device
    exp_s.base_key = jax.random.PRNGKey(123)
    key, exp_s.base_key = jax.random.split(exp_s.base_key)

    # reconstruct the conditions the fused run used: Einc depends only on
    # np.random state? No — sample_n regenerates Einc each call. Instead
    # drive both stages directly from the fused run's returned conditions:
    # conds_f = [u_mapped | cond], so cond = conds_f[:, -1:]
    cond = np.asarray(conds_f[:, N_LAYERS:], np.float32)
    k_b = jax.random.fold_in(key, 0)  # batch 0 (single batch of 32... pad?)

    # the fused path pads each batch to batchsize_sample (64) — replicate
    pad = np.concatenate([cond, np.tile(cond[-1:], (64 - 32, 1))], axis=0)
    k_u, k_s = jax.random.split(k_b)
    u = np.asarray(exp_s.energy_model.sample_batch(
        exp_s.energy_model_params, jnp.asarray(pad), k_u))
    for fn in exp_s.energy_model_transforms[::-1]:
        if hasattr(fn, "u_transform"):
            u, _ = fn(u, None, rev=True)
    for fn in exp_s.transforms:
        if hasattr(fn, "u_transform"):
            u, _ = fn(u, None)
    cond2 = np.concatenate([np.asarray(u, np.float32), pad], axis=1)
    staged = np.asarray(exp_s.model.sample_batch(
        exp_s.state.params, jnp.asarray(cond2), k_s))[:32]

    np.testing.assert_allclose(np.asarray(conds_f), cond2[:32],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(samples_f), staged,
                               rtol=2e-3, atol=2e-3)

    # AOT generator export round trip
    from vit4hep_tpu.utils.serving import load_sampler, save_generator

    path = tmp_path / "generator.v4h"
    hdr = save_generator(
        path, exp_s.model, exp_s.state.params, exp_s.energy_model,
        exp_s.energy_model_params, exp_s.energy_model_transforms,
        exp_s.transforms, 8, cond_dim=1,
    )
    assert hdr["kind"] == "generator"
    gen = load_sampler(path)
    out = gen(np.asarray(cond[:8], np.float32), seed=7)
    assert out.shape == (8, 1, N_LAYERS, N_ALPHA, N_R)
    assert np.isfinite(out).all()

    # the artifact must equal the in-process fused program for the same seed
    fused = make_fused_generate(
        exp_s.model, exp_s.energy_model, exp_s.energy_model_transforms,
        exp_s.transforms)
    direct, _ = fused(exp_s.state.params, exp_s.energy_model_params,
                      jnp.asarray(cond[:8]), jax.random.PRNGKey(7))
    np.testing.assert_allclose(out, np.asarray(direct), rtol=1e-5, atol=1e-5)

    # the --generator CLI export over the real run dirs reproduces it too
    from tools.export_sampler import main as export_main

    cli_path = tmp_path / "cli_generator.v4h"
    export_main(["-cp", str(tmp_path / "runs" / "E2E_shape" / "shape"),
                 "-cn", "config", "--generator", "--batch", "8",
                 "--out", str(cli_path)])
    g_cli = load_sampler(cli_path)
    assert g_cli.header["kind"] == "generator"
    out_cli = g_cli(np.asarray(cond[:8], np.float32), seed=7)
    np.testing.assert_allclose(out_cli, np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_unsupported_transform_falls_back(tmp_path, geo):
    """A u-transform without a device twin must raise UnsupportedTransform
    from the chain builder (sample_n catches it and stays staged)."""
    from vit4hep_tpu.experiments.fused_chain import (
        UnsupportedTransform, device_u_chain)

    class Exotic:
        u_transform = True

    with pytest.raises(UnsupportedTransform):
        device_u_chain([Exotic()], [])
