"""AOT sampler export (utils/serving.py + tools/export_sampler.py): artifact
round-trip parity with the live sampler, header integrity, shape guards, and
the run-dir CLI surface."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit4hep_tpu.models.cfm import CFM
from vit4hep_tpu.models.energy_transformer import ParallelTransformer
from vit4hep_tpu.utils.serving import (
    export_sampler,
    load_sampler,
    read_header,
    save_sampler,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_energy_cfm():
    net = ParallelTransformer(dict(
        dims_in=12, dims_c=1, dim_embedding=32, nhead=2,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=64,
        dropout=0.0, activation="relu", embeds=True, encode_t_scale=30,
        encode_t_dim=32,
    ))
    return CFM(net=net, shape=[12],
               odeint_kwargs={"method": "rk4", "options": {"step_size": 0.5}})


def test_export_roundtrip_matches_live_sampler(tmp_path):
    model = _tiny_energy_cfm()
    params = model.init_params(jax.random.PRNGKey(0))
    batch = 6

    path = tmp_path / "sampler.v4h"
    header = save_sampler(path, model, params, batch, meta={"note": "test"})
    assert header["batch"] == batch
    assert header["cond_dim"] == model.condition_dim
    assert header["meta"]["note"] == "test"
    assert read_header(path) == header

    sampler = load_sampler(path)
    cond = np.random.RandomState(0).randn(batch, 1).astype(np.float32)
    got = sampler(cond, seed=7)
    want = np.asarray(
        model.sample_batch(params, jnp.asarray(cond), jax.random.PRNGKey(7)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    assert got.shape == tuple(header["out_shape"])

    # same seed deterministic, different seed different draws
    np.testing.assert_array_equal(got, sampler(cond, seed=7))
    assert np.abs(got - sampler(cond, seed=8)).max() > 1e-3


def test_shape_and_magic_guards(tmp_path):
    model = _tiny_energy_cfm()
    params = model.init_params(jax.random.PRNGKey(1))
    blob = export_sampler(model, params, 4)
    path = tmp_path / "s.v4h"
    path.write_bytes(blob)
    sampler = load_sampler(path)
    with pytest.raises(ValueError, match="exported for cond shape"):
        sampler(np.zeros((5, 1), np.float32))

    bad = tmp_path / "bad.v4h"
    bad.write_bytes(b"NOTANART" + blob[8:])
    with pytest.raises(ValueError, match="not a vit4hep sampler artifact"):
        load_sampler(bad)


@pytest.fixture
def synthetic_run_dir(tmp_path, shower_file, geometry):
    """A real (tiny synthetic) trained run dir, as `main.py` would leave it."""
    from test_experiment_e2e import make_cfg
    from vit4hep_tpu.experiments.calochallenge import CaloChallenge

    cfg = make_cfg(tmp_path, shower_file, geometry, iterations=10)
    cfg.evaluate = False
    exp = CaloChallenge(cfg)
    exp()
    return tmp_path / "runs" / "TestE2E" / "run_e2e"


@pytest.mark.slow
def test_export_cli_from_run_dir(tmp_path, synthetic_run_dir):
    """tools/export_sampler.py packages a real (tiny synthetic) run dir and
    the artifact reproduces that run's sampling path."""
    run_dir = synthetic_run_dir
    out = tmp_path / "exported.v4h"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single CPU device: export needs no mesh
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_sampler.py"),
         "-cp", str(run_dir), "-cn", "config",
         "--batch", "8", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists()

    sampler = load_sampler(out)
    cond = np.random.RandomState(1).rand(8, sampler.cond_dim).astype(np.float32)
    got = sampler(cond, seed=3)
    assert got.shape[0] == 8
    assert np.isfinite(got).all()
