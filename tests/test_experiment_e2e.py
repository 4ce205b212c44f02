"""End-to-end lifecycle on 8 virtual devices: config -> train -> checkpoint ->
sample -> warm-start resume. Uses a tiny CFM energy model on synthetic showers
(the CPU-runnable slice named in SURVEY.md section 7 step 2)."""

import jax
import numpy as np
import pytest

from vit4hep_tpu.experiments.calochallenge import CaloChallenge
from vit4hep_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # full e2e drive; run in snapshot/full suites


def make_cfg(tmp_path, shower_file, geometry, iterations=40):
    n_layers = geometry["n_layers"]
    return Config(
        {
            "exp_name": "TestE2E",
            "exp_type": "calochallenge",
            "run_name": "run_e2e",
            "base_dir": str(tmp_path),
            "jobid": None,
            "seed": 7,
            "debug": False,
            "dtype": "float32",
            "warm_start_idx": None,
            "save": True,
            "use_mlflow": True,
            "save_source": False,
            "ema": True,
            "train": True,
            "evaluate": True,
            "plot": False,
            "load_sample": False,
            "finetuning": False,
            "model_type": "energy",
            "sample_us": False,
            "n_samples": 300,
            "data": {
                "training_file": shower_file,
                "test_file": shower_file,
                "particle_type": geometry["particle"],
                "xml_filename": geometry["xml"],
                "train_val_frac": [0.8, 0.2],
                "transforms": {
                    "NormalizeByElayer": {"ptype": geometry["xml"], "xml_file": "electron"},
                    "ScaleTotalEnergy": {"factor": 0.35, "n_layers": n_layers},
                    "SelectDims": {"start": -n_layers, "end": 0},
                    "ExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
                    "StandardizeUsFromFile": {"n_us": n_layers, "model_dir": None},
                    "LogEnergy": {},
                    "ScaleEnergy": {"e_min": 6.907755, "e_max": 13.815510},
                    "Reshape": {"shape": [n_layers]},
                },
            },
            "training": {
                "iterations": iterations,
                "batchsize": 64,
                "batchsize_sample": 128,
                "optimizer": "AdamW",
                "betas": [0.9, 0.999],
                "eps": 1e-8,
                "weight_decay": 0.01,
                "lr": 1e-3,
                "scheduler": "CosineAnnealingLR",
                "scheduler_scale": 1,
                "cosanneal_eta_min": 0,
                "es_patience": 1000,
                "es_load_best_model": False,
                "log_every_n_steps": 10,
                "validate_every_n_steps": 20,
                "clip_grad_norm": 1000,
                "clip_grad_value": None,
                "max_grad_norm": None,
                "ema_decay": 0.999,
            },
            "evaluation": {"eval_dataset": "2", "batchsize": 128},
            "model": {
                "_target_": "models.base_model.CFM",
                "shape": [n_layers],
                "time_distribution": "uniform",
                "trajectory": "linear",
                "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.1}},
                "net": {
                    "_target_": "nn.cfm.transformer_cfm.ParallelTransformer",
                    "param": {
                        "dims_in": n_layers,
                        "dims_c": 1,
                        "dim_embedding": 16,
                        "nhead": 2,
                        "num_encoder_layers": 1,
                        "num_decoder_layers": 1,
                        "dim_feedforward": 32,
                        "embeds": True,
                        "encode_t_dim": 16,
                    },
                },
            },
        }
    )


@pytest.fixture
def trained_exp(tmp_path, shower_file, geometry):
    cfg = make_cfg(tmp_path, shower_file, geometry)
    exp = CaloChallenge(cfg)
    exp()
    return exp


def test_full_lifecycle(trained_exp, tmp_path):
    exp = trained_exp
    run_dir = tmp_path / "runs" / "TestE2E" / "run_e2e"
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "models" / "model_run0").exists()
    # metrics landed in the JSONL tracker
    tracker_files = list((tmp_path / "runs" / "TestE2E" / "tracking").glob("*.jsonl"))
    assert tracker_files
    # loss finite, training ran, validation recorded
    assert len(exp.train_loss) > 0
    assert all(np.isfinite(v) for v in exp.train_loss)
    assert len(exp.val_loss) >= 2
    assert int(exp.state.step) == 40
    # EMA params exist AND differ from raw params (a no-op EMA update would
    # leave them equal to params modulo nothing)
    assert exp.state.ema_params is not None
    leaf = jax.tree_util.tree_leaves(exp.state.params)[0]
    ema_leaf = jax.tree_util.tree_leaves(exp.state.ema_params)[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(ema_leaf))


def test_sampling(trained_exp):
    exp = trained_exp
    samples, conds = exp.sample_n()
    assert samples.shape == (300, 5)
    assert conds.shape == (300, 1)
    assert np.all(np.isfinite(samples))


def test_warm_start_resume(trained_exp, tmp_path, shower_file, geometry):
    cfg2 = make_cfg(tmp_path, shower_file, geometry, iterations=10)
    cfg2.warm_start_idx = 0
    cfg2.run_idx = 0
    cfg2.run_dir = str(tmp_path / "runs" / "TestE2E" / "run_e2e")
    exp2 = CaloChallenge(cfg2)
    exp2()
    # resumed from step 40, ran 10 more
    assert int(exp2.state.step) == 50
    assert (tmp_path / "runs" / "TestE2E" / "run_e2e" / "models" / "model_run1").exists()


def test_loss_decreases(tmp_path, shower_file, geometry):
    cfg = make_cfg(tmp_path, shower_file, geometry, iterations=150)
    cfg.run_name = "run_lossdec"
    cfg.use_mlflow = False
    exp = CaloChallenge(cfg)
    exp()
    first = np.mean(exp.train_loss[:10])
    last = np.mean(exp.train_loss[-10:])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_sample_without_retraining(tmp_path, shower_file, geometry):
    """`train=false warm_start_idx=K` samples an existing run without training
    — incl. EMA disabled (None ema_params must survive the orbax round trip)."""
    cfg = make_cfg(tmp_path, shower_file, geometry, iterations=15)
    cfg.run_name = "run_noema"
    cfg.ema = False
    cfg.use_mlflow = False
    CaloChallenge(cfg)()

    cfg2 = make_cfg(tmp_path, shower_file, geometry)
    cfg2.run_name = "run_noema"
    cfg2.ema = False
    cfg2.use_mlflow = False
    cfg2.train = False
    cfg2.warm_start_idx = 0
    cfg2.run_idx = 0
    cfg2.run_dir = str(tmp_path / "runs" / "TestE2E" / "run_noema")
    exp2 = CaloChallenge(cfg2)
    exp2()  # full_run with train=False must still init + restore the state
    assert int(exp2.state.step) == 15
    assert exp2.state.ema_params is None
    samples, conds = exp2.sample_n()
    assert samples.shape == (300, 5)
    assert np.all(np.isfinite(samples))


def test_profiler_window(tmp_path, shower_file, geometry):
    """profile=true captures a jax.profiler trace of steps [10, 20) into
    <run_dir>/profile (SURVEY.md section 5 tracing hook)."""
    cfg = make_cfg(tmp_path, shower_file, geometry, iterations=25)
    cfg.run_name = "run_profile"
    cfg.profile = True
    cfg.use_mlflow = False
    CaloChallenge(cfg)()
    trace_dir = tmp_path / "runs" / "TestE2E" / "run_profile" / "profile"
    assert trace_dir.exists()
    # the trace lands as plugins/profile/<ts>/*.xplane.pb
    assert list(trace_dir.rglob("*.xplane.pb"))

def test_generate_einc_ds1_spectrum():
    """ds1 spectrum: 10x counts for 2^8..2^18, thinned 5/3/2/1 for 2^19..2^22
    (reference experiment.py:149-168)."""
    from vit4hep_tpu.experiments.calochallenge import CaloChallenge

    from types import SimpleNamespace

    e = CaloChallenge.generate_Einc_ds1(SimpleNamespace(), sample_multiplier=3)
    vals, counts = np.unique(e, return_counts=True)
    np.testing.assert_allclose(vals, 2.0 ** np.arange(8, 23), rtol=1e-12)
    expected = np.array([10] * 11 + [5, 3, 2, 1]) * 3
    np.testing.assert_array_equal(counts, expected)
    assert len(e) == 121 * 3


def test_reduce_lr_on_plateau_scale():
    """Host-driven ReduceLROnPlateau: lr_scale multiplies down after
    `patience` non-improving validations, then the counter resets."""
    import jax.numpy as jnp

    from vit4hep_tpu.experiments.base import BaseExperiment
    from vit4hep_tpu.experiments.train_state import TrainState

    class _Shim:
        plateau = {"factor": 0.5, "patience": 2, "best": float("inf"), "bad": 0}
        state = TrainState(
            params=None, opt_state=None, ema_params=None,
            step=jnp.zeros((), jnp.int32), ema_updates=jnp.zeros((), jnp.int32),
            lr_scale=jnp.ones((), jnp.float32),
        )

    shim = _Shim()
    BaseExperiment._plateau_step(shim, 1.0)   # improves (best=1.0)
    BaseExperiment._plateau_step(shim, 1.1)   # bad=1
    BaseExperiment._plateau_step(shim, 1.2)   # bad=2
    assert float(shim.state.lr_scale) == 1.0
    BaseExperiment._plateau_step(shim, 1.3)   # bad=3 > patience -> scale 0.5
    assert float(shim.state.lr_scale) == 0.5
    assert shim.plateau["bad"] == 0
    BaseExperiment._plateau_step(shim, 0.5)   # new best resets
    assert shim.plateau["best"] == 0.5


def test_training_fidelity(tmp_path, shower_file, geometry):
    """Statistical fidelity, not just loss decrease: after a short training the
    sampled u-vector distribution matches the training data's per-dimension
    moments (measured headroom: mean absdiff ~0.02, std ratios 0.90-1.03 at
    600 iterations — asserted with wide margins)."""
    cfg = make_cfg(tmp_path, shower_file, geometry, iterations=600)
    cfg.run_name = "run_fidelity"
    cfg.use_mlflow = False
    cfg.n_samples = 2000
    cfg.training.validate_every_n_steps = 200
    exp = CaloChallenge(cfg)
    exp()
    samples, _ = exp.sample_n()
    samples = np.asarray(samples)
    data = exp.train_dataset.layers
    assert np.abs(samples.mean(0) - data.mean(0)).max() < 0.15
    ratios = samples.std(0) / data.std(0)
    assert ratios.min() > 0.7 and ratios.max() < 1.3


def test_debug_backend_hooks():
    """cfg.debug=true enables jax_debug_nans (the reference's
    set_detect_anomaly analogue, base_experiment.py:30) and the run-end peak
    memory report never raises (CPU backend exposes no peak stats)."""
    exp = object.__new__(CaloChallenge)
    exp.cfg = Config(
        {"debug": True, "num_devices": 1, "model_parallel": 1, "dtype": "float32"}
    )
    try:
        exp._init_backend()
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)
    exp._log_peak_memory()
