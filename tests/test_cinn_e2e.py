"""End-to-end cINN experiment: train a tiny shape cINN through the full
lifecycle (config -> transforms -> dataset -> jitted NLL train loop ->
checkpoint -> batched sampling) on synthetic data."""

import numpy as np
import pytest

from tests.conftest import make_binning_xml, make_shower_hdf5
from vit4hep_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # full e2e drive; run in snapshot/full suites


@pytest.fixture
def regular_geometry(tmp_path):
    """Regular 4-layer x 4-alpha x 3-r geometry (48 voxels)."""
    xml = make_binning_xml(tmp_path / "binning.xml", n_layers=4, n_r=3, n_alpha=4)
    h5 = make_shower_hdf5(tmp_path / "showers.hdf5", n_events=256, n_voxels=48)
    return {"xml": str(xml), "h5": str(h5)}


def _cfg(tmp_path, geo):
    return Config({
        "exp_type": "calochallenge",
        "exp_name": "TestCINN",
        "run_name": "cinn_e2e",
        "base_dir": str(tmp_path),
        "seed": 11,
        "save": True,
        "use_mlflow": False,
        "save_source": False,
        "ema": False,
        "train": True,
        "evaluate": False,
        "plot": False,
        "model_type": "shape",
        "sample_us": False,
        "n_samples": 32,
        "dtype": "float32",
        "data": {
            "training_file": geo["h5"],
            "test_file": geo["h5"],
            "particle_type": "electron",
            "xml_filename": geo["xml"],
            "train_val_frac": [0.9, 0.1],
            "transforms": {
                "NormalizeByElayer": {"ptype": geo["xml"], "xml_file": "electron"},
                "ScaleTotalEnergy": {"n_layers": 4, "factor": 0.35},
                "SelectiveUniformNoise": {
                    "a": 1.0e-7, "b": 1.0e-6, "cut": True,
                    "exclusions": [-4, -3, -2, -1],
                },
                "ExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
                "GlobalStandardizeFromFile": {"model_dir": None},
                "LogEnergy": {},
                "ScaleEnergy": {"e_min": 6.9, "e_max": 13.8},
                "AddFeaturesToCond": {"split_index": 48},
                "Reshape": {"shape": [1, 4, 4, 3]},
            },
        },
        "model": {
            "_target_": "experiments.calochallenge.calochallenge_cinn.model.CaloChallengeCINN",
            "in_channels": 1,
            "shape": [4, 4, 3],
            "patch_shape": [[1, 2, 1]],
            "coupling_block": "CaloRQSplineFrEIA",
            "nblocks": 2,
            "is_spatial": [False, False],
            "cinn_kwargs": {
                "bins": 4,
                "min_bin_sizes": [0.001, 0.001],
                "default_domain": [-8.0, 8.0, -8.0, 8.0],
                "identity_tails": False,
                "domain_clamping": None,
            },
            "vit_kwargs": {
                "dim": 1, "condition_dim": 5, "hidden_dim": 32, "out_channels": 1,
                "depth": 1, "num_heads": 2, "mlp_ratio": 1.0, "learn_pos_embed": True,
            },
        },
        "training": {
            "iterations": 30,
            "batchsize": 32,
            "batchsize_sample": 16,
            "optimizer": "Adam",
            "lr": 1e-3,
            "scheduler": None,
            "es_patience": 1000,
            "es_load_best_model": False,
            "validate_every_n_steps": 15,
            "log_every_n_steps": 0,
            "clip_grad_norm": 10.0,
        },
        "evaluation": {"eval_dataset": "2", "batchsize": 64},
        "plotting": {"loss": True},
    })


def test_cinn_experiment_end_to_end(tmp_path, regular_geometry):
    from vit4hep_tpu.experiments.calochallenge import CaloChallenge

    cfg = _cfg(tmp_path, regular_geometry)
    exp = CaloChallenge(cfg)
    exp()

    run_dir = tmp_path / "runs" / "TestCINN" / "cinn_e2e"
    assert (run_dir / "models" / "model_run0").exists()
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "loss_0.pdf").exists()

    # NLL went down over 30 steps on this tiny problem
    assert len(exp.train_loss) == 30
    assert exp.train_loss[-1] < exp.train_loss[0]

    # sampling path: truth u's from the test file + batched cinn inverse
    samples, conds = exp.sample_n()
    assert samples.shape == (256, 1, 4, 4, 3)
    assert np.isfinite(samples).all()
