"""Two-stage generation chain end-to-end: train a tiny energy model, train a
tiny shape ViT-CFM, then sample showers with sample_us=True — the energy model
is re-loaded from its run dir, u's are sampled and mapped through both
transform pipelines, and the shape model generates conditioned on them
(reference experiments/calochallenge/experiment.py:170-247)."""

import numpy as np
import pytest

from tests.conftest import make_binning_xml, make_shower_hdf5
from vit4hep_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # full e2e drive; run in snapshot/full suites

N_LAYERS, N_ALPHA, N_R = 4, 4, 3
N_VOX = N_LAYERS * N_ALPHA * N_R


@pytest.fixture
def geo(tmp_path):
    xml = make_binning_xml(tmp_path / "binning.xml", n_layers=N_LAYERS, n_r=N_R,
                           n_alpha=N_ALPHA)
    h5 = make_shower_hdf5(tmp_path / "showers.hdf5", n_events=256, n_voxels=N_VOX)
    return {"xml": str(xml), "h5": str(h5)}


def _base_cfg(tmp_path, geo):
    return {
        "exp_type": "calochallenge",
        "base_dir": str(tmp_path),
        "seed": 5,
        "save": True,
        "use_mlflow": False,
        "save_source": False,
        "ema": False,
        "train": True,
        "evaluate": False,
        "plot": False,
        "dtype": "float32",
        "evaluation": {"eval_dataset": "2", "batchsize": 64},
        "plotting": {"loss": False},
    }


def _energy_cfg(tmp_path, geo):
    cfg = _base_cfg(tmp_path, geo)
    cfg.update({
        "exp_name": "E2E_energy",
        "run_name": "energy",
        "model_type": "energy",
        "sample_us": False,
        "n_samples": 32,
        "data": {
            "training_file": geo["h5"], "test_file": geo["h5"],
            "particle_type": "electron", "xml_filename": geo["xml"],
            "train_val_frac": [0.9, 0.1],
            "transforms": {
                "NormalizeByElayer": {"ptype": geo["xml"], "xml_file": "electron"},
                "ScaleTotalEnergy": {"n_layers": N_LAYERS, "factor": 0.35},
                "SelectDims": {"start": -N_LAYERS, "end": 0},
                "ExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
                "StandardizeUsFromFile": {"n_us": N_LAYERS, "model_dir": None},
                "LogEnergy": {},
                "ScaleEnergy": {"e_min": 6.9, "e_max": 13.8},
                "Reshape": {"shape": [N_LAYERS]},
            },
        },
        "model": {
            "_target_": "models.base_model.CFM",
            "shape": [N_LAYERS],
            "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
            "net": {
                "_target_": "nn.cfm.transformer_cfm.ParallelTransformer",
                "param": {
                    "dims_in": N_LAYERS, "dims_c": 1, "dim_embedding": 16,
                    "nhead": 2, "num_encoder_layers": 1, "num_decoder_layers": 1,
                    "dim_feedforward": 32, "embeds": True, "encode_t_dim": 16,
                },
            },
        },
        "training": {
            "iterations": 20, "batchsize": 64, "batchsize_sample": 64,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 10, "log_every_n_steps": 0,
        },
    })
    return Config(cfg)


def _shape_cfg(tmp_path, geo):
    cfg = _base_cfg(tmp_path, geo)
    cfg.update({
        "exp_name": "E2E_shape",
        "run_name": "shape",
        "model_type": "shape",
        "sample_us": True,
        "energy_model": str(tmp_path / "runs" / "E2E_energy" / "energy"),
        "n_samples": 48,
        "data": {
            "training_file": geo["h5"], "test_file": geo["h5"],
            "particle_type": "electron", "xml_filename": geo["xml"],
            "train_val_frac": [0.9, 0.1],
            "transforms": {
                "NormalizeByElayer": {"ptype": geo["xml"], "xml_file": "electron"},
                "ScaleTotalEnergy": {"n_layers": N_LAYERS, "factor": 0.35},
                "CutValues": {"cut": 1.0e-7, "n_layers": N_LAYERS},
                "ExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
                "GlobalStandardizeFromFile": {"model_dir": None},
                "LogEnergy": {},
                "ScaleEnergy": {"e_min": 6.9, "e_max": 13.8},
                "AddFeaturesToCond": {"split_index": N_VOX},
                "Reshape": {"shape": [1, N_LAYERS, N_ALPHA, N_R]},
            },
        },
        "model": {
            "_target_": (
                "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM"
            ),
            "in_channels": 1,
            "shape": [N_LAYERS, N_ALPHA, N_R],
            "patch_shape": [1, 2, 1],
            "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
            "net": {
                "_target_": "nn.vit.ViT",
                "param": {
                    "dim": 3, "condition_dim": N_LAYERS + 1, "hidden_dim": 36,
                    "depth": 1, "num_heads": 2, "mlp_ratio": 1.0,
                    "num_patches": [[N_LAYERS, 2, N_R]], "patch_dim": 2,
                    "learn_pos_embed": True,
                },
            },
        },
        "training": {
            "iterations": 20, "batchsize": 64, "batchsize_sample": 64,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 10, "log_every_n_steps": 0,
        },
    })
    return Config(cfg)


def test_two_stage_chain(tmp_path, geo):
    from vit4hep_tpu.experiments.calochallenge import CaloChallenge

    # stage 1: energy model (u-vector CFM) — uses reference _target_ paths to
    # also exercise the remap table
    exp_e = CaloChallenge(_energy_cfg(tmp_path, geo))
    exp_e()
    assert (tmp_path / "runs" / "E2E_energy" / "energy" / "models" / "model_run0").exists()

    # stage 2: shape model trained, then the full two-stage sampling chain
    exp_s = CaloChallenge(_shape_cfg(tmp_path, geo))
    exp_s()
    samples, conds = exp_s.sample_n()
    assert samples.shape == (48, 1, N_LAYERS, N_ALPHA, N_R)
    assert conds.shape == (48, N_LAYERS + 1)  # [u's, scaled log-Einc]
    assert np.isfinite(samples).all()

    # invert the full pipeline back to physical voxels
    showers = np.asarray(samples)[:, 0]
    energies = np.asarray(conds)
    for fn in exp_s.transforms[::-1]:
        showers, energies = fn(showers, energies, rev=True)
    assert showers.shape == (48, N_VOX)
    assert np.isfinite(showers).all()
    assert (showers >= 0).all()  # physical energies after inversion
