"""AUC adoption gate end-to-end on synthetic data (BASELINE.md "Fidelity-gate
caveat"): the exact one-command recipe — train parity + TPU-variant configs,
sample, run the classifier suite, parse AUCs, emit the gate verdict —
exercised through ``tools/validate_tpu_config.main`` on a tiny synthetic
photon geometry. This is the in-environment verification the caveat
paragraph promises; only the dataset-constant voxel count is adapted to the
synthetic geometry (the real-data run needs no such patch)."""

import os
import sys

import pytest
import yaml

from tests.conftest import make_binning_xml, make_shower_hdf5

pytestmark = pytest.mark.slow  # two full train+eval drives

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_LAYERS, N_ALPHA, N_R = 4, 4, 3
N_VOX = N_LAYERS * N_ALPHA * N_R


def _model_node(num_heads):
    return {
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
                "depth": 1, "num_heads": num_heads, "mlp_ratio": 1.0,
                "num_patches": [[N_LAYERS, 2, N_R]], "patch_dim": 2,
                "learn_pos_embed": True,
            },
        },
    }


def _cinn_model_node(hidden):
    return {
        "_target_": (
            "experiments.calochallenge.calochallenge_cinn.model.CaloChallengeCINN"
        ),
        "in_channels": 1,
        "shape": [N_LAYERS, N_ALPHA, N_R],
        "patch_shape": [[1, 2, 1]],
        "coupling_block": "CaloRQSplineFrEIA",
        "nblocks": 2,
        "is_spatial": [False, False],
        "cinn_kwargs": {
            "fused_spline": False, "bins": 4,
            "min_bin_sizes": [0.001, 0.001],
            "default_domain": [-8.0, 8.0, -8.0, 8.0],
            "identity_tails": False, "domain_clamping": None,
        },
        "vit_kwargs": {
            "dim": 1, "condition_dim": N_LAYERS + 1, "hidden_dim": hidden,
            "out_channels": 1, "depth": 1, "num_heads": 2, "mlp_ratio": 1.0,
            "temperature": 10000, "learn_pos_embed": True,
            "causal_attn": False,
        },
    }


def test_auc_gate_cinn_synthetic_end_to_end(tmp_path, monkeypatch):
    """The gate command works for cINN configs too (VERDICT r4 next #3:
    `cinn_ds2_electrons_tpu.yaml` widens the ViT1D subnets to hidden 256,
    and its adoption instruction depends on this recipe running for the
    max-likelihood model class — train, inverse-sample, classifier AUC)."""
    xml = make_binning_xml(tmp_path / "binning.xml", particle="photon",
                           n_layers=N_LAYERS, n_r=N_R, n_alpha=N_ALPHA)
    h5 = make_shower_hdf5(tmp_path / "showers.hdf5", n_events=512,
                          n_voxels=N_VOX)

    cfg = {
        "exp_type": "calochallenge",
        "exp_name": "AUCGateCINN",
        "base_dir": str(tmp_path),
        "seed": 11,
        "save": True, "use_mlflow": False, "save_source": False, "ema": False,
        "train": True, "evaluate": False, "plot": True,
        "dtype": "float32",
        "model_type": "shape", "sample_us": False, "n_samples": 128,
        "plotting": {"loss": False},
        "data": {
            "training_file": str(h5), "test_file": str(h5),
            "particle_type": "photon", "xml_filename": str(xml),
            "train_val_frac": [0.9, 0.1],
            "transforms": {
                "NormalizeByElayer": {"ptype": str(xml), "xml_file": "photon"},
                "ScaleTotalEnergy": {"n_layers": N_LAYERS, "factor": 0.35},
                "SelectiveUniformNoise": {"a": 1.0e-7, "b": 1.0e-6,
                                          "cut": True,
                                          "exclusions": list(range(-N_LAYERS, 0))},
                "ExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
                "GlobalStandardizeFromFile": {"model_dir": None},
                "LogEnergy": {},
                "ScaleEnergy": {"e_min": 6.9, "e_max": 13.8},
                "AddFeaturesToCond": {"split_index": N_VOX},
                "Reshape": {"shape": [1, N_LAYERS, N_ALPHA, N_R]},
            },
        },
        "model": _cinn_model_node(hidden=16),
        "training": {
            "iterations": 15, "batchsize": 64, "batchsize_sample": 64,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 10, "log_every_n_steps": 0,
        },
        "evaluation": {
            "eval_dataset": "1-photons",
            "eval_mode": "cls-low",
            "eval_cut": 1.0e-7,
            "eval_labels": ["tiny"],
            "eval_p_label": "",
            "eval_hdf5_file": str(h5),
            "eval_cls_n_layer": 1,
            "eval_cls_n_hidden": 32,
            "eval_cls_dropout": 0.0,
            "eval_cls_lr": 1.0e-3,
            "eval_cls_batch_size": 256,
            "eval_cls_n_epochs": 2,
            "eval_cls_save_mem": True,
        },
    }

    cfg_dir = tmp_path / "configs"
    (cfg_dir / "model" / "cinn").mkdir(parents=True)
    with open(cfg_dir / "auc_synth_cinn.yaml", "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    # the variant widens the subnets — the exact shape of the
    # cinn_ds2_electrons_tpu (hidden 192 -> 256) adoption question
    with open(cfg_dir / "model" / "cinn" / "tiny_tpu.yaml", "w") as f:
        yaml.safe_dump(_cinn_model_node(hidden=24), f, sort_keys=False)

    from vit4hep_tpu.evaluation import ugr_evaluation

    monkeypatch.setitem(ugr_evaluation.DATASET_NUM_FEATURES, "1-photons", N_VOX)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import validate_tpu_config

    rc = validate_tpu_config.main([
        "-cn", "auc_synth_cinn", "-cp", str(cfg_dir),
        "--tpu-model", "cinn/tiny_tpu", "--tol", "0.5",
    ])
    assert rc == 0

    for run in ("auc_gate_parity", "auc_gate_tpu"):
        run_dir = tmp_path / "runs" / "AUCGateCINN" / run
        parsed = validate_tpu_config.parse_classifier_results(str(run_dir))
        assert "cls-low" in parsed
        for auc, jsd in parsed.values():
            assert 0.0 <= auc <= 1.0


def test_auc_gate_synthetic_end_to_end(tmp_path, monkeypatch):
    xml = make_binning_xml(tmp_path / "binning.xml", particle="photon",
                           n_layers=N_LAYERS, n_r=N_R, n_alpha=N_ALPHA)
    h5 = make_shower_hdf5(tmp_path / "showers.hdf5", n_events=512,
                          n_voxels=N_VOX)

    cfg = {
        "exp_type": "calochallenge",
        "exp_name": "AUCGate",
        "base_dir": str(tmp_path),
        "seed": 11,
        "save": True,
        "use_mlflow": False,
        "save_source": False,
        "ema": False,
        "train": True,
        "evaluate": False,
        # the classifier suite runs under plot() -> run_from_py, mirroring
        # the reference experiment's structure
        "plot": True,
        "dtype": "float32",
        "model_type": "shape",
        "sample_us": False,
        "n_samples": 128,
        "plotting": {"loss": False},
        "data": {
            "training_file": str(h5), "test_file": str(h5),
            "particle_type": "photon", "xml_filename": str(xml),
            "train_val_frac": [0.9, 0.1],
            "transforms": {
                "NormalizeByElayer": {"ptype": str(xml), "xml_file": "photon"},
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
        "model": _model_node(num_heads=2),
        "training": {
            "iterations": 15, "batchsize": 64, "batchsize_sample": 64,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 10, "log_every_n_steps": 0,
        },
        "evaluation": {
            "eval_dataset": "1-photons",   # no ResNet tier for ds1
            "eval_mode": "all-cls",
            "eval_cut": 1.0e-7,
            "eval_labels": ["tiny"],
            "eval_p_label": "",
            "eval_hdf5_file": str(h5),
            "eval_cls_n_layer": 1,
            "eval_cls_n_hidden": 32,
            "eval_cls_dropout": 0.0,
            "eval_cls_lr": 1.0e-3,
            "eval_cls_batch_size": 256,
            "eval_cls_n_epochs": 2,
            "eval_cls_save_mem": True,
        },
    }

    cfg_dir = tmp_path / "configs"
    (cfg_dir / "model" / "cfm").mkdir(parents=True)
    with open(cfg_dir / "auc_synth.yaml", "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    # the TPU-variant group config: same capacity, different head count —
    # exactly the shape of the real cfm_*_tpu adoption question
    with open(cfg_dir / "model" / "cfm" / "tiny_tpu.yaml", "w") as f:
        yaml.safe_dump(_model_node(num_heads=1), f, sort_keys=False)

    from vit4hep_tpu.evaluation import ugr_evaluation

    monkeypatch.setitem(ugr_evaluation.DATASET_NUM_FEATURES, "1-photons", N_VOX)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import validate_tpu_config

    rc = validate_tpu_config.main([
        "-cn", "auc_synth", "-cp", str(cfg_dir),
        "--tpu-model", "cfm/tiny_tpu", "--tol", "0.5",
    ])
    # tol 0.5 makes the verdict PASS whenever the machinery completes: this
    # test verifies the recipe end-to-end, not tiny-model fidelity
    assert rc == 0

    for run in ("auc_gate_parity", "auc_gate_tpu"):
        run_dir = tmp_path / "runs" / "AUCGate" / run
        cls_files = list(run_dir.glob("eval_*/classifier_*.txt"))
        assert cls_files, f"no classifier outputs in {run_dir}"
        parsed = validate_tpu_config.parse_classifier_results(str(run_dir))
        assert set(parsed) >= {"cls-low", "cls-high"}
        for auc, jsd in parsed.values():
            assert 0.0 <= auc <= 1.0
