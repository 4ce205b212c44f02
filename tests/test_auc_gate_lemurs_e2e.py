"""AUC adoption gate end-to-end for a NON-CaloChallenge family (VERDICT r4
next #5): the round-4 `cfm_lemurs_tpu`/`cfm_calohad_tpu`/`cfm_eplus_tpu`
variants ship with the instruction "AUC-validate once on adoption", but the
gate command (tools/validate_tpu_config.py) had only ever been driven for
the CaloChallenge experiment class. LEMURS is the risk path the verdict
names: dict-protocol transforms + collator-based data loading. This drives
the full recipe — train parity + variant configs through the LEMURS
experiment, sample via the collator truth-u path, run the classifier suite
(evaluation/lemurs.py run_from_py), parse AUCs, emit the verdict — on a
tiny synthetic LEMURS geometry.

Match: the family fidelity loop of
/root/reference/experiments/lemurs/evaluate.py:317-707."""

import os
import sys

import pytest
import yaml

from tests.conftest import make_binning_xml
from tests.test_lemurs import H, L, W, make_lemurs_file

pytestmark = pytest.mark.slow  # two full train+eval drives

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_CLASSES = 1


def _model_node(num_heads):
    return {
        "_target_": "vit4hep_tpu.models.lemurs.LEMURSCFM",
        "in_channels": 1,
        "shape": [L, W, H],
        "patch_shape": [1, W, 1],
        "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
        "net": {
            "_target_": "vit4hep_tpu.models.vit.ViT",
            "param": {
                "dim": 3, "condition_dim": L + 3 + NUM_CLASSES,
                "hidden_dim": 36, "depth": 1, "num_heads": num_heads,
                "mlp_ratio": 1.0, "num_patches": [[L, 1, H]], "patch_dim": W,
                "learn_pos_embed": True,
            },
        },
    }


def test_auc_gate_lemurs_end_to_end(tmp_path):
    files_train = {"DetA": [make_lemurs_file(tmp_path / "a1.h5", n=96, seed=1)]}
    files_test = {"DetA": [make_lemurs_file(tmp_path / "a2.h5", n=64, seed=2)]}
    ref_file = make_lemurs_file(tmp_path / "ref.h5", n=64, seed=3)
    # per-layer W*H = 3*4 voxels over L layers, electron tag (eval_dataset
    # "2" resolves particle electron in EvalArgs)
    xml = make_binning_xml(tmp_path / "binning.xml", particle="electron",
                           n_layers=L, n_r=W, n_alpha=H)

    cfg = {
        "exp_type": "lemurs",
        "exp_name": "AUCGateLEM",
        "base_dir": str(tmp_path),
        "seed": 11,
        "save": True, "use_mlflow": False, "save_source": False, "ema": False,
        "train": True, "evaluate": False, "plot": True,
        "dtype": "float32",
        "model_type": "shape", "sample_us": False, "n_samples": 32,
        "plotting": {"loss": False},
        "data": {
            "training_file_dict": files_train,
            "test_file_dict": files_test,
            "num_classes": NUM_CLASSES,
            "max_files_per_worker": 4,
            "gen_Einc": [1e3, 1e6],
            "gen_theta": [0.9, 2.2],
            "gen_phi": None,
            "gen_label_vector": [1],
            "return_us": False,
            "xml_filename": str(xml),
            "transforms": {
                "LEMURSNormalizeByElayer": {},
                "LEMURSExclusiveLogitTransform": {"delta": 1.0e-6,
                                                  "rescale": True},
                "LEMURSGlobalStandardizeFromFile": {"model_dir": None},
                "LEMURSStandardizeUsFromFile": {"n_us": L, "model_dir": None},
                "LEMURSPreprocessConds": {},
            },
        },
        "model": _model_node(num_heads=2),
        "training": {
            "iterations": 10, "batchsize": 32, "batchsize_sample": 32,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 5, "log_every_n_steps": 0,
        },
        "evaluation": {
            "eval_dataset": "2",     # LEMURS reuses ds2 eval options
            "eval_mode": "cls-low",  # one classifier proves the recipe
            "eval_cut": 1.0e-7,
            "eval_labels": ["tiny"],
            "eval_p_label": "",
            "eval_hdf5_file": str(ref_file),
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
    (cfg_dir / "model" / "cfm_lemurs").mkdir(parents=True)
    with open(cfg_dir / "auc_synth_lemurs.yaml", "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    # the variant group config — same capacity, different head count, the
    # exact shape of the cfm_lemurs_tpu adoption question
    with open(cfg_dir / "model" / "cfm_lemurs" / "tiny_tpu.yaml", "w") as f:
        yaml.safe_dump(_model_node(num_heads=1), f, sort_keys=False)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import validate_tpu_config

    rc = validate_tpu_config.main([
        "-cn", "auc_synth_lemurs", "-cp", str(cfg_dir),
        "--tpu-model", "cfm_lemurs/tiny_tpu", "--tol", "0.5",
    ])
    # tol 0.5 makes the verdict PASS whenever the machinery completes: this
    # test verifies the recipe end-to-end, not tiny-model fidelity
    assert rc == 0

    for run in ("auc_gate_parity", "auc_gate_tpu"):
        run_dir = tmp_path / "runs" / "AUCGateLEM" / run
        cls_files = list(run_dir.glob("eval_*/classifier_*.txt"))
        assert cls_files, f"no classifier outputs in {run_dir}"
        parsed = validate_tpu_config.parse_classifier_results(str(run_dir))
        assert "cls-low" in parsed
        for auc, jsd in parsed.values():
            assert 0.0 <= auc <= 1.0
