"""LEMURS energy-model experiment end-to-end: lazy multi-file pipeline ->
jitted training -> conditional (E, theta, phi) sampling -> u-space evaluation
plots + classifier."""

import numpy as np
import pytest

from tests.test_lemurs import H, L, W, make_lemurs_file
from vit4hep_tpu.utils.config import Config


@pytest.mark.slow
def test_lemurs_energy_experiment(tmp_path):
    from vit4hep_tpu.experiments.lemurs import LEMURS

    files_train = {
        "DetA": [make_lemurs_file(tmp_path / "a1.h5", n=96, seed=1),
                 make_lemurs_file(tmp_path / "a2.h5", n=96, seed=2)],
    }
    files_test = {"DetA": [make_lemurs_file(tmp_path / "a3.h5", n=96, seed=3)]}

    cfg = Config({
        "exp_type": "lemurs",
        "exp_name": "TestLEMURS",
        "run_name": "energy",
        "base_dir": str(tmp_path),
        "seed": 4,
        "save": True, "use_mlflow": False, "save_source": False, "ema": True,
        "train": True, "evaluate": False, "plot": True,
        "model_type": "energy", "sample_us": False, "n_samples": 64,
        "dtype": "float32",
        "data": {
            "training_file_dict": files_train,
            "test_file_dict": files_test,
            "num_classes": 1,
            "max_files_per_worker": 4,
            "return_us": True,
            "native_cache": str(tmp_path / "cache"),
            "gen_Einc": [1e3, 1e6],
            "gen_theta": [0.9, 2.2],
            "gen_phi": None,
            "gen_label_vector": [1],
            "xml_filename": "unused-for-energy",
            "transforms": {
                "LEMURSNormalizeByElayer": {},
                "LEMURSExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
                "LEMURSStandardizeUsFromFile": {"n_us": L, "model_dir": None},
                "LEMURSPreprocessConds": {},
            },
        },
        "model": {
            "_target_": "models.base_model.CFM",
            "shape": [L],
            "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
            "net": {
                "_target_": "nn.cfm.transformer_cfm.ParallelTransformer",
                "param": {
                    "dims_in": L, "dims_c": 3, "dim_embedding": 16, "nhead": 2,
                    "num_encoder_layers": 1, "num_decoder_layers": 1,
                    "dim_feedforward": 32, "embeds": False, "encode_t_dim": 16,
                },
            },
        },
        "training": {
            "iterations": 12, "batchsize": 32, "batchsize_sample": 32,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "ema_decay": 0.999, "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 6, "log_every_n_steps": 0,
        },
        "evaluation": {
            "eval_dataset": "2", "batchsize": 64,
            "eval_cls_n_layer": 1, "eval_cls_n_hidden": 32, "eval_cls_dropout": 0.0,
            "eval_cls_lr": 1e-3, "eval_cls_batch_size": 64, "eval_cls_n_epochs": 2,
            "eval_mode": "all",
        },
        "plotting": {"loss": False},
    })
    exp = LEMURS(cfg)
    exp()

    run_dir = tmp_path / "runs" / "TestLEMURS" / "energy"
    assert (run_dir / "models" / "model_run0").exists()
    assert len(exp.train_loss) == 12
    # native cache built and used
    assert any((tmp_path / "cache").glob("*.v4cache"))
    # plot() ran the u-space suite: per-u histograms + classifier AUC file
    eval_dir = run_dir / "eval_0"
    assert (eval_dir / "u0_dist.pdf").exists()
    assert (eval_dir / f"u{L - 1}_dist.pdf").exists()
    assert list(eval_dir.glob("classifier_*.txt"))
    # generated-sample archive in the LEMURS dict format
    assert (run_dir / "samples_0.hdf5").exists()
