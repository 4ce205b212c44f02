"""Fine-tuning experiment end-to-end: train a tiny ViT-CFM backbone, then run
CaloChallengeFTCFM onto a different geometry — backbone config swap, weight
transfer with embedder surgery, 3-group optimizer, training, sampling."""

import numpy as np
import pytest

from tests.conftest import make_binning_xml, make_shower_hdf5
from vit4hep_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # full e2e drive; run in snapshot/full suites

# backbone geometry: 4 layers x 4 alpha x 3 r; target: 4 layers x 2 alpha x 3 r
BB = dict(n_layers=4, n_alpha=4, n_r=3)
TG = dict(n_layers=4, n_alpha=2, n_r=3)


def _geo(tmp_path, tag, n_layers, n_alpha, n_r, seed):
    n_vox = n_layers * n_alpha * n_r
    xml = make_binning_xml(tmp_path / f"binning_{tag}.xml", n_layers=n_layers,
                           n_r=n_r, n_alpha=n_alpha)
    h5 = make_shower_hdf5(tmp_path / f"showers_{tag}.hdf5", n_events=192,
                          n_voxels=n_vox, seed=seed)
    return {"xml": str(xml), "h5": str(h5), "n_vox": n_vox, "shape": [n_layers, n_alpha, n_r]}


def _shape_cfg(tmp_path, geo, exp_name, run_name, cond_dim, patch_grid, patch_dim):
    return {
        "exp_type": "calochallenge",
        "exp_name": exp_name,
        "run_name": run_name,
        "base_dir": str(tmp_path),
        "seed": 2,
        "save": True, "use_mlflow": False, "save_source": False, "ema": False,
        "train": True, "evaluate": False, "plot": False,
        "model_type": "shape", "sample_us": False, "n_samples": 16,
        "dtype": "float32",
        "data": {
            "training_file": geo["h5"], "test_file": geo["h5"],
            "particle_type": "electron", "xml_filename": geo["xml"],
            "train_val_frac": [0.9, 0.1],
            "transforms": {
                "NormalizeByElayer": {"ptype": geo["xml"], "xml_file": "electron"},
                "ScaleTotalEnergy": {"n_layers": geo["shape"][0], "factor": 0.35},
                "ExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
                "GlobalStandardizeFromFile": {"model_dir": None},
                "LogEnergy": {},
                "ScaleEnergy": {"e_min": 6.9, "e_max": 13.8},
                "AddFeaturesToCond": {"split_index": geo["n_vox"]},
                "Reshape": {"shape": [1] + geo["shape"]},
            },
        },
        "model": {
            "_target_": (
                "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM"
            ),
            "in_channels": 1,
            "shape": geo["shape"],
            "patch_shape": [1, geo["shape"][1], 1],
            "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
            "net": {
                "_target_": "nn.vit.ViT",
                "param": {
                    "dim": 3, "condition_dim": cond_dim, "hidden_dim": 36,
                    "depth": 1, "num_heads": 2, "mlp_ratio": 1.0,
                    "num_patches": [patch_grid], "patch_dim": patch_dim,
                    "learn_pos_embed": True,
                },
            },
        },
        "training": {
            "iterations": 15, "batchsize": 32, "batchsize_sample": 32,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 10, "log_every_n_steps": 0,
        },
        "evaluation": {"eval_dataset": "2", "batchsize": 64},
        "plotting": {"loss": False},
    }


def test_finetune_experiment(tmp_path):
    from vit4hep_tpu.experiments.calochallenge import CaloChallenge
    from vit4hep_tpu.experiments.calochallenge_finetuning import CaloChallengeFTCFM

    # 1) train + checkpoint the backbone (patch_dim 4 = 1*4*1, cond 5)
    bb_geo = _geo(tmp_path, "bb", seed=0, **BB)
    bb_cfg = Config(_shape_cfg(
        tmp_path, bb_geo, "FT_backbone", "bb", cond_dim=BB["n_layers"] + 1,
        patch_grid=[4, 1, 3], patch_dim=4,
    ))
    CaloChallenge(bb_cfg)()
    bb_run = tmp_path / "runs" / "FT_backbone" / "bb"
    assert (bb_run / "models" / "model_run0").exists()

    # 2) fine-tune onto the target geometry (patch_dim 2 = 1*2*1, cond 5)
    tg_geo = _geo(tmp_path, "tg", seed=1, **TG)
    ft_cfg_dict = _shape_cfg(
        tmp_path, tg_geo, "FT_target", "ft", cond_dim=TG["n_layers"] + 1,
        patch_grid=[4, 1, 3], patch_dim=2,
    )
    ft_cfg_dict["exp_type"] = "calochallenge_ft_cfm"
    ft_cfg_dict["finetuning"] = {
        "backbone_cfg": str(bb_run / "config_0.yaml"),
        "backbone_lr": 1e-5, "head_lr": 1e-3, "embedder_lr": 1e-3,
        "map_x_embedding": True, "map_c_embedding": False,
        "reinitialize_x_embedding": False, "reinitialize_c_embedding": False,
        "reinitialize_pos_embedding": True, "reinitialize_final_layer": True,
        "interpolate": False,
    }
    exp = CaloChallengeFTCFM(Config(ft_cfg_dict))
    exp()

    # trained and checkpointed
    assert (tmp_path / "runs" / "FT_target" / "ft" / "models" / "model_run0").exists()
    assert len(exp.train_loss) == 15
    assert all(np.isfinite(v) for v in exp.train_loss)

    # backbone blocks were transferred: mapper exists, embedder input is the
    # target patch dim, x_embedder keeps the backbone's
    p = exp.state.params["params"]
    assert "x_mapper" in p
    assert p["x_mapper"]["kernel"].shape[0] == 2  # target patch_dim
    assert p["x_embedder"]["kernel"].shape == (4, 36)  # backbone patch_dim

    # sampling on the target geometry works
    samples, conds = exp.sample_n()
    assert samples.shape == (192, 1, *TG.values())
    assert np.isfinite(samples).all()
