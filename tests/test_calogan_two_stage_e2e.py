"""CaloGAN two-stage chain with sample_us=True: regression for sample_us
corrupting the shared transform pipeline (the reference narrows fn.layer_keys
on its own pipeline — a live upstream bug — ours must not; the plot-style full
inverse must return physical layer voxels)."""

import h5py
import numpy as np
import pytest

from vit4hep_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # full e2e drive; run in snapshot/full suites

N_US = 3  # u_0 plus u_1, u_2 for the 3-layer CaloGAN geometry


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _base(tmp_path, run_name, model_type):
    return {
        "exp_type": "calogan", "exp_name": "TwoStageGAN", "run_name": run_name,
        "base_dir": str(tmp_path), "seed": 3, "save": True, "use_mlflow": False,
        "save_source": False, "ema": False, "train": True, "evaluate": False,
        "plot": False, "dtype": "float32", "plotting": {"loss": False},
        "warm_start_idx": None, "finetuning": False, "load_sample": False,
        "model_type": model_type, "n_samples": 32,
        "evaluation": {"eval_dataset": "2", "batchsize": 32},
        "training": {
            "iterations": 10, "batchsize": 16, "batchsize_sample": 32,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 5, "log_every_n_steps": 0,
        },
    }


def test_calogan_two_stage_sample_us(tmp_path, rng):
    from vit4hep_tpu.experiments.calogan import CaloGAN

    path = tmp_path / "gan.hdf5"
    with h5py.File(path, "w") as f:
        f.create_dataset("layer_0", data=rng.exponential(1.0, (64, 3, 96)) * 1e3)
        f.create_dataset("layer_1", data=rng.exponential(1.0, (64, 12, 12)) * 1e3)
        f.create_dataset("layer_2", data=rng.exponential(1.0, (64, 12, 6)) * 1e3)
        f.create_dataset("energy", data=10 ** rng.uniform(3, 5, (64, 1)))

    # ---- stage 1: energy model over the 3-dim u-vector --------------------
    e_cfg = Config({**_base(tmp_path, "energy", "energy"), "sample_us": False,
        "data": {
            "training_file": str(path), "test_file": str(path),
            "return_us": True,
            "transforms": {
                "NormalizeLayerEnergyGAN": {},
                "ExclusiveLogitTransformGAN": {"delta": 1.0e-6, "rescale": True},
                "GlobalStandardizeFromFileGAN": {"model_dir": None, "eps": 1.0e-10},
                "LogEnergyGAN": {},
                "ScaleEnergyGAN": {"e_min": 6.907755, "e_max": 13.815510},
            },
        },
        "model": {
            "_target_": "models.base_model.CFM",
            "shape": [N_US],
            "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
            "net": {
                "_target_": "nn.cfm.transformer_cfm.ParallelTransformer",
                "param": {
                    "dims_in": N_US, "dims_c": 1, "dim_embedding": 16, "nhead": 2,
                    "num_encoder_layers": 1, "num_decoder_layers": 1,
                    "dim_feedforward": 32, "embeds": False, "encode_t_dim": 16,
                },
            },
        },
    })
    CaloGAN(e_cfg)()
    energy_run = tmp_path / "runs" / "TwoStageGAN" / "energy"
    assert (energy_run / "models" / "model_run0").exists()

    # ---- stage 2: shape model, sampled with sample_us=True -----------------
    s_cfg = Config({**_base(tmp_path, "shape", "shape"), "sample_us": True,
        "energy_model": str(energy_run),
        "data": {
            "training_file": str(path), "test_file": str(path),
            "return_us": False,
            "bin_edges": [0, 288, 432, 504],
            "transforms": {
                "NormalizeLayerEnergyGAN": {},
                "ExclusiveLogitTransformGAN": {"delta": 1.0e-6, "rescale": True},
                "GlobalStandardizeFromFileGAN": {"model_dir": None, "eps": 1.0e-10},
                "LogEnergyGAN": {},
                "ScaleEnergyGAN": {"e_min": 6.907755, "e_max": 13.815510},
            },
        },
        "model": {
            "_target_": "experiments.calogan.model.CaloGANCFM",
            "shape": [504],
            "list_shape": [[1, 96, 3], [1, 12, 12], [1, 6, 12]],
            "list_edges": [288, 144, 72],
            "list_patch_shape": [[1, 6, 1], [1, 2, 3], [1, 2, 3]],
            "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
            "net": {"_target_": "nn.vit.ViT", "param": {
                "dim": 3, "condition_dim": 1 + N_US, "hidden_dim": 36, "depth": 1,
                "num_heads": 2, "mlp_ratio": 1.0,
                "num_patches": [[1, 16, 3], [1, 6, 4], [1, 3, 4]], "patch_dim": 6,
            }},
        },
    })
    exp_s = CaloGAN(s_cfg)
    exp_s()

    samples, conds = exp_s.sample_n()
    assert conds.shape == (32, 1 + N_US)  # [scaled log-Einc, u's]
    assert np.isfinite(samples).all()

    # regression: the shared pipeline kept its layer keys
    for fn in exp_s.transforms:
        lk = getattr(fn, "layer_keys", None)
        if lk is not None and fn.__class__.__name__ != "NormalizeLayerEnergyGAN":
            assert "layer_0" in lk, f"{type(fn).__name__} lost its layer keys"

    # plot-branch full inverse back to physical voxels
    flat = np.asarray(samples).reshape(len(samples), -1)
    bin_edges = [0, 288, 432, 504]
    samples_dict = {
        "energy": conds[:, :1],
        "extra_dims": conds[:, 1:],
        "layer_0": flat[:, bin_edges[0] : bin_edges[1]],
        "layer_1": flat[:, bin_edges[1] : bin_edges[2]],
        "layer_2": flat[:, bin_edges[2] : bin_edges[3]],
    }
    for fn in exp_s.transforms[::-1]:
        samples_dict = fn(samples_dict, rev=True)
    out = np.concatenate(
        [samples_dict["layer_0"], samples_dict["layer_1"], samples_dict["layer_2"]],
        axis=1,
    )
    assert np.isfinite(out).all()
    assert (out >= 0).all(), "inverse pipeline left voxels in logit space"
    # exactness: NormalizeLayerEnergyGAN reverse reconstructs layer energies
    # from (Einc, u's), so the total voxel energy must equal Einc * u_0
    einc = np.asarray(samples_dict["energy"]).reshape(-1)
    u0 = np.clip(np.asarray(samples_dict["extra_dims"])[:, 0], 0.0, None)
    np.testing.assert_allclose(out.sum(axis=1), einc * u0, rtol=2e-3)
