"""LEMURS two-stage chain with sample_us=True: the energy model's u's are
sampled, mapped through both transform pipelines, the shape model generates
conditioned on them, and the plot-style FULL inverse must return physical
showers — regression for sample_us corrupting the shared pipeline (it used to
narrow fn.keys to ['extra_dims'], making the later shower inverse a no-op)."""

import pytest

import numpy as np

from tests.test_lemurs import H, L, W, make_lemurs_file
from vit4hep_tpu.utils.config import Config

pytestmark = pytest.mark.slow  # full e2e drive; run in snapshot/full suites

NUM_CLASSES = 1


def _common(tmp_path, files_train, files_test):
    return {
        "exp_type": "lemurs",
        "base_dir": str(tmp_path),
        "seed": 11,
        "save": True, "use_mlflow": False, "save_source": False, "ema": False,
        "train": True, "evaluate": False, "plot": False,
        "dtype": "float32",
        "plotting": {"loss": False},
        "evaluation": {"eval_dataset": "2", "batchsize": 32},
        "data": {
            "training_file_dict": files_train,
            "test_file_dict": files_test,
            "num_classes": NUM_CLASSES,
            "max_files_per_worker": 4,
            "gen_Einc": [1e3, 1e6],
            "gen_theta": [0.9, 2.2],
            "gen_phi": None,
            "gen_label_vector": [1],
            "xml_filename": "unused",
        },
        "training": {
            "iterations": 10, "batchsize": 32, "batchsize_sample": 32,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 5, "log_every_n_steps": 0,
        },
    }


def test_lemurs_two_stage_sample_us(tmp_path):
    from vit4hep_tpu.experiments.lemurs import LEMURS

    files_train = {"DetA": [make_lemurs_file(tmp_path / "a1.h5", n=96, seed=1)]}
    files_test = {"DetA": [make_lemurs_file(tmp_path / "a2.h5", n=64, seed=2)]}

    # ---- stage 1: energy model over the u-vector -------------------------
    e_cfg = _common(tmp_path, files_train, files_test)
    e_cfg.update({
        "exp_name": "TwoStageLEM", "run_name": "energy",
        "model_type": "energy", "sample_us": False, "n_samples": 32,
    })
    e_cfg["data"]["return_us"] = True
    e_cfg["data"]["transforms"] = {
        "LEMURSNormalizeByElayer": {},
        "LEMURSExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
        "LEMURSStandardizeUsFromFile": {"n_us": L, "model_dir": None},
        "LEMURSPreprocessConds": {},
    }
    e_cfg["model"] = {
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
    }
    LEMURS(Config(e_cfg))()
    energy_run = tmp_path / "runs" / "TwoStageLEM" / "energy"
    assert (energy_run / "models" / "model_run0").exists()

    # ---- stage 2: shape model, sampled with sample_us=True ---------------
    s_cfg = _common(tmp_path, files_train, files_test)
    s_cfg.update({
        "exp_name": "TwoStageLEM", "run_name": "shape",
        "model_type": "shape", "sample_us": True, "n_samples": 32,
        "energy_model": str(energy_run),
    })
    s_cfg["data"]["return_us"] = False
    s_cfg["data"]["transforms"] = {
        "LEMURSNormalizeByElayer": {},
        "LEMURSExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
        "LEMURSGlobalStandardizeFromFile": {"model_dir": None},
        "LEMURSStandardizeUsFromFile": {"n_us": L, "model_dir": None},
        "LEMURSPreprocessConds": {},
    }
    s_cfg["model"] = {
        "_target_": "vit4hep_tpu.models.lemurs.LEMURSCFM",
        "in_channels": 1,
        "shape": [L, W, H],
        "patch_shape": [1, W, 1],
        "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
        "net": {
            "_target_": "vit4hep_tpu.models.vit.ViT",
            "param": {
                "dim": 3, "condition_dim": L + 3 + NUM_CLASSES, "hidden_dim": 36,
                "depth": 1, "num_heads": 2, "mlp_ratio": 1.0,
                "num_patches": [[L, 1, H]], "patch_dim": W,
                "learn_pos_embed": True,
            },
        },
    }
    exp_s = LEMURS(Config(s_cfg))
    exp_s()

    samples, conds = exp_s.sample_n()
    assert samples.shape == (32, 1, L, W, H)
    assert conds.shape == (32, L + 3 + NUM_CLASSES)
    assert np.isfinite(samples).all()

    # regression: the shared pipeline must have kept its shower keys
    matched = 0
    for fn in exp_s.transforms:
        keys = getattr(fn, "keys", None)
        if keys is not None and fn.__class__.__name__ in (
            "LEMURSGlobalStandardizeFromFile", "LEMURSExclusiveLogitTransform"
        ):
            assert "showers" in keys, f"{type(fn).__name__} lost its shower key"
            matched += 1
    assert matched >= 1  # a class rename must not silently skip the guard

    # round-5: the LEMURS generator export (advisor r4 #1 — the dict-family
    # transform twins + per-family cond layout). The energy model
    # conditions on [E,theta,phi] while the shape cond appends the label
    # one-hot, so the artifact takes cond = [E,theta,phi,label] and
    # composes [u | cond] on device.
    from vit4hep_tpu.utils.serving import export_generator, load_sampler
    import io

    blob = export_generator(
        exp_s.model, exp_s.state.params, exp_s.energy_model,
        exp_s.energy_model_params, exp_s.energy_model_transforms,
        exp_s.transforms, batch=8, energy_cond_width=3)
    path = tmp_path / "lemurs_generator.v4h"
    path.write_bytes(blob)
    gen = load_sampler(str(path))
    assert gen.header["cond_dim"] == 3 + NUM_CLASSES
    assert gen.header["energy_cond_width"] == 3
    out = gen(np.asarray(conds[:8, L:], np.float32), seed=3)
    assert out.shape == (8, 1, L, W, H)
    assert np.isfinite(np.asarray(out)).all()

    # the plot-branch full inverse: showers must come back physical (MeV)
    showers = np.transpose(np.asarray(samples)[:, 0], (0, 3, 2, 1))  # (B,H,W,L)
    samples_dict = {
        "showers": showers,
        "extra_dims": conds[:, :L],
        "incident_energy": conds[:, L : L + 1],
        "incident_theta": conds[:, L + 1 : L + 2],
        "incident_phi": conds[:, L + 2 : L + 3],
        "label": conds[:, L + 3 :],
    }
    for fn in exp_s.transforms[::-1]:
        samples_dict = fn(samples_dict, rev=True)
    out = np.asarray(samples_dict["showers"])
    assert out.shape == (32, H, W, L)
    assert np.isfinite(out).all()
    assert (out >= 0).all(), "inverse pipeline left showers in logit space"
    # physical scale: layer-normalized voxels rescaled by real MeV energies
    assert out.max() > 10.0, "showers never left standardized space"
    # exactness: LEMURSNormalizeByElayer reverse reconstructs layer energies
    # from (Einc, u's) — total voxel energy must equal Einc * u_0
    einc = np.asarray(samples_dict["incident_energy"]).reshape(-1)
    u0 = np.clip(np.asarray(samples_dict["extra_dims"])[:, 0], 0.0, None)
    np.testing.assert_allclose(out.sum(axis=(1, 2, 3)), einc * u0, rtol=2e-3)
