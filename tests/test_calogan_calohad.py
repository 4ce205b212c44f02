"""CaloGAN and CaloHadronic families: transforms, datasets, models."""

import h5py
import jax
import numpy as np
import pytest

import vit4hep_tpu.data.calogan.transforms as GT
import vit4hep_tpu.data.calohadronic.transforms as HT


# ---------------------------------------------------------------------------
# CaloGAN
# ---------------------------------------------------------------------------
def _gan_dict(rng, n=32):
    e = (10 ** rng.uniform(3, 5, (n, 1))).astype(np.float32)
    d = {"energy": e}
    for i, nv in enumerate((288, 144, 72)):
        lay = rng.exponential(1.0, (n, nv)).astype(np.float32)
        d[f"layer_{i}"] = lay / lay.sum(1, keepdims=True) * e * (0.3 - 0.05 * i)
    return d


def test_gan_normalize_roundtrip(rng):
    tf = GT.NormalizeLayerEnergyGAN()
    data = _gan_dict(rng)
    orig = {k: v.copy() for k, v in data.items()}
    fwd = tf({k: v.copy() for k, v in data.items()})
    assert fwd["extra_dims"].shape == (32, 3)
    back = tf({k: np.array(v) for k, v in fwd.items()}, rev=True)
    for k in ("layer_0", "layer_1", "layer_2"):
        np.testing.assert_allclose(back[k], orig[k], rtol=1e-3, atol=1e-6)


def test_gan_pipeline_roundtrip(rng, tmp_path):
    steps = [
        GT.NormalizeLayerEnergyGAN(),
        GT.ExclusiveLogitTransformGAN(delta=1e-6, rescale=False),
        GT.GlobalStandardizeFromFileGAN(model_dir=str(tmp_path), eps=1e-10),
        GT.LogEnergyGAN(),
        GT.ScaleEnergyGAN(e_min=6.907755, e_max=13.815510),
    ]
    data = _gan_dict(rng)
    orig = {k: v.copy() for k, v in data.items()}
    d = {k: v.copy() for k, v in data.items()}
    for fn in steps:
        d = fn(d)
    assert np.isfinite(d["layer_0"]).all()
    for fn in steps[::-1]:
        d = fn(d, rev=True)
    np.testing.assert_allclose(d["energy"], orig["energy"], rtol=1e-4)
    np.testing.assert_allclose(d["layer_1"], orig["layer_1"], rtol=5e-2, atol=1e-5)


@pytest.mark.slow
def test_calogan_dataset_and_model(tmp_path, rng):
    from vit4hep_tpu.data.calogan.datasets import CaloGANDataset
    from vit4hep_tpu.models.calogan import CaloGANCFM
    from vit4hep_tpu.models.vit import ViT

    with h5py.File(tmp_path / "gan.hdf5", "w") as f:
        f.create_dataset("layer_0", data=rng.exponential(1.0, (64, 3, 96)) * 1e3)
        f.create_dataset("layer_1", data=rng.exponential(1.0, (64, 12, 12)) * 1e3)
        f.create_dataset("layer_2", data=rng.exponential(1.0, (64, 12, 6)) * 1e3)
        f.create_dataset("energy", data=10 ** rng.uniform(3, 5, (64, 1)))
    steps = [GT.NormalizeLayerEnergyGAN()]
    ds = CaloGANDataset(str(tmp_path / "gan.hdf5"), transform=steps)
    assert ds.layers.shape == (64, 1, 504)
    assert ds.energy.shape == (64, 4)  # [Einc, u0, u1, u2]

    net = ViT({
        "dim": 3, "condition_dim": 4, "hidden_dim": 36, "depth": 1,
        "num_heads": 2, "mlp_ratio": 1.0,
        "num_patches": [[1, 16, 3], [1, 6, 4], [1, 3, 4]], "patch_dim": 6,
    })
    model = CaloGANCFM(
        net=net,
        list_shape=[[1, 96, 3], [1, 12, 12], [1, 6, 12]],
        list_edges=[288, 144, 72],
        list_patch_shape=[[1, 6, 1], [1, 2, 3], [1, 2, 3]],
        shape=[504],
    )
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.numpy.asarray(ds.layers[:8])
    c = jax.numpy.asarray(ds.energy[:8])
    loss = model.batch_loss(params, x, c, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # patch round-trip
    tokens = model.to_patches(x)
    assert tokens.shape == (8, 48 + 24 + 12, 6)
    np.testing.assert_allclose(np.asarray(model.from_patches(tokens)), np.asarray(x),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# CaloHadronic
# ---------------------------------------------------------------------------
def _had_dict(rng, n=16, ecal_shape=(4, 6, 6), hcal_shape=(6, 5, 5)):
    e = rng.uniform(10, 90, (n, 1)).astype(np.float32)
    ecal = rng.exponential(1.0, (n, *ecal_shape)).astype(np.float32)
    hcal = rng.exponential(1.0, (n, *hcal_shape)).astype(np.float32)
    scale = (e * 0.7 / (ecal.sum((1, 2, 3)) + hcal.sum((1, 2, 3)))[:, None])
    return {
        "energy": e,
        "ecal": ecal * scale[:, :, None, None],
        "hcal": hcal * scale[:, :, None, None],
    }


def test_had_normalize_roundtrip(rng):
    tf = HT.CaloHadNormalizeByElayer()
    data = _had_dict(rng)
    orig = {k: v.copy() for k, v in data.items()}
    fwd = tf({k: v.copy() for k, v in data.items()})
    assert fwd["extra_dims"].shape == (16, 4 + 6)  # joint ECal+HCal layers
    back = tf({k: np.array(v) for k, v in fwd.items()}, rev=True)
    np.testing.assert_allclose(back["ecal"], orig["ecal"], rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(back["hcal"], orig["hcal"], rtol=1e-3, atol=1e-6)


def test_sum_pool_downscale(rng):
    tf = HT.SumPool3dDownScale(calo="ecal", kernel=(2, 3, 3))
    x = rng.random((4, 4, 6, 6)).astype(np.float32)
    out = tf({"ecal": x.copy()})["ecal"]
    assert out.shape == (4, 2, 2, 2)
    np.testing.assert_allclose(out.sum(), x.sum(), rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 0, 0], x[0, :2, :3, :3].sum(), rtol=1e-5)


def test_had_dataset_collator(tmp_path, rng):
    from vit4hep_tpu.data.calohadronic.datasets import (
        CaloHadCollator,
        CaloHadDataset,
        CollatedBatchIterator,
    )

    dt = np.dtype([
        ("energy", np.float32),
        ("ecal", np.float32, (4, 6, 6)),
        ("hcal", np.float32, (6, 5, 5)),
    ])
    events = np.zeros(48, dt)
    events["energy"] = rng.uniform(10, 90, 48)
    ecal = rng.exponential(1.0, (48, 4, 6, 6))
    hcal = rng.exponential(1.0, (48, 6, 5, 5))
    # physical showers deposit less than E_inc (u_0 < 1)
    scale = events["energy"] * 0.7 / (ecal.sum((1, 2, 3)) + hcal.sum((1, 2, 3)))
    events["ecal"] = ecal * scale[:, None, None, None]
    events["hcal"] = hcal * scale[:, None, None, None]
    path = tmp_path / "had.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("events", data=events)
    files = {"CaloHad": [str(path)]}

    steps = [
        HT.CaloHadNormalizeByElayer(),
        HT.CaloHadExclusiveLogitTransform(delta=1e-6, rescale=True),
        HT.CaloHadGlobalStandardizeFromFile(model_dir=str(tmp_path)),
        HT.CaloHadPreprocessConds(),
        HT.Reshape({"ecal": [4, 6, 6], "hcal": [6, 5, 5]}),
    ]
    ds = CaloHadDataset(files)
    collator = CaloHadCollator(files, steps)
    it = CollatedBatchIterator(ds, collator, batch_size=16, seed=0)
    x, c = next(iter(it))
    assert x.shape == (16, 1, 4 * 36 + 6 * 25)
    assert c.shape == (16, 10 + 1)  # u's + energy
    assert np.isfinite(x).all() and np.isfinite(c).all()

    # AddLEMURSConditions appends 7 extra conds
    steps_lem = steps + [HT.AddLEMURSConditions()]
    collator2 = CaloHadCollator(files, steps_lem)
    x2, c2 = collator2(*ds.read_indices(list(range(8))))
    assert c2.shape == (8, 11 + 7)


def test_calohad_model():
    from vit4hep_tpu.utils.config import compose, instantiate

    model = instantiate(compose("configs", "calohadronic/calohadronic").model)
    assert model.patcher.total_patches == 606
    assert model.flat_voxels == 45450


# ---------------------------------------------------------------------------
# experiment-level e2e (train -> checkpoint -> sample through the harness)
# ---------------------------------------------------------------------------
def _exp_base(tmp_path, exp_name, run_name):
    return {
        "exp_type": "calogan", "exp_name": exp_name, "run_name": run_name,
        "base_dir": str(tmp_path), "seed": 3, "save": True, "use_mlflow": False,
        "save_source": False, "ema": False, "train": True, "evaluate": False,
        "plot": False, "dtype": "float32", "plotting": {"loss": False},
        "warm_start_idx": None, "finetuning": False, "load_sample": False,
        "training": {
            "iterations": 12, "batchsize": 16, "batchsize_sample": 32,
            "optimizer": "Adam", "lr": 1e-3, "scheduler": None,
            "es_patience": 1000, "es_load_best_model": False,
            "validate_every_n_steps": 6, "log_every_n_steps": 0,
        },
    }


@pytest.mark.slow
def test_calogan_experiment_e2e(tmp_path, rng):
    from vit4hep_tpu.experiments.calogan import CaloGAN
    from vit4hep_tpu.utils.config import Config

    path = tmp_path / "gan.hdf5"
    with h5py.File(path, "w") as f:
        f.create_dataset("layer_0", data=rng.exponential(1.0, (64, 3, 96)) * 1e3)
        f.create_dataset("layer_1", data=rng.exponential(1.0, (64, 12, 12)) * 1e3)
        f.create_dataset("layer_2", data=rng.exponential(1.0, (64, 12, 6)) * 1e3)
        f.create_dataset("energy", data=10 ** rng.uniform(3, 5, (64, 1)))

    cfg = Config({**_exp_base(tmp_path, "E2E_gan", "gan"),
        "model_type": "shape", "sample_us": False, "n_samples": 32,
        "data": {
            "training_file": str(path), "test_file": str(path),
            "return_us": False,
            "transforms": {
                "NormalizeLayerEnergyGAN": {},
                "ExclusiveLogitTransformGAN": {"delta": 1.0e-6, "rescale": False},
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
                "dim": 3, "condition_dim": 4, "hidden_dim": 36, "depth": 1,
                "num_heads": 2, "mlp_ratio": 1.0,
                "num_patches": [[1, 16, 3], [1, 6, 4], [1, 3, 4]], "patch_dim": 6,
            }},
        },
    })
    exp = CaloGAN(cfg)
    exp()
    assert int(exp.state.step) == 12
    assert (tmp_path / "runs" / "E2E_gan" / "gan" / "models" / "model_run0").exists()
    samples, conds = exp.sample_n()   # truth-u conditions from the test file
    assert samples.shape[0] == 64 and np.isfinite(samples).all()
    assert conds.shape == (64, 4)


@pytest.mark.slow
def test_calohadronic_experiment_e2e(tmp_path, rng):
    from vit4hep_tpu.experiments.calohadronic import CaloHadronic
    from vit4hep_tpu.utils.config import Config

    dt = np.dtype([
        ("energy", np.float32),
        ("ecal", np.float32, (4, 6, 6)),
        ("hcal", np.float32, (6, 5, 5)),
    ])
    events = np.zeros(48, dt)
    events["energy"] = rng.uniform(10, 90, 48)
    ecal = rng.exponential(1.0, (48, 4, 6, 6))
    hcal = rng.exponential(1.0, (48, 6, 5, 5))
    scale = events["energy"] * 0.7 / (ecal.sum((1, 2, 3)) + hcal.sum((1, 2, 3)))
    events["ecal"] = ecal * scale[:, None, None, None]
    events["hcal"] = hcal * scale[:, None, None, None]
    path = tmp_path / "had.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("events", data=events)
    files = {"CaloHad": [str(path)]}

    cfg = Config({**_exp_base(tmp_path, "E2E_had", "had"),
        "exp_type": "calohadronic",
        "model_type": "shape", "sample_us": False, "n_samples": 32,
        "data": {
            "training_file_dict": files, "test_file_dict": files,
            "max_files_per_worker": 1, "return_us": False, "native_cache": None,
            "transforms": {
                "CaloHadNormalizeByElayer": {},
                "CaloHadExclusiveLogitTransform": {"delta": 1.0e-6, "rescale": True},
                "CaloHadGlobalStandardizeFromFile": {"model_dir": None},
                "CaloHadPreprocessConds": {},
                "Reshape": {"dict_shape": {"ecal": [4, 6, 6], "hcal": [6, 5, 5]}},
            },
        },
        "model": {
            "_target_": "experiments.calohadronic.model.CaloHadCFM",
            "shape": [294],
            "list_shape": [[1, 6, 24], [1, 5, 30]],
            "list_edges": [144, 150],
            "list_patch_shape": [[1, 2, 3], [1, 1, 6]],
            "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
            "net": {"_target_": "nn.vit.ViT", "param": {
                "dim": 3, "condition_dim": 11, "hidden_dim": 36, "depth": 1,
                "num_heads": 2, "mlp_ratio": 1.0,
                "num_patches": [[1, 3, 8], [1, 5, 5]], "patch_dim": 6,
            }},
        },
    })
    exp = CaloHadronic(cfg)
    exp()
    assert int(exp.state.step) == 12
    samples, conds = exp.sample_n()
    assert samples.shape[0] == 48 and np.isfinite(samples).all()


@pytest.mark.slow
def test_calogan_finetune_e2e(tmp_path, rng):
    """CaloGANFTCFM: backbone trained on patch_dim-6 patching, fine-tuned onto
    a patch_dim-12 patching of the same 504-voxel geometry (mapper surgery +
    3-group optimizer through the GAN data pipeline)."""
    from vit4hep_tpu.experiments.calogan import CaloGAN
    from vit4hep_tpu.experiments.calogan_finetuning import CaloGANFTCFM
    from vit4hep_tpu.utils.config import Config

    path = tmp_path / "gan.hdf5"
    with h5py.File(path, "w") as f:
        f.create_dataset("layer_0", data=rng.exponential(1.0, (64, 3, 96)) * 1e3)
        f.create_dataset("layer_1", data=rng.exponential(1.0, (64, 12, 12)) * 1e3)
        f.create_dataset("layer_2", data=rng.exponential(1.0, (64, 12, 6)) * 1e3)
        f.create_dataset("energy", data=10 ** rng.uniform(3, 5, (64, 1)))

    data = {
        "training_file": str(path), "test_file": str(path), "return_us": False,
        "transforms": {
            "NormalizeLayerEnergyGAN": {},
            "ExclusiveLogitTransformGAN": {"delta": 1.0e-6, "rescale": False},
            "GlobalStandardizeFromFileGAN": {"model_dir": None, "eps": 1.0e-10},
            "LogEnergyGAN": {},
            "ScaleEnergyGAN": {"e_min": 6.907755, "e_max": 13.815510},
        },
    }

    def model_cfg(list_patch_shape, num_patches, patch_dim):
        return {
            "_target_": "experiments.calogan.model.CaloGANCFM",
            "shape": [504],
            "list_shape": [[1, 96, 3], [1, 12, 12], [1, 6, 12]],
            "list_edges": [288, 144, 72],
            "list_patch_shape": list_patch_shape,
            "odeint_kwargs": {"method": "rk4", "options": {"step_size": 0.25}},
            "net": {"_target_": "nn.vit.ViT", "param": {
                "dim": 3, "condition_dim": 4, "hidden_dim": 36, "depth": 1,
                "num_heads": 2, "mlp_ratio": 1.0,
                "num_patches": num_patches, "patch_dim": patch_dim,
            }},
        }

    bb_cfg = Config({**_exp_base(tmp_path, "GANFT_bb", "bb"),
        "model_type": "shape", "sample_us": False, "n_samples": 16,
        "data": data,
        "model": model_cfg([[1, 6, 1], [1, 2, 3], [1, 2, 3]],
                           [[1, 16, 3], [1, 6, 4], [1, 3, 4]], 6),
    })
    CaloGAN(bb_cfg)()
    bb_run = tmp_path / "runs" / "GANFT_bb" / "bb"
    assert (bb_run / "models" / "model_run0").exists()

    ft_cfg = Config({**_exp_base(tmp_path, "GANFT_tg", "ft"),
        "exp_type": "calogan_ft_cfm",
        "model_type": "shape", "sample_us": False, "n_samples": 16,
        "data": data,
        "model": model_cfg([[1, 12, 1], [1, 4, 3], [1, 2, 6]],
                           [[1, 8, 3], [1, 3, 4], [1, 3, 2]], 12),
        "finetuning": {
            "backbone_cfg": str(bb_run / "config_0.yaml"),
            "backbone_lr": 1e-5, "head_lr": 1e-3, "embedder_lr": 1e-3,
            "map_x_embedding": True, "map_c_embedding": False,
            "reinitialize_x_embedding": False, "reinitialize_c_embedding": False,
            "reinitialize_pos_embedding": True, "reinitialize_final_layer": True,
            "interpolate": False,
        },
    })
    exp = CaloGANFTCFM(ft_cfg)
    exp()
    p = exp.state.params["params"]
    assert "x_mapper" in p
    assert p["x_mapper"]["kernel"].shape[0] == 12   # target patch_dim
    assert p["x_embedder"]["kernel"].shape[0] == 6  # backbone patch_dim kept
    samples, conds = exp.sample_n()
    assert samples.shape[0] == 64 and np.isfinite(samples).all()
