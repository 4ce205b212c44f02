"""Smoke tests for the LEMURS and CaloHadronic evaluation harnesses on tiny
synthetic geometries (histogram mode + classifier)."""

import h5py
import numpy as np
import pytest

from tests.conftest import make_binning_xml
from vit4hep_tpu.utils.config import Config

H, W, L = 4, 3, 5  # LEMURS event grid (height, width, layers)


def _lemurs_events(n, rng):
    dt = np.dtype([
        ("incident_energy", np.float32),
        ("incident_theta", np.float32),
        ("incident_phi", np.float32),
        ("showers", np.float32, (H, W, L)),
    ])
    ev = np.zeros(n, dt)
    ev["incident_energy"] = 10 ** rng.uniform(3, 5, n)
    ev["incident_theta"] = rng.uniform(0.9, 2.2, n)
    ev["incident_phi"] = rng.uniform(-3.1, 3.1, n)
    sh = rng.exponential(1.0, (n, H, W, L)) * (rng.random((n, H, W, L)) > 0.3)
    ev["showers"] = sh / sh.sum((1, 2, 3), keepdims=True).clip(1e-9) \
        * ev["incident_energy"][:, None, None, None] * 0.7
    return ev


@pytest.mark.slow
def test_lemurs_run_from_py_hist(tmp_path, rng):
    from vit4hep_tpu.evaluation.lemurs import run_from_py

    # regular L-layer xml whose flat voxel count matches H*W per layer
    xml = make_binning_xml(tmp_path / "b.xml", n_layers=L, n_r=W, n_alpha=H)
    ref = _lemurs_events(256, rng)
    with h5py.File(tmp_path / "ref.h5", "w") as f:
        f.create_dataset("events", data=ref)

    gen = _lemurs_events(200, rng)
    cfg = Config({
        "run_dir": str(tmp_path), "run_idx": 0,
        "data": {"xml_filename": str(xml)},
        "evaluation": {
            "eval_dataset": "2", "eval_mode": "hist", "eval_cut": 1e-6,
            "eval_hdf5_file": str(tmp_path / "ref.h5"),
            "eval_labels": ["ViT-CFM"], "eval_p_label": "",
            "eval_energy_bin": None, "eval_theta_bin": None, "eval_phi_bin": None,
            "eval_cls_n_layer": 1, "eval_cls_n_hidden": 16, "eval_cls_dropout": 0.0,
            "eval_cls_lr": 1e-3, "eval_cls_batch_size": 64, "eval_cls_n_epochs": 1,
            "eval_cls_save_mem": True,
        },
    })
    run_from_py(
        gen["showers"], gen["incident_energy"][:, None],
        gen["incident_theta"][:, None], gen["incident_phi"][:, None], cfg,
    )
    out = tmp_path / "eval_0"
    assert (out / "Etot_Einc_dataset_LEMURS.pdf").exists()
    assert (out / "E_layer_dataset_LEMURS.pdf").exists()
    assert (out / "profile_energy_z_dataset_LEMURS.pdf").exists()
    assert (out / "conditions.pdf").exists()
    assert (out / "histogram_chi2_LEMURS.txt").exists()


def test_calohadronic_run_from_py(tmp_path, rng):
    from vit4hep_tpu.evaluation.calohadronic import run_from_py

    ecal_shape, hcal_shape = (4, 6, 6), (6, 5, 5)
    dt = np.dtype([
        ("energy", np.float32),
        ("ecal", np.float32, ecal_shape),
        ("hcal", np.float32, hcal_shape),
    ])
    def events(n, seed):
        r = np.random.default_rng(seed)
        ev = np.zeros(n, dt)
        ev["energy"] = r.uniform(10, 90, n)
        ec, hc = r.exponential(1.0, (n, *ecal_shape)), r.exponential(1.0, (n, *hcal_shape))
        s = ev["energy"] * 0.7 / (ec.sum((1, 2, 3)) + hc.sum((1, 2, 3)))
        ev["ecal"] = ec * s[:, None, None, None]
        ev["hcal"] = hc * s[:, None, None, None]
        return ev

    with h5py.File(tmp_path / "ref.h5", "w") as f:
        f.create_dataset("events", data=events(256, 0))
    gen = events(200, 1)

    cfg = Config({
        "run_dir": str(tmp_path), "run_idx": 0,
        "evaluation": {
            "eval_hdf5_file": str(tmp_path / "ref.h5"),
            "eval_cls_n_layer": 1, "eval_cls_n_hidden": 16, "eval_cls_dropout": 0.0,
            "eval_cls_lr": 1e-3, "eval_cls_batch_size": 64, "eval_cls_n_epochs": 1,
        },
    })
    acc, auc, jsd = run_from_py(
        gen["ecal"], gen["hcal"], gen["energy"][:, None], cfg
    )
    out = tmp_path / "eval_0"
    assert (out / "cog_z_CaloHad.pdf").exists()
    assert (out / "voxels_CaloHad.pdf").exists()
    assert (out / "classifier.txt").exists()
    # same distribution -> classifier near chance
    assert 0.3 < auc < 0.75
