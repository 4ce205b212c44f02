"""Test environment: 8 virtual CPU devices so mesh/sharding paths are exercised
without TPU hardware (the JAX-native replacement for fake distributed backends,
SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# this image pre-imports jax with JAX_PLATFORMS=axon (real TPU tunnel); the env
# var alone is read too early, so force the platform through the live config
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_binning_xml(path, particle="electron", n_layers=5, n_r=3, n_alpha=4):
    """Write a small CaloChallenge-style binning.xml."""
    lines = ["<Bins>", f'  <Particle name="{particle}">']
    for i in range(n_layers):
        r_edges = ",".join(str(5.0 * j) for j in range(n_r + 1))
        lines.append(f'    <Layer id="{i}" r_edges="{r_edges}" n_bin_alpha="{n_alpha}"/>')
    lines += ["  </Particle>", "</Bins>"]
    path.write_text("\n".join(lines))
    return path


def make_shower_hdf5(path, n_events=512, n_voxels=60, seed=0, e_min=1e3, e_max=1e6):
    """Synthetic shower file in the CaloChallenge HDF5 layout."""
    import h5py

    rng = np.random.default_rng(seed)
    energies = 10 ** rng.uniform(np.log10(e_min), np.log10(e_max), size=(n_events, 1))
    # sparse positive voxel energies that roughly sum to a fraction of Einc
    showers = rng.exponential(1.0, size=(n_events, n_voxels)) * (
        rng.random((n_events, n_voxels)) > 0.3
    )
    showers = showers / showers.sum(1, keepdims=True).clip(1e-9) * energies * 0.8
    with h5py.File(path, "w") as f:
        f.create_dataset("incident_energies", data=energies.astype(np.float32))
        f.create_dataset("showers", data=showers.astype(np.float32))
    return path


@pytest.fixture
def geometry(tmp_path):
    """(xml_path, particle, n_layers, n_voxels) small synthetic geometry."""
    xml = make_binning_xml(tmp_path / "binning.xml")
    return {"xml": str(xml), "particle": "electron", "n_layers": 5, "n_voxels": 60}


@pytest.fixture
def shower_file(tmp_path, geometry):
    return str(make_shower_hdf5(tmp_path / "showers.hdf5", n_voxels=geometry["n_voxels"]))
