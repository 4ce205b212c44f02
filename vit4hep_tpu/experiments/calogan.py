"""CaloGAN experiment (reference `/root/reference/experiments/calogan/experiment.py`).

Trains a CFM energy or shape model on the 3-layer CaloGAN dataset with
dict-protocol transforms, samples with Einc ~ U(1, 100) GeV, and evaluates with
the low-level DNN classifier (vit4hep_tpu/evaluation/calogan.py) or the u-space
suite for energy models.
"""

from __future__ import annotations

import os
import time
import warnings
from pathlib import Path

import h5py
import jax
import numpy as np

import vit4hep_tpu.data.calogan.transforms as transforms_module
from vit4hep_tpu.data.calochallenge.datasets import BatchIterator
from vit4hep_tpu.data.calogan.datasets import CaloGANDataset
from vit4hep_tpu.data.calogan.transforms import build_pipeline
from vit4hep_tpu.experiments.calochallenge import CaloChallenge
from vit4hep_tpu.utils.config import OmegaConf, instantiate
from vit4hep_tpu.utils.logger import LOGGER
from vit4hep_tpu.utils.torch_migration import load_net_params


class CaloGAN(CaloChallenge):
    """CaloGAN training/eval; inherits the SPMD loop + batched sampler from
    CaloChallenge and overrides the data plumbing (dict transforms)."""

    transforms_module = transforms_module

    def init_data(self):
        self.hdf5_train = self.cfg.data.training_file
        self.hdf5_test = self.cfg.data.test_file
        self.return_us = bool(self.cfg.data.return_us)

        LOGGER.info("init_data: preparing model training")
        self.transforms = build_pipeline(
            self.cfg.data.transforms, self.cfg.run_dir, transforms_module
        )
        for t in self.transforms:
            LOGGER.info(f"{t.__class__.__name__}")

        self.train_dataset = CaloGANDataset(
            self.hdf5_train, transform=self.transforms,
            return_us=self.return_us, rank=self.rank,
        )
        # the reference uses the same (training) file for validation
        # (experiment.py:69-76)
        self.val_dataset = self.train_dataset
        self.layer_boundaries = self.train_dataset.bin_edges

    def _init_dataloader(self):
        from vit4hep_tpu.parallel import mesh as mesh_lib

        self.batch_size = int(self.cfg.training.batchsize)
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        if self.batch_size % n_data:
            self.batch_size = (self.batch_size // n_data) * n_data
        seed = self.cfg.get("seed") or 0
        self.train_iterator = BatchIterator(
            (self.train_dataset.layers, self.train_dataset.energy),
            self.batch_size, seed=seed,
        )
        self.batches_per_epoch = self.train_iterator.batches_per_epoch
        self._val_iterator = BatchIterator(
            (self.val_dataset.layers, self.val_dataset.energy),
            self.batch_size, seed=seed, shuffle=False,
        )
        LOGGER.info(
            f"init_dataloader: created training iterator with "
            f"{self.batches_per_epoch} batches"
        )

    # ------------------------------------------------------------------ sampling
    def sample_n(self):
        t_0 = time.time()
        Einc = (np.random.rand(int(self.cfg.n_samples), 1) * 99 + 1).astype(np.float32)

        samples_dict = {"energy": Einc}
        for fn in self.transforms:
            if hasattr(fn, "cond_transform"):
                samples_dict = fn(samples_dict)
        transformed_cond = samples_dict["energy"]

        batchsize_sample = int(self.cfg.training.batchsize_sample)
        if self.cfg.model_type == "shape":
            if self.cfg.sample_us:
                u_samples = self.sample_us(transformed_cond, batchsize_sample)
                transformed_cond = np.concatenate([transformed_cond, u_samples], axis=1)
            else:
                transformed_cond = CaloGANDataset(
                    self.hdf5_test, transform=self.transforms,
                    return_us=self.return_us,
                ).energy

        key_sample, self.base_key = jax.random.split(self.base_key)
        sample = self._sample_in_batches(
            self.model, self.state.params,
            np.asarray(transformed_cond, np.float32), key_sample, batchsize_sample,
        )
        LOGGER.info(
            f"sample_n: Finished generating {len(sample)} samples "
            f"after {time.time() - t_0} s."
        )
        return sample, np.asarray(transformed_cond)

    def sample_us(self, transformed_cond, batchsize_sample):
        self.load_energy_model()
        t_0 = time.time()
        key_u, self.base_key = jax.random.split(self.base_key)
        u_samples = self._sample_in_batches(
            self.energy_model, self.energy_model_params,
            np.asarray(transformed_cond, np.float32), key_u, batchsize_sample,
        )
        LOGGER.info(
            f"sample_us: Finished generating {len(u_samples)} energy samples "
            f"after {time.time() - t_0} s."
        )
        # never narrow fn.layer_keys on the shared pipelines: our transforms
        # skip keys absent from the dict, and the mutation would make the
        # later full layer_0/1/2 inverse in plot() silently skip the shower
        # layers (the reference mutates here because its transforms KeyError
        # on missing keys — a latent upstream bug for shape+sample_us runs,
        # reference experiments/calogan/experiment.py:201-208,230-235)
        u_dict = {"extra_dims": u_samples}
        for fn in self.energy_model_transforms[::-1]:
            if hasattr(fn, "u_transform"):
                u_dict = fn(u_dict, rev=True)
        for fn in self.transforms:
            if hasattr(fn, "u_transform"):
                u_dict = fn(u_dict)
        return np.asarray(u_dict["extra_dims"], np.float32)

    def load_energy_model(self):
        energy_model_cfg = OmegaConf.load(
            os.path.join(str(self.cfg.energy_model), "config.yaml")
        )
        self.energy_model_transforms = build_pipeline(
            energy_model_cfg.data.transforms, energy_model_cfg.run_dir, transforms_module
        )
        model_path = os.path.join(str(energy_model_cfg.run_dir), "models", "model_run0")
        self.energy_model, self.energy_model_params, migrated = load_net_params(
            energy_model_cfg.model, model_path, jax.random.PRNGKey(0)
        )
        LOGGER.info(
            f"Loaded energy model from {model_path}"
            + (".pt (migrated torch checkpoint)" if migrated else "")
        )

    # ------------------------------------------------------------------ plot/eval
    def plot(self):
        LOGGER.info("plot: generating samples")
        samples, conditions = self.sample_n()

        if self.cfg.model_type == "energy":
            reference = CaloGANDataset(
                self.hdf5_test, transform=self.transforms, return_us=self.return_us
            )
            samples_dict = {"extra_dims": samples, "energy": conditions}
            reference_dict = {
                "extra_dims": np.array(reference.layers),
                "energy": np.array(reference.energy),
            }
            for fn in self.transforms[::-1]:
                if fn.__class__.__name__ == "NormalizeLayerEnergyGAN":
                    break
                samples_dict = fn(samples_dict, rev=True)
                reference_dict = fn(reference_dict, rev=True)
            samples = samples_dict["extra_dims"]
            reference_us = reference_dict["extra_dims"]
            samples[:, 1:] = np.clip(samples[:, 1:], 0.0, 1.0)
            reference_us[:, 1:] = np.clip(reference_us[:, 1:], 0.0, 1.0)

            from vit4hep_tpu.evaluation.us_evaluation import eval_ui_dists, plot_ui_dists

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                plot_ui_dists(np.asarray(samples), np.asarray(reference_us), cfg=self.cfg)
                eval_ui_dists(np.asarray(samples), np.asarray(reference_us), cfg=self.cfg)
        else:
            bin_edges = list(self.cfg.data.bin_edges)
            samples = samples.reshape(samples.shape[0], -1)
            samples_dict = {
                "energy": conditions[:, :1],
                "extra_dims": conditions[:, 1:],
                "layer_0": samples[:, bin_edges[0] : bin_edges[1]],
                "layer_1": samples[:, bin_edges[1] : bin_edges[2]],
                "layer_2": samples[:, bin_edges[2] : bin_edges[3]],
            }
            for fn in self.transforms[::-1]:
                samples_dict = fn(samples_dict, rev=True)
            samples = np.concatenate(
                [samples_dict["layer_0"], samples_dict["layer_1"], samples_dict["layer_2"]],
                axis=1,
            )
            from vit4hep_tpu.evaluation.calogan import eval_calogan_lowlevel

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                eval_calogan_lowlevel(samples, self.cfg)

    def save_sample(self, sample, energies, name=""):
        save_path = Path(self.cfg.base_dir) / f"samples{name}.hdf5"
        with h5py.File(save_path, "w") as f:
            f.create_dataset("incident_energies", data=energies, compression="gzip")
            f.create_dataset("showers", data=sample, compression="gzip")
