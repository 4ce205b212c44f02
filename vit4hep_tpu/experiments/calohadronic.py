"""CaloHadronic experiment (reference
`/root/reference/experiments/calohadronic/experiment.py`): joint ECal+HCal
pion showers, Einc ~ U(10, 90) GeV, lazy multi-file pipeline, u-space or
feature-classifier evaluation.
"""

from __future__ import annotations

import os
import time
import warnings
from pathlib import Path

import h5py
import jax
import numpy as np

import vit4hep_tpu.data.calohadronic.transforms as transforms_module
from vit4hep_tpu.data.calohadronic.datasets import (
    CaloHadCollator,
    CaloHadDataset,
    CollatedBatchIterator,
    load_data,
)
from vit4hep_tpu.data.calohadronic.transforms import build_pipeline
from vit4hep_tpu.experiments.calochallenge import CaloChallenge
from vit4hep_tpu.utils.config import OmegaConf, instantiate
from vit4hep_tpu.utils.logger import LOGGER
from vit4hep_tpu.utils.torch_migration import load_net_params

ECAL_SHAPE = (10, 15, 15)
HCAL_SHAPE = (48, 30, 30)


class CaloHadronic(CaloChallenge):
    transforms_module = transforms_module

    def init_data(self):
        self.hdf5_dict_train = {
            k: list(v) for k, v in self.cfg.data.training_file_dict.items()
        }
        self.hdf5_dict_test = {
            k: list(v) for k, v in self.cfg.data.test_file_dict.items()
        }
        self.max_files_per_worker = int(self.cfg.data.max_files_per_worker)
        self.return_us = bool(self.cfg.data.return_us)

        LOGGER.info("init_data: preparing model training")
        self.transforms = build_pipeline(
            self.cfg.data.transforms, self.cfg.run_dir, transforms_module
        )
        for t in self.transforms:
            LOGGER.info(f"{t.__class__.__name__}")

        self.train_dataset = CaloHadDataset(
            self.hdf5_dict_train, max_files_per_worker=self.max_files_per_worker
        )
        self.val_dataset = CaloHadDataset(
            self.hdf5_dict_test, max_files_per_worker=self.max_files_per_worker
        )
        cache_dir = self.cfg.data.get("native_cache")
        if cache_dir:
            self._enable_native_cache(cache_dir)

    def _enable_native_cache(self, cache_dir):
        """Optional native mmap record cache (data/native_cache.py)."""
        from vit4hep_tpu.data.lemurs.datasets import enable_native_cache

        file_0 = next(iter(self.hdf5_dict_train.values()))[0]
        with h5py.File(file_0, "r") as f:
            sample = load_data(f, local_index=0)
        spec = {k: tuple(v.shape[1:]) for k, v in sample.items()}
        enable_native_cache(self.train_dataset, cache_dir, spec)
        enable_native_cache(self.val_dataset, cache_dir, spec)

    def _init_dataloader(self):
        from vit4hep_tpu.parallel import mesh as mesh_lib

        collator = CaloHadCollator(
            hdf5_train_dict=self.hdf5_dict_train,
            transforms=self.transforms,
            return_us=self.return_us,
            rank=self.rank,
        )
        self.batch_size = int(self.cfg.training.batchsize)
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        if self.batch_size % n_data:
            self.batch_size = (self.batch_size // n_data) * n_data
        seed = self.cfg.get("seed") or 0
        self.train_iterator = CollatedBatchIterator(
            self.train_dataset, collator, self.batch_size, seed=seed
        )
        self.batches_per_epoch = self.train_iterator.batches_per_epoch
        self._val_iterator = CollatedBatchIterator(
            self.val_dataset, collator, self.batch_size, seed=seed, shuffle=False
        )
        LOGGER.info(
            f"init_dataloader: created training iterator with "
            f"{self.batches_per_epoch} batches"
        )

    def val_batches(self):
        return self._val_iterator.epoch_batches()

    # ------------------------------------------------------------------ sampling
    def sample_n(self):
        t_0 = time.time()
        Einc = np.random.uniform(10, 90, size=(int(self.cfg.n_samples), 1)).astype(
            np.float32
        )
        samples = {"energy": Einc}
        for fn in self.transforms:
            if hasattr(fn, "cond_transform"):
                samples = fn(samples)
        transformed_cond = samples["energy"]

        batchsize_sample = int(self.cfg.training.batchsize_sample)
        if self.cfg.model_type == "shape":
            if self.cfg.sample_us:
                u_samples = self.sample_us(transformed_cond, batchsize_sample)
                transformed_cond = np.concatenate([u_samples, transformed_cond], axis=1)
                # fixed LEMURS conditions belong ONLY here (reference
                # experiment_finetuning.py:239-262): the truth-us collator
                # below already appends them via AddLEMURSConditions
                if self.cfg.get("finetuning") and "gen_theta" in self.cfg:
                    n = len(transformed_cond)
                    extra = np.tile(
                        np.asarray(
                            [float(self.cfg.gen_theta), float(self.cfg.gen_phi)]
                            + list(self.cfg.gen_label), np.float32,
                        ),
                        (n, 1),
                    )
                    transformed_cond = np.concatenate([transformed_cond, extra], axis=1)
            else:
                collator = CaloHadCollator(
                    hdf5_train_dict=self.hdf5_dict_test,
                    transforms=self.transforms,
                    return_us=False,
                    rank=self.rank,
                )
                it = CollatedBatchIterator(
                    self.val_dataset, collator, batchsize_sample, shuffle=False,
                    drop_last=False,
                )
                transformed_cond = np.concatenate(
                    [c for _, c in it.epoch_batches()], axis=0
                )

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
        # never narrow fn.keys on the shared pipelines: the transforms skip
        # absent keys, and mutating keys would corrupt the later full
        # ecal/hcal inverse in plot (see lemurs.py sample_us)
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
        file_0_path = next(iter(self.hdf5_dict_train.values()))[0]
        with h5py.File(file_0_path, "r") as f:
            dummy = load_data(f, local_index=None)
        for fn in self.energy_model_transforms:
            dummy = fn(dummy, rank=self.rank)
        del dummy

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
            collator = CaloHadCollator(
                hdf5_train_dict=self.hdf5_dict_test,
                transforms=self.transforms,
                return_us=True,
                rank=self.rank,
            )
            it = CollatedBatchIterator(
                self.val_dataset, collator,
                int(self.cfg.training.batchsize_sample), shuffle=False,
                drop_last=False,
            )
            ref_pairs = list(it.epoch_batches())
            reference_us = np.concatenate([u for u, _ in ref_pairs], axis=0)

            samples_dict = {"extra_dims": samples, "energy": conditions[:, :1]}
            reference_dict = {"extra_dims": reference_us}
            for fn in self.transforms[::-1]:
                if fn.__class__.__name__ == "CaloHadNormalizeByElayer":
                    break
                if hasattr(fn, "u_transform"):
                    samples_dict = fn(samples_dict, rev=True)
                    reference_dict = fn(reference_dict, rev=True)
            samples_u = np.array(samples_dict["extra_dims"])
            reference_u = np.array(reference_dict["extra_dims"])
            samples_u[:, 1:] = np.clip(samples_u[:, 1:], 0.0, 1.0)
            reference_u[:, 1:] = np.clip(reference_u[:, 1:], 0.0, 1.0)
            # the reference clips in place, so its saved sample file carries
            # the clipped u's — persist the same values
            samples_dict["extra_dims"] = samples_u

            self.save_sample(samples_dict, name=f"_{self.cfg.run_idx}")
            from vit4hep_tpu.evaluation.us_evaluation import eval_ui_dists, plot_ui_dists

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                plot_ui_dists(samples_u, reference_u, cfg=self.cfg)
                eval_ui_dists(samples_u, reference_u, cfg=self.cfg)
        else:
            samples = samples[:, 0]  # drop channel
            n_ecal = int(np.prod(ECAL_SHAPE))
            n_hcal = int(np.prod(HCAL_SHAPE))
            samples_dict = {
                "ecal": samples[:, :n_ecal].reshape(-1, *ECAL_SHAPE),
                "hcal": samples[:, -n_hcal:].reshape(-1, *HCAL_SHAPE),
            }
            n_layers = ECAL_SHAPE[0] + HCAL_SHAPE[0]
            samples_dict["extra_dims"] = conditions[:, :n_layers]
            samples_dict["energy"] = conditions[:, n_layers : n_layers + 1]
            for fn in self.transforms[::-1]:
                samples_dict = fn(samples_dict, rev=True)

            self.save_sample(samples_dict, name=f"_{self.cfg.run_idx}")
            from vit4hep_tpu.evaluation.calohadronic import run_from_py

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                run_from_py(
                    np.asarray(samples_dict["ecal"]),
                    np.asarray(samples_dict["hcal"]),
                    np.asarray(samples_dict["energy"]),
                    self.cfg,
                )

    def save_sample(self, samples_dict, name=""):
        save_path = Path(self.cfg.run_dir) / f"samples{name}.hdf5"
        with h5py.File(save_path, "w") as f:
            for key, value in samples_dict.items():
                f.create_dataset(key, data=np.asarray(value), compression="gzip")

    def eval_sample(self, dirname=""):
        ecal, hcal, energies = self.load_sample(dirname=dirname)
        from vit4hep_tpu.evaluation.calohadronic import run_from_py

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            run_from_py(ecal, hcal, energies, self.cfg)

    def load_sample(self, dirname=""):
        if dirname == "":
            dirname = str(Path(self.cfg.run_dir) / f"samples_{self.cfg.run_idx}.hdf5")
        LOGGER.info(f"load_sample: loading samples from {dirname}")
        with h5py.File(dirname, "r") as f:
            return f["ecal"][:], f["hcal"][:], f["energy"][:]
