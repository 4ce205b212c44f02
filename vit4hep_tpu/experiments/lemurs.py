"""LEMURS multi-detector experiment (reference
`/root/reference/experiments/lemurs/experiment.py`).

Trains a CFM energy or shape model over five detector classes with the lazy
multi-file pipeline (vit4hep_tpu/data/lemurs/datasets.py), samples over
(E, theta, phi, one-hot label) conditions, and evaluates with the angle-sliced
harness (vit4hep_tpu/evaluation/lemurs.py).
"""

from __future__ import annotations

import os
import time
import warnings
from pathlib import Path

import h5py
import jax
import numpy as np

import vit4hep_tpu.data.lemurs.transforms as transforms_module
from vit4hep_tpu.data.lemurs.datasets import (
    CollatedBatchIterator,
    LEMURSCollator,
    LEMURSDataset,
)
from vit4hep_tpu.data.lemurs.transforms import build_pipeline
from vit4hep_tpu.experiments.calochallenge import CaloChallenge
from vit4hep_tpu.utils.config import OmegaConf, instantiate
from vit4hep_tpu.utils.logger import LOGGER
from vit4hep_tpu.utils.torch_migration import load_net_params


class LEMURS(CaloChallenge):
    transforms_module = transforms_module

    def init_data(self):
        self.hdf5_dict_train = {
            k: list(v) for k, v in self.cfg.data.training_file_dict.items()
        }
        self.hdf5_dict_test = {
            k: list(v) for k, v in self.cfg.data.test_file_dict.items()
        }
        self.num_classes = int(self.cfg.data.num_classes)
        self.max_files_per_worker = int(self.cfg.data.max_files_per_worker)
        self.return_us = bool(self.cfg.data.return_us)

        LOGGER.info("init_data: preparing model training")
        self.transforms = build_pipeline(
            self.cfg.data.transforms, self.cfg.run_dir, transforms_module
        )
        for t in self.transforms:
            LOGGER.info(f"{t.__class__.__name__}")

        self.train_dataset = LEMURSDataset(
            self.hdf5_dict_train, max_files_per_worker=self.max_files_per_worker
        )
        self.val_dataset = LEMURSDataset(
            self.hdf5_dict_test, max_files_per_worker=self.max_files_per_worker
        )
        cache_dir = self.cfg.data.get("native_cache")
        if cache_dir:
            self._enable_native_cache(cache_dir)

    def _enable_native_cache(self, cache_dir):
        """Optional native mmap record cache (convert-once): batch gathers run
        in C++ threads with the GIL released (data/native_cache.py)."""
        from vit4hep_tpu.data.lemurs.datasets import enable_native_cache, load_data

        file_0 = next(iter(self.hdf5_dict_train.values()))[0]
        with h5py.File(file_0, "r") as f:
            sample = load_data(f, local_index=0)
        spec = {k: tuple(v.shape[1:]) for k, v in sample.items()}
        enable_native_cache(self.train_dataset, cache_dir, spec)
        enable_native_cache(self.val_dataset, cache_dir, spec)

    def _init_dataloader(self):
        from vit4hep_tpu.parallel import mesh as mesh_lib

        collator = LEMURSCollator(
            hdf5_train_dict=self.hdf5_dict_train,
            transforms=self.transforms,
            num_classes=self.num_classes,
            gen_label=None,
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
    def sample_initial_conds(self, n_samples=None):
        """Draw (Einc, phi, theta) from the configured generation windows
        (reference experiment.py:157-196; theta uniform in cos)."""
        gen_Einc = list(self.cfg.data.gen_Einc)
        gen_theta = list(self.cfg.data.gen_theta)
        gen_phi = self.cfg.data.gen_phi
        n = int(self.cfg.n_samples if n_samples is None else n_samples)

        Einc = (
            np.random.uniform(gen_Einc[0], gen_Einc[1], size=n)
            if len(gen_Einc) == 2 else np.full(n, gen_Einc[0])
        )[:, None].astype(np.float32)
        phi = (
            np.random.uniform(-np.pi, np.pi, size=n)
            if gen_phi is None else np.full(n, float(gen_phi[0]))
        )[:, None].astype(np.float32)
        cos_theta = (
            np.random.uniform(np.cos(gen_theta[0]), np.cos(gen_theta[1]), size=n)
            if len(gen_theta) == 2 else np.full(n, np.cos(gen_theta[0]))
        )
        theta = np.arccos(cos_theta)[:, None].astype(np.float32)
        return Einc, phi, theta

    def sample_n(self):
        t_0 = time.time()
        Einc, phi, theta = self.sample_initial_conds()
        gen_label_vector = list(self.cfg.data.gen_label_vector)
        labels = np.tile(
            np.asarray(gen_label_vector, np.float32), (int(self.cfg.n_samples), 1)
        )
        samples = {
            "incident_energy": Einc,
            "incident_phi": phi,
            "incident_theta": theta,
            "label": labels,
        }
        for fn in self.transforms:
            if hasattr(fn, "cond_transform"):
                samples = fn(samples)
        transformed_cond = np.concatenate(
            [samples["incident_energy"], samples["incident_theta"],
             samples["incident_phi"]], axis=-1,
        )

        batchsize_sample = int(self.cfg.training.batchsize_sample)
        if self.cfg.model_type == "shape":
            if self.cfg.sample_us:
                u_samples = self.sample_us(transformed_cond, batchsize_sample)
                transformed_cond = np.concatenate(
                    [u_samples, transformed_cond, labels], axis=1
                )
            else:
                collator = LEMURSCollator(
                    hdf5_train_dict=self.hdf5_dict_test,
                    transforms=self.transforms,
                    num_classes=self.num_classes,
                    gen_label=gen_label_vector,
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
        # dict-protocol transforms skip keys absent from the dict, so the
        # u-only dict is transformed correctly WITHOUT narrowing fn.keys —
        # mutating the shared pipeline's keys here would make the later
        # full-shower inverse (plot) silently skip the shower entries
        # (the reference instead feeds a dummy showers tensor,
        # reference experiments/lemurs/experiment.py:313-325)
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
        # warm up transform state on the first training file
        file_0_path = next(iter(self.hdf5_dict_train.values()))[0]
        from vit4hep_tpu.data.lemurs.datasets import load_data

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
            collator = LEMURSCollator(
                hdf5_train_dict=self.hdf5_dict_test,
                transforms=self.transforms,
                num_classes=self.num_classes,
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
            reference_conds = np.concatenate([c for _, c in ref_pairs], axis=0)

            samples_dict = {
                "extra_dims": samples,
                "incident_energy": conditions[:, :1],
                "incident_theta": conditions[:, 1:2],
                "incident_phi": conditions[:, 2:3],
                "label": conditions[:, 3:],
            }
            reference_dict = {
                "extra_dims": reference_us,
                "incident_energy": reference_conds[:, :1],
                "incident_theta": reference_conds[:, 1:2],
                "incident_phi": reference_conds[:, 2:3],
                "label": reference_conds[:, 3:],
            }
            for fn in self.transforms[::-1]:
                if fn.__class__.__name__ == "LEMURSNormalizeByElayer":
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
                eval_ui_dists(
                    np.concatenate([samples_u, conditions[:, :3]], axis=1),
                    np.concatenate([reference_u, reference_conds[:, :3]], axis=1),
                    cfg=self.cfg,
                )
        else:
            # (B, 1, L, W, H) -> LEMURS layout (B, H, W, L)
            samples = np.transpose(samples[:, 0], (0, 3, 2, 1))
            n_us = samples.shape[-1]
            samples_dict = {
                "showers": samples,
                "extra_dims": conditions[:, :n_us],
                "incident_energy": conditions[:, n_us : n_us + 1],
                "incident_theta": conditions[:, n_us + 1 : n_us + 2],
                "incident_phi": conditions[:, n_us + 2 : n_us + 3],
                "label": conditions[:, n_us + 3 :],
            }
            for fn in self.transforms[::-1]:
                samples_dict = fn(samples_dict, rev=True)

            self.save_sample(samples_dict, name=f"_{self.cfg.run_idx}")
            from vit4hep_tpu.evaluation.lemurs import run_from_py

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                run_from_py(
                    np.asarray(samples_dict["showers"]),
                    np.asarray(samples_dict["incident_energy"]),
                    np.asarray(samples_dict["incident_theta"]),
                    np.asarray(samples_dict["incident_phi"]),
                    self.cfg,
                )

    def save_sample(self, samples_dict, name=""):
        save_path = Path(self.cfg.run_dir) / f"samples{name}.hdf5"
        with h5py.File(save_path, "w") as f:
            for key, value in samples_dict.items():
                f.create_dataset(key, data=np.asarray(value), compression="gzip")

    def eval_sample(self, dirname=""):
        samples, energies, theta, phi = self.load_sample(dirname=dirname)
        from vit4hep_tpu.evaluation.lemurs import run_from_py

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            run_from_py(samples, energies, theta, phi, self.cfg)

    def load_sample(self, dirname=""):
        if dirname == "":
            dirname = str(Path(self.cfg.run_dir) / f"samples_{self.cfg.run_idx}.hdf5")
        LOGGER.info(f"load_sample: loading samples from {dirname}")
        with h5py.File(dirname, "r") as f:
            events = f["events"][:]
            return (
                events["showers"], events["incident_energy"],
                events["incident_theta"], events["incident_phi"],
            )
