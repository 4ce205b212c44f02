"""CaloChallenge experiment (ds1 photons/pions, ds2, ds3).

Counterpart of the reference ``experiments/calochallenge/experiment.py``:
training a CFM (or cINN) energy/shape model on CaloChallenge HDF5 datasets,
two-stage sampling (energy model -> u's -> shape model), inverse preprocessing,
HDF5 sample export, and physics evaluation.

Sampling is the headline benchmark path: ``model.sample_batch`` is jitted once
and the whole fixed-batch ODE integration runs as one XLA program per batch
(conditions stream through a fixed-size loop, last batch padded).
"""

from __future__ import annotations

import os
import time
import warnings
from pathlib import Path

import h5py
import jax
import numpy as np

import vit4hep_tpu.data.calochallenge.transforms as transforms_module
from vit4hep_tpu.data.calochallenge.datasets import BatchIterator, CaloChallengeDataset
from vit4hep_tpu.data.calochallenge.transforms import build_pipeline
from vit4hep_tpu.experiments.base import BaseExperiment
from vit4hep_tpu.parallel import mesh as mesh_lib
from vit4hep_tpu.utils.config import OmegaConf, instantiate
from vit4hep_tpu.utils.logger import LOGGER
from vit4hep_tpu.utils.torch_migration import load_net_params


class CaloChallenge(BaseExperiment):
    """Train/evaluate a generative model on the CaloChallenge datasets."""

    transforms_module = transforms_module

    def init_physics(self):
        pass

    def init_data(self):
        self.hdf5_train = self.cfg.data.training_file
        self.hdf5_test = self.cfg.data.test_file
        self.particle_type = self.cfg.data.particle_type
        self.xml_filename = self.cfg.data.xml_filename
        self.train_val_frac = list(self.cfg.data.train_val_frac)

        LOGGER.info("init_data: preparing model training")
        self.transforms = build_pipeline(
            self.cfg.data.transforms, self.cfg.run_dir, self.transforms_module
        )
        LOGGER.info("init_data: list of preprocessing steps:")
        for transform in self.transforms:
            LOGGER.info(f"{transform.__class__.__name__}")

        common = dict(
            particle_type=self.particle_type,
            xml_filename=self.xml_filename,
            train_val_frac=self.train_val_frac,
            transform=self.transforms,
            rank=self.rank,
        )
        self.train_dataset = CaloChallengeDataset(self.hdf5_train, split="training", **common)
        self.val_dataset = CaloChallengeDataset(self.hdf5_train, split="validation", **common)
        self.layer_boundaries = self.train_dataset.layer_boundaries

    def _init_dataloader(self):
        self.batch_size = int(self.cfg.training.batchsize)
        n_data = self.mesh.shape[mesh_lib.DATA_AXIS]
        if self.batch_size % n_data:
            self.batch_size = (self.batch_size // n_data) * n_data
            LOGGER.warning(
                f"Rounded global batch size to {self.batch_size} (data axis {n_data})"
            )
        seed = self.cfg.get("seed") or 0
        self.train_iterator = BatchIterator(
            (self.train_dataset.layers, self.train_dataset.energy),
            self.batch_size,
            seed=seed,
        )
        self.batches_per_epoch = self.train_iterator.batches_per_epoch
        self._val_iterator = BatchIterator(
            (self.val_dataset.layers, self.val_dataset.energy),
            min(self.batch_size, len(self.val_dataset)) // n_data * n_data or n_data,
            seed=seed,
            shuffle=False,
        )
        LOGGER.info(
            f"init_dataloader: created training iterator with "
            f"{self.batches_per_epoch} batches"
        )
        LOGGER.info(
            f"init_dataloader: created validation iterator with "
            f"{self._val_iterator.batches_per_epoch} batches"
        )

    def val_batches(self):
        return self._val_iterator.epoch_batches()

    def _init_loss(self):
        pass

    def _init_metrics(self):
        pass

    def evaluate(self):
        pass

    # ------------------------------------------------------------------ sampling
    def generate_Einc_ds1(self, sample_multiplier=1000):
        """ds1 incident-energy spectrum: log2-spaced 2^8..2^18 plus thinned
        high-energy points (reference experiment.py:149-168)."""
        ret = np.logspace(8, 18, 11, base=2)
        ret = np.tile(ret, 10)
        ret = np.array(
            [
                *ret,
                *np.tile(2.0**19, 5),
                *np.tile(2.0**20, 3),
                *np.tile(2.0**21, 2),
                *np.tile(2.0**22, 1),
            ]
        )
        ret = np.tile(ret, sample_multiplier)
        np.random.shuffle(ret)
        return ret

    def _sampling_fn(self, model):
        """Jitted fixed-batch sampler for a model (compiled once)."""
        return jax.jit(lambda params, c, key: model.sample_batch(params, c, key))

    def _sample_in_batches(self, model, params, conds, key, batch_size):
        """Stream conditions through the jitted sampler; pad the last batch so
        every call hits the same compiled program.

        All batches are dispatched before any device->host fetch (jax dispatch
        is async), so the ODE compute of later batches overlaps the transfer
        of earlier ones instead of serializing with it — total time is
        max(compute, transfer) rather than their sum."""
        fn = self._sampling_fn(model)
        n = len(conds)
        pending = []
        sharding = mesh_lib.batch_sharding(self.mesh)
        for i, start in enumerate(range(0, n, batch_size)):
            c = conds[start : start + batch_size]
            n_real = len(c)
            if n_real < batch_size:
                c = np.concatenate([c, np.tile(c[-1:], (batch_size - n_real, 1))], axis=0)
            c_dev = jax.device_put(np.asarray(c, np.float32), sharding)
            pending.append((fn(params, c_dev, jax.random.fold_in(key, i)), n_real))
        return np.concatenate([np.asarray(s[:k]) for s, k in pending], axis=0)

    def sample_n(self):
        """Generate cfg.n_samples showers (or u-vectors for an energy model)."""
        t_0 = time.time()

        if str(self.cfg.evaluation.eval_dataset) in ("2", "3"):
            Einc = 10 ** np.random.uniform(3, 6, size=int(self.cfg.n_samples))
        else:
            Einc = self.generate_Einc_ds1()
        Einc = Einc.astype(np.float32)[:, None]

        # transform Einc to the basis used in training (cond_transform steps)
        dummy, transformed_cond = None, Einc
        for fn in self.transforms:
            if hasattr(fn, "cond_transform"):
                dummy, transformed_cond = fn(dummy, transformed_cond)

        batchsize_sample = int(self.cfg.training.batchsize_sample)

        if self.cfg.model_type == "shape":
            if self.cfg.sample_us:
                if getattr(self.cfg, "fused_generation", False):
                    # one-program two-stage chain (energy RK4 -> on-device u
                    # mapping -> shape RK4); falls back to the staged path if
                    # a u-transform has no device twin
                    from vit4hep_tpu.experiments.fused_chain import (
                        UnsupportedTransform)

                    try:
                        return self._sample_n_fused(
                            transformed_cond, batchsize_sample, t_0)
                    except UnsupportedTransform as e:
                        # a cached verdict was already warned about once
                        (LOGGER.debug if getattr(e, "cached", False)
                         else LOGGER.warning)(f"fused_generation: {e}")
                u_samples = self.sample_us(transformed_cond, batchsize_sample)
                transformed_cond = np.concatenate([u_samples, transformed_cond], axis=1)
            else:  # truth u's from the test set
                transformed_cond = CaloChallengeDataset(
                    self.hdf5_test,
                    self.particle_type,
                    self.xml_filename,
                    transform=self.transforms,
                    split="full",
                ).energy

        key_sample, self.base_key = jax.random.split(self.base_key)
        sample = self._sample_in_batches(
            self.model,
            self.state.params,
            np.asarray(transformed_cond, np.float32),
            key_sample,
            batchsize_sample,
        )

        sampling_time = time.time() - t_0
        LOGGER.info(
            f"sample_n: Finished generating {len(sample)} samples after {sampling_time} s."
        )
        self.last_sampling_time = sampling_time
        return sample, np.asarray(transformed_cond)

    def _sample_n_fused(self, transformed_cond, batch_size, t_0):
        """Two-stage generation as ONE jitted program per batch (VERDICT r3
        next #6): removes the per-batch device->host->device round trip the
        staged sample_us path pays between the energy and shape RK4 loops.
        Same streaming/padding discipline as _sample_in_batches."""
        from vit4hep_tpu.experiments.fused_chain import (
            UnsupportedTransform, chain_fingerprint, make_fused_generate)

        # cache the jitted chain across sample_n calls (plot + eval each
        # trigger one): the two-model program's compile is ~2x a train
        # step's — rebuilding the closure per call would retrace every time.
        # The key includes a transform-state fingerprint (the jitted closure
        # bakes the constants in at build time, so a refit/reload must
        # invalidate it) and a failed build caches a None sentinel so the
        # staged fallback doesn't rebuild + rewarn on every sample_n call.
        if not hasattr(self, "energy_model"):
            self.load_energy_model()
        gen_key = (str(self.cfg.energy_model),
                   chain_fingerprint(self.energy_model_transforms,
                                     self.transforms))
        if getattr(self, "_fused_gen_key", None) != gen_key:
            try:
                self._fused_gen = jax.jit(make_fused_generate(
                    self.model, self.energy_model,
                    self.energy_model_transforms, self.transforms))
            except UnsupportedTransform:
                self._fused_gen = None
                self._fused_gen_key = gen_key
                raise
            self._fused_gen_key = gen_key
        if self._fused_gen is None:
            e = UnsupportedTransform(
                "fused chain unavailable for this transform pipeline "
                "(cached verdict); using the staged path")
            e.cached = True
            raise e
        gen = self._fused_gen
        key, self.base_key = jax.random.split(self.base_key)
        conds = np.asarray(transformed_cond, np.float32)
        n = len(conds)
        sharding = mesh_lib.batch_sharding(self.mesh)
        pending = []
        for i, start in enumerate(range(0, n, batch_size)):
            c = conds[start: start + batch_size]
            n_real = len(c)
            if n_real < batch_size:
                c = np.concatenate(
                    [c, np.tile(c[-1:], (batch_size - n_real, 1))], axis=0)
            c_dev = jax.device_put(np.asarray(c, np.float32), sharding)
            out = gen(self.state.params, self.energy_model_params, c_dev,
                      jax.random.fold_in(key, i))
            pending.append((out, n_real))
        sample = np.concatenate(
            [np.asarray(s[:k]) for (s, _), k in pending], axis=0)
        full_cond = np.concatenate(
            [np.asarray(c2[:k]) for (_, c2), k in pending], axis=0)
        sampling_time = time.time() - t_0
        LOGGER.info(
            f"sample_n (fused chain): Finished generating {len(sample)} "
            f"samples after {sampling_time} s."
        )
        self.last_sampling_time = sampling_time
        return sample, full_cond

    def sample_us(self, transformed_cond, batchsize_sample):
        """Sample u-vectors from the (separately trained) energy model and map
        them into this model's u-basis (reference experiment.py:225-247)."""
        self.load_energy_model()

        t_0 = time.time()
        key_u, self.base_key = jax.random.split(self.base_key)
        u_samples = self._sample_in_batches(
            self.energy_model,
            self.energy_model_params,
            np.asarray(transformed_cond, np.float32),
            key_u,
            batchsize_sample,
        )
        LOGGER.info(
            f"sample_us: Finished generating {len(u_samples)} energy samples "
            f"after {time.time() - t_0} s."
        )

        for fn in self.energy_model_transforms[::-1]:
            if hasattr(fn, "u_transform"):
                u_samples, _ = fn(u_samples, None, rev=True)
        for fn in self.transforms:
            if hasattr(fn, "u_transform"):
                u_samples, _ = fn(u_samples, None)
        return np.asarray(u_samples, np.float32)

    def load_energy_model(self):
        """Re-instantiate the energy model from its own run dir
        (reference experiment.py:323-346)."""
        energy_model_cfg = OmegaConf.load(
            os.path.join(str(self.cfg.energy_model), "config.yaml")
        )
        self.energy_model_transforms = build_pipeline(
            energy_model_cfg.data.transforms,
            energy_model_cfg.run_dir,
            self.transforms_module,
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
            reference = CaloChallengeDataset(
                self.hdf5_test,
                self.particle_type,
                self.xml_filename,
                transform=self.transforms,
                split="full",
            ).layers

            # undo the u-space transforms down to (but excluding) NormalizeByElayer
            for fn in self.transforms[::-1]:
                if fn.__class__.__name__ == "NormalizeByElayer":
                    break
                samples, _ = fn(samples, conditions, rev=True)
                reference, _ = fn(reference, conditions, rev=True)

            samples[:, 1:] = np.clip(samples[:, 1:], 0.0, 1.0)
            reference[:, 1:] = np.clip(reference[:, 1:], 0.0, 1.0)

            from vit4hep_tpu.evaluation.us_evaluation import eval_ui_dists, plot_ui_dists

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                plot_ui_dists(np.asarray(samples), np.asarray(reference), cfg=self.cfg)
                eval_ui_dists(np.asarray(samples), np.asarray(reference), cfg=self.cfg)
        else:
            samples = samples[:, 0]  # drop channel dimension
            for fn in self.transforms[::-1]:
                samples, conditions = fn(samples, conditions, rev=True)

            self.save_sample(samples, conditions, name=f"_{self.cfg.run_idx}")
            from vit4hep_tpu.evaluation.ugr_evaluation import run_from_py

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                run_from_py(samples, conditions, self.cfg)

    def eval_sample(self, dirname=""):
        samples, energies = self.load_sample(dirname=dirname)
        from vit4hep_tpu.evaluation.ugr_evaluation import run_from_py

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            run_from_py(samples, energies, self.cfg)

    def save_sample(self, sample, energies, name=""):
        save_path = Path(self.cfg.run_dir) / f"samples{name}.hdf5"
        with h5py.File(save_path, "w") as f:
            f.create_dataset("incident_energies", data=energies, compression="gzip")
            f.create_dataset("showers", data=sample, compression="gzip")

    def load_sample(self, dirname=""):
        if dirname == "":
            dirname = str(Path(self.cfg.run_dir) / f"samples_{self.cfg.run_idx}.hdf5")
        LOGGER.info(f"load_sample: loading samples from {dirname}")
        with h5py.File(dirname, "r") as f:
            energies = f["incident_energies"][:]
            sample = f["showers"][:]
        return sample, energies
