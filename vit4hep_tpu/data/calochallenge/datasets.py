"""CaloChallenge dataset: eager HDF5 load + one-shot preprocessing on host.

Mirrors the reference's eager pipeline (experiments/calochallenge/datasets.py:
9-75, utils.py:8-53): showers are loaded layer-sliced from HDF5, the full
transform chain is applied once at construction, and train/val splits are taken
by fraction. Batches are plain numpy; the training loop device_puts them with a
data-axis sharding (vit4hep_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import h5py
import numpy as np

from vit4hep_tpu.data.xml_handler import XMLHandler
from vit4hep_tpu.utils.logger import LOGGER


def load_data(filename, particle_type, xml_filename):
    """Load incident energies and layer-sorted flat showers (MeV)."""
    xml = XMLHandler(particle_name=particle_type, filename=xml_filename)
    layer_boundaries = np.unique(xml.GetBinEdges())
    with h5py.File(filename, "r") as f:
        energy = f["incident_energies"][:].reshape(-1, 1)
        showers = f["showers"][:]
    # layer slicing is the identity permutation here (layers are stored sorted),
    # kept explicit for parity with reference utils.py:24-28
    layers = np.concatenate(
        [showers[..., s:e] for s, e in zip(layer_boundaries[:-1], layer_boundaries[1:])],
        axis=1,
    )
    return energy, layers, layer_boundaries


class CaloChallengeDataset:
    """In-RAM dataset of (shower, cond) with the transform chain pre-applied."""

    def __init__(
        self,
        hdf5_file,
        particle_type,
        xml_filename,
        train_val_frac=(0.7, 0.3),
        transform=None,
        split="full",
        dtype=np.float32,
        rank=0,
    ):
        assert split == "full" or train_val_frac[0] + train_val_frac[1] <= 1.0

        energy, layers, self.layer_boundaries = load_data(
            hdf5_file, particle_type, xml_filename
        )
        self.energy = energy.astype(dtype)
        self.layers = layers.astype(dtype)

        if transform:
            for fn in transform:
                self.layers, self.energy = fn(self.layers, self.energy, rank=rank)

        n = len(self.energy)
        trn_size = int(n * train_val_frac[0])
        # keep at least one validation event: a truncated-to-zero val_size
        # would make `[-0:]` the FULL dataset, silently validating on the
        # training rows (latent bug in the reference, datasets.py:49-60)
        val_size = max(1, int(n * train_val_frac[1])) if split == "validation" else 0
        if split == "training":
            # never overlap the splits: when the val fraction truncates to
            # zero events the validation split still forces one event from
            # the tail, so cap the training slice before it
            trn_size = min(trn_size, n - max(1, int(n * train_val_frac[1])))
            self.layers, self.energy = self.layers[:trn_size], self.energy[:trn_size]
        elif split == "validation":
            self.layers, self.energy = self.layers[-val_size:], self.energy[-val_size:]

        self.layers = np.ascontiguousarray(self.layers, dtype=dtype)
        self.energy = np.ascontiguousarray(self.energy, dtype=dtype)

        LOGGER.info(f"datasets: loaded {split} data with shape {self.layers.shape}")
        LOGGER.info(
            f"datasets: boundaries of dataset are ({self.layers.min()}, {self.layers.max()})"
        )

    def __len__(self):
        return len(self.energy)

    def __getitem__(self, idx):
        return self.layers[idx], self.energy[idx]


class BatchIterator:
    """Infinite shuffled batch stream over host arrays.

    Replaces DataLoader+DistributedSampler+cycle() (reference base_experiment.py:
    465-473): one process owns the global batch; sharding over devices happens at
    device_put time, not in the sampler. Batches have a fixed size (remainder of
    each epoch is dropped) so the jitted train step never recompiles.
    """

    def __init__(self, arrays, batch_size: int, seed: int = 0, shuffle: bool = True):
        self.arrays = arrays
        self.batch_size = int(batch_size)
        self.n = len(arrays[0])
        if self.n < self.batch_size:
            raise ValueError(f"dataset of {self.n} samples < batch size {self.batch_size}")
        self.rng = np.random.default_rng(seed)
        self.shuffle = shuffle
        self.batches_per_epoch = self.n // self.batch_size
        self._epoch_order = None
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._epoch_order is None or self._pos >= self.batches_per_epoch:
            self._epoch_order = (
                self.rng.permutation(self.n) if self.shuffle else np.arange(self.n)
            )
            self._pos = 0
        idx = self._epoch_order[
            self._pos * self.batch_size : (self._pos + 1) * self.batch_size
        ]
        self._pos += 1
        return tuple(a[idx] for a in self.arrays)

    def epoch_batches(self):
        """One full epoch of fixed-size batches (for validation)."""
        order = np.arange(self.n)
        for i in range(self.batches_per_epoch):
            idx = order[i * self.batch_size : (i + 1) * self.batch_size]
            yield tuple(a[idx] for a in self.arrays)
