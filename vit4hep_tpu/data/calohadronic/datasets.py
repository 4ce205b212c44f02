"""CaloHadronic (ECal+HCal) data pipeline: lazy multi-file HDF5 + batch-level
transforms (reference `/root/reference/experiments/calohadronic/datasets.py`).

Reuses the LEMURS LRU/prefetch machinery; the events table carries
``energy`` (GeV), ``ecal`` (30x180x180 raw -> downsampled to 10x15x15 by the
transform pipeline) and ``hcal`` (48x30x30) fields. The collator concatenates
the flattened calos into one (B, 1, 45450) shower and builds the
[u's, energy(, additional_conds)] condition vector (reference :128-141).
"""

from __future__ import annotations

import h5py
import numpy as np

from vit4hep_tpu.data.lemurs.datasets import CollatedBatchIterator  # noqa: F401
from vit4hep_tpu.data.lemurs.datasets import LEMURSDataset
from vit4hep_tpu.utils.logger import LOGGER


def load_data(hdf5_file, local_index=None, dtype="float32"):
    """Read energy/ecal/hcal from a structured events table
    (reference utils.py:4-21)."""
    slicer = local_index if local_index is not None else slice(None)
    event = hdf5_file["events"][slicer]
    data = {
        "energy": np.asarray(event["energy"], dtype),
        "ecal": np.asarray(event["ecal"], dtype),
        "hcal": np.asarray(event["hcal"], dtype),
    }
    if local_index is not None and np.isscalar(local_index):
        data = {k: v[None] for k, v in data.items()}
    if data["energy"].ndim == 1:
        data["energy"] = data["energy"][:, None]
    return data


class CaloHadDataset(LEMURSDataset):
    """Index map + LRU handle cache over the CaloHadronic event files."""

    def read_indices(self, indices):
        by_file: dict = {}
        for pos, idx in enumerate(indices):
            file_path, local, _class_idx = self.index_map[idx]
            by_file.setdefault(file_path, []).append((pos, local))

        n = len(indices)
        parts = [None] * n
        for file_path, items in by_file.items():
            handle = self._get_file_handle(file_path)
            order = sorted(range(len(items)), key=lambda i: items[i][1])
            rows = [items[i][1] for i in order]
            event = handle["events"][rows]
            block = {
                "energy": np.asarray(event["energy"], self.dtype).reshape(len(rows), -1),
                "ecal": np.asarray(event["ecal"], self.dtype),
                "hcal": np.asarray(event["hcal"], self.dtype),
            }
            for out_row, i in enumerate(order):
                pos, _ = items[i]
                parts[pos] = {k: v[out_row] for k, v in block.items()}
        data = {k: np.stack([p[k] for p in parts]) for k in parts[0]}
        return data, np.zeros(n, np.int32)


class CaloHadCollator:
    """Batch-level transforms; returns (u's, energy) for energy models or
    (flat ecal+hcal shower, [u's, energy(, additional_conds)]) for shape models
    (reference datasets.py:82-141)."""

    def __init__(self, hdf5_train_dict, transforms, return_us=False, rank=0,
                 dtype="float32"):
        self.transforms = transforms
        self.return_us = bool(return_us)
        self.rank = rank
        file_0_path = next(iter(hdf5_train_dict.values()))[0]
        if self.transforms:
            with h5py.File(file_0_path, "r") as f:
                dummy = load_data(f, local_index=None, dtype=dtype)
            for fn in self.transforms:
                dummy = fn(dummy, rank=self.rank)
            del dummy
        LOGGER.debug("CaloHadCollator initialized")

    def __call__(self, batch_dict, _class_indices):
        batch_dict = dict(batch_dict)
        if self.transforms:
            for fn in self.transforms:
                batch_dict = fn(batch_dict)
        if self.return_us:
            us = batch_dict.pop("extra_dims")
            return np.asarray(us, np.float32), np.asarray(batch_dict["energy"], np.float32)
        ecal = batch_dict.pop("ecal")
        hcal = batch_dict.pop("hcal")
        shower = np.concatenate([ecal, hcal], axis=2)
        conds = np.concatenate([batch_dict["extra_dims"], batch_dict["energy"]], axis=-1)
        if batch_dict.get("additional_conds") is not None:
            conds = np.concatenate([conds, batch_dict["additional_conds"]], axis=-1)
        return np.asarray(shower, np.float32), np.asarray(conds, np.float32)
