"""LEMURS multi-detector data pipeline: lazy multi-file HDF5 with an LRU
handle cache and batch-level transforms.

Counterpart of `/root/reference/experiments/lemurs/datasets.py`: a global
``(file, local_index, class_idx)`` index map over all detector files, a "dumb"
per-index reader, and a batch-aware collator that one-hot encodes the detector
label and applies the transform pipeline per batch. The torch
DataLoader/worker machinery is replaced by :class:`CollatedBatchIterator`,
which groups shuffled indices by file so each batch needs at most a handful of
contiguous HDF5 reads, and prefetches the next batch on a background thread
while the device is busy.
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict

import h5py
import numpy as np

from vit4hep_tpu.utils.logger import LOGGER


def load_data(hdf5_file, local_index=None, dtype="float32"):
    """Read one event (or all) from a structured ``events`` table
    (reference utils.py:5-25)."""
    slicer = local_index if local_index is not None else slice(None)
    event = hdf5_file["events"][slicer]
    data = {
        "incident_energy": np.asarray(event["incident_energy"], dtype),
        "incident_theta": np.asarray(event["incident_theta"], dtype),
        "incident_phi": np.asarray(event["incident_phi"], dtype),
        "showers": np.asarray(event["showers"], dtype),
    }
    if local_index is not None and np.isscalar(local_index):
        data = {k: v[None] for k, v in data.items()}
    for key in ("incident_energy", "incident_theta", "incident_phi"):
        if data[key].ndim == 1:
            data[key] = data[key][:, None]
    return data


class LEMURSDataset:
    """Index map over {label: [files]} with an LRU cache of open handles
    (reference datasets.py:12-81)."""

    def __init__(self, hdf5_files_dict, max_files_per_worker=4, dtype="float32"):
        self.max_open_files = int(max_files_per_worker)
        self.open_files_cache = OrderedDict()
        self.dtype = dtype
        self.label_to_idx = {label: i for i, label in enumerate(hdf5_files_dict.keys())}
        self.num_classes = len(self.label_to_idx)
        self.index_map = self._build_index_map(hdf5_files_dict)
        LOGGER.info(f"Dataset indexed with {len(self.index_map)} samples.")

    def _build_index_map(self, hdf5_files_dict):
        index_map = []
        for label, file_list in hdf5_files_dict.items():
            class_idx = self.label_to_idx[label]
            for file_path in file_list:
                try:
                    with h5py.File(file_path, "r") as f:
                        n = len(f["events"])
                    index_map.extend(
                        (file_path, local, class_idx) for local in range(n)
                    )
                except (OSError, KeyError) as e:
                    LOGGER.error(f"Could not read {file_path} for class {label}: {e}")
        return index_map

    def _get_file_handle(self, file_path):
        if file_path in self.open_files_cache:
            self.open_files_cache.move_to_end(file_path)
            return self.open_files_cache[file_path]
        if len(self.open_files_cache) >= self.max_open_files:
            _, old = self.open_files_cache.popitem(last=False)
            old.close()
        handle = h5py.File(file_path, "r")
        self.open_files_cache[file_path] = handle
        return handle

    def __len__(self):
        return len(self.index_map)

    def read_indices(self, indices):
        """Read a batch of global indices, grouped by file and sorted locally
        so h5py fancy-indexing is a few contiguous reads instead of per-event
        seeks. Returns (data_dict, class_indices) in the requested order."""
        by_file: dict = {}
        for pos, idx in enumerate(indices):
            file_path, local, class_idx = self.index_map[idx]
            by_file.setdefault(file_path, []).append((pos, local, class_idx))

        n = len(indices)
        parts = [None] * n
        classes = np.empty(n, np.int32)
        for file_path, items in by_file.items():
            handle = self._get_file_handle(file_path)
            order = sorted(range(len(items)), key=lambda i: items[i][1])
            locals_sorted = [items[i][1] for i in order]
            block = load_data_rows(handle, locals_sorted, self.dtype)
            for out_row, i in enumerate(order):
                pos, _, class_idx = items[i]
                parts[pos] = {k: v[out_row] for k, v in block.items()}
                classes[pos] = class_idx
        data = {
            k: np.stack([p[k] for p in parts]) for k in parts[0]
        }
        return data, classes


def load_data_rows(hdf5_file, rows, dtype="float32"):
    event = hdf5_file["events"][rows]
    data = {
        "incident_energy": np.asarray(event["incident_energy"], dtype).reshape(len(rows), -1),
        "incident_theta": np.asarray(event["incident_theta"], dtype).reshape(len(rows), -1),
        "incident_phi": np.asarray(event["incident_phi"], dtype).reshape(len(rows), -1),
        "showers": np.asarray(event["showers"], dtype),
    }
    return data


class LEMURSCollator:
    """Batch-level transform application + one-hot detector label
    (reference datasets.py:84-167)."""

    def __init__(self, hdf5_train_dict, transforms, num_classes, gen_label=None,
                 return_us=False, rank=0, dtype="float32"):
        self.transforms = transforms
        self.num_classes = int(num_classes)
        self.gen_label = gen_label
        self.return_us = bool(return_us)
        self.rank = rank
        # warm up file-backed transform state on the first file
        file_0_path = next(iter(hdf5_train_dict.values()))[0]
        if self.transforms:
            with h5py.File(file_0_path, "r") as f:
                dummy = load_data(f, local_index=None, dtype=dtype)
            for fn in self.transforms:
                dummy = fn(dummy, rank=self.rank)
            del dummy

    def __call__(self, batch_dict, class_indices):
        if self.gen_label is not None:
            labels = np.tile(
                np.asarray(self.gen_label, np.float32), (len(class_indices), 1)
            )
        else:
            labels = np.eye(self.num_classes, dtype=np.float32)[class_indices]
        batch_dict = dict(batch_dict)
        batch_dict["label"] = labels

        if self.transforms:
            for fn in self.transforms:
                batch_dict = fn(batch_dict)

        if self.return_us:
            energy_ratios = batch_dict.pop("extra_dims")
            conds = np.concatenate(
                [batch_dict["incident_energy"], batch_dict["incident_theta"],
                 batch_dict["incident_phi"]], axis=-1,
            )
            return np.asarray(energy_ratios, np.float32), np.asarray(conds, np.float32)
        shower = batch_dict.pop("showers")
        conds = np.concatenate(
            [batch_dict["extra_dims"], batch_dict["incident_energy"],
             batch_dict["incident_theta"], batch_dict["incident_phi"],
             batch_dict["label"]], axis=-1,
        )
        return np.asarray(shower, np.float32), np.asarray(conds, np.float32)


class CollatedBatchIterator:
    """Shuffled epoch iterator with one-batch background prefetch."""

    def __init__(self, dataset: LEMURSDataset, collator: LEMURSCollator,
                 batch_size: int, seed=0, shuffle=True, drop_last=True):
        self.dataset = dataset
        self.collator = collator
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        n = len(dataset)
        self.batches_per_epoch = (
            n // self.batch_size if drop_last else -(-n // self.batch_size)
        )

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _produce(self, out_q):
        # exceptions must reach the consumer: a silently-dead producer leaves
        # epoch_batches() blocked on out_q.get() forever
        try:
            idx = self._epoch_indices()
            for start in range(0, self.batches_per_epoch * self.batch_size, self.batch_size):
                batch_idx = idx[start : start + self.batch_size]
                data, classes = self.dataset.read_indices(batch_idx)
                out_q.put(self.collator(data, classes))
            out_q.put(None)
        except BaseException as exc:  # noqa: BLE001 — re-raised consumer-side
            out_q.put(exc)

    def epoch_batches(self):
        out_q: queue.Queue = queue.Queue(maxsize=2)
        worker = threading.Thread(target=self._produce, args=(out_q,), daemon=True)
        worker.start()
        while True:
            item = out_q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def __iter__(self):
        while True:
            yield from self.epoch_batches()

    def __next__(self):
        if not hasattr(self, "_iter"):
            self._iter = iter(self)
        return next(self._iter)


def enable_native_cache(dataset: LEMURSDataset, cache_dir, spec: dict):
    """Switch a lazy dataset's ``read_indices`` to the native mmap record cache
    (vit4hep_tpu/data/native_cache.py). The cache is built once from the HDF5
    files (in index-map order, so global indices line up) and reused across
    runs; class indices stay host-side numpy.
    """
    import os

    from vit4hep_tpu.data.native_cache import NativeRecordCache, build_cache

    import hashlib

    cache_dir = str(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    # fingerprint the exact record set: file paths in order, per-file counts,
    # and the field spec — a record count alone collides (e.g. a validation
    # split with the same event total as training would reuse its cache)
    counts: dict = {}
    for file_path, _, _ in dataset.index_map:
        counts[file_path] = counts.get(file_path, 0) + 1
    fingerprint = hashlib.sha1(
        repr((sorted(counts.items()), sorted(map(str, spec)))).encode()
    ).hexdigest()[:12]
    tag = f"{type(dataset).__name__}_{len(dataset.index_map)}_{fingerprint}"
    cache_path = os.path.join(cache_dir, f"{tag}.v4cache")

    # per-record class indices in index-map order
    classes = np.asarray([c for (_, _, c) in dataset.index_map], np.int32)

    if not os.path.exists(cache_path):
        import h5py

        seen = []
        files_in_order = []
        for file_path, _, _ in dataset.index_map:
            if file_path not in seen:
                seen.append(file_path)
                files_in_order.append(file_path)

        def batches():
            for fp in files_in_order:
                with h5py.File(fp, "r") as f:
                    events = f["events"][:]
                yield {
                    k: np.asarray(events[k], np.float32).reshape(len(events), -1)
                    for k in spec
                }

        # atomic: a crash mid-build must not leave a half-written cache that
        # poisons every later run, and concurrent builders must not interleave
        tmp_path = f"{cache_path}.tmp.{os.getpid()}"
        build_cache(tmp_path, batches(), spec)
        os.replace(tmp_path, cache_path)

    cache = NativeRecordCache(cache_path, spec)
    if len(cache) != len(dataset.index_map):
        raise ValueError(
            f"native cache has {len(cache)} records, dataset has "
            f"{len(dataset.index_map)} — delete {cache_path} to rebuild"
        )

    def read_indices(indices):
        data = cache.gather(np.asarray(indices))
        return data, classes[np.asarray(indices)]

    dataset.read_indices = read_indices
    dataset._native_cache = cache  # keep alive
    LOGGER.info(f"Using native record cache {cache_path}")
    return dataset
