"""CaloGAN dict-protocol preprocessing transforms (numpy).

Counterparts of `/root/reference/experiments/calogan/transforms.py`: every step
maps a dict with keys ``layer_0/layer_1/layer_2/extra_dims/energy`` and is
invertible via ``rev=True``. All math is host-side numpy — preprocessing runs
once at dataset construction; the device only ever sees preprocessed arrays.
"""

from __future__ import annotations

import os

import numpy as np

from vit4hep_tpu.data.calochallenge.transforms import logit

LAYER_KEYS = ["layer_0", "layer_1", "layer_2"]


class GlobalStandardizeFromFileGAN:
    """Single global mean/std over the non-saturated logit values of all layer
    keys, persisted as ``means.npy``/``stds.npy`` in the run dir
    (reference transforms.py:9-53)."""

    def __init__(self, model_dir, eps=1.0e-6):
        self.model_dir = str(model_dir)
        self.mean_path = os.path.join(self.model_dir, "means.npy")
        self.std_path = os.path.join(self.model_dir, "stds.npy")
        self.u_transform = True
        self.layer_keys = LAYER_KEYS + ["extra_dims"]
        eps = float(eps)
        self.eps = float(np.log(eps / (1 - eps)))  # logit(eps)
        try:
            self.mean = float(np.load(self.mean_path))
            self.std = float(np.load(self.std_path))
            self.written = True
        except FileNotFoundError:
            self.written = False

    def __call__(self, data_dict, rev=False, rank=0):
        keys = [k for k in self.layer_keys if k in data_dict]
        if rev:
            for key in keys:
                data_dict[key] = data_dict[key] * self.std + self.mean
            return data_dict
        if not self.written:
            shower = np.concatenate([data_dict[k] for k in keys], axis=1)
            mask = (shower > self.eps) & (shower < -self.eps)
            self.mean = float(shower[mask].mean())
            self.std = float(shower[mask].std(ddof=1))
            if rank == 0:
                np.save(self.mean_path, np.float32(self.mean))
                np.save(self.std_path, np.float32(self.std))
            self.written = True
        for key in keys:
            data_dict[key] = (data_dict[key] - self.mean) / self.std
        return data_dict


class LogEnergyGAN:
    """log(E + alpha) on the incident energy (reference :56-72)."""

    def __init__(self, alpha=0.0):
        self.alpha = float(alpha)
        self.cond_transform = True

    def __call__(self, data_dict, rev=False, rank=0):
        e = data_dict["energy"]
        data_dict["energy"] = np.exp(e) - self.alpha if rev else np.log(e + self.alpha)
        return data_dict


class ScaleEnergyGAN:
    """Min-max scale of (log-)energy to [0, 1] (reference :75-100)."""

    def __init__(self, e_min, e_max):
        self.e_min = float(e_min)
        self.e_max = float(e_max)
        self.cond_transform = True

    def __call__(self, data_dict, rev=False, rank=0):
        e = data_dict["energy"]
        if rev:
            data_dict["energy"] = e * (self.e_max - self.e_min) + self.e_min
        else:
            data_dict["energy"] = (e - self.e_min) / (self.e_max - self.e_min)
        return data_dict


class ExclusiveLogitTransformGAN:
    """(Rescaled) logit of layer voxels and u's (reference :103-126)."""

    def __init__(self, delta, exclusions=None, rescale=False):
        self.delta = float(delta)
        self.exclusions = exclusions
        self.rescale = bool(rescale)
        self.u_transform = True
        self.layer_keys = LAYER_KEYS + ["extra_dims"]

    @staticmethod
    def _plain_logit(x, eps):
        x = np.clip(x, eps, 1 - eps)
        return np.log(x / (1 - x))

    def __call__(self, data_dict, rev=False, rank=0):
        keys = [k for k in self.layer_keys if k in data_dict]
        for key in keys:
            if rev:
                if self.rescale:
                    data_dict[key] = logit(data_dict[key], alpha=self.delta, inv=True)
                else:
                    data_dict[key] = 1.0 / (1.0 + np.exp(-data_dict[key]))
            else:
                if self.rescale:
                    data_dict[key] = logit(data_dict[key], alpha=self.delta)
                else:
                    data_dict[key] = self._plain_logit(data_dict[key], self.delta)
        return data_dict


class NormalizeLayerEnergyGAN:
    """u-space construction for the 3-layer CaloGAN geometry: normalize each
    layer to unit sum and store ``extra_dims`` = (u_0=E_tot/E_inc,
    u_i=E_i/E_{>=i}); reverse reconstructs layer energies recursively
    (reference :129-194)."""

    def __init__(self, cut=0.0, eps=1.0e-10):
        self.bin_edges = [0, 288, 432, 504]
        self.eps = float(eps)
        self.cut = float(cut)
        self.layer_keys = LAYER_KEYS
        self.n_layers = 3

    def __call__(self, data_dict, rev=False, rank=0):
        energy = data_dict["energy"]
        if rev:
            us = np.array(data_dict["extra_dims"])
            us[:, -(self.n_layers - 1):] = np.clip(us[:, -(self.n_layers - 1):], 0.0, 1.0)
            # reference clamps in place — the saved dict carries clipped u's
            data_dict["extra_dims"] = us
            total_e = energy.reshape(-1) * us[:, 0]
            layer_es = []
            cum = np.zeros_like(total_e)
            for i in range(us.shape[-1] - 1):
                e_i = (total_e - cum) * us[:, i + 1]
                layer_es.append(e_i)
                cum = cum + e_i
            layer_es.append(total_e - cum)
            layer_es = np.stack(layer_es, axis=1)
            for i, key in enumerate(self.layer_keys):
                layer = np.array(data_dict[key])
                layer = layer / (layer.sum(-1, keepdims=True) + self.eps)
                layer[layer <= self.cut] = 0.0
                data_dict[key] = layer * layer_es[:, [i]]
        else:
            layer_es = []
            for key in self.layer_keys:
                e_l = data_dict[key].sum(axis=1, keepdims=True)
                data_dict[key] = data_dict[key] / (e_l + self.eps)
                layer_es.append(e_l)
            layer_es = np.concatenate(layer_es, axis=1)
            extra = [layer_es.sum(axis=1, keepdims=True) / energy.reshape(-1, 1)]
            for i in range(layer_es.shape[1] - 1):
                remaining = layer_es[:, i:].sum(axis=1, keepdims=True)
                extra.append(layer_es[:, [i]] / (remaining + self.eps))
            data_dict["extra_dims"] = np.concatenate(extra, axis=1)
        return data_dict


def build_pipeline(transforms_cfg, run_dir, module=None):
    """Instantiate the ordered dict-protocol pipeline from cfg.data.transforms,
    injecting the run dir into *FromFile steps (reference experiment.py:52-55)."""
    import sys

    module = module or sys.modules[__name__]
    steps = []
    for name, kwargs in transforms_cfg.items():
        kwargs = dict(kwargs) if kwargs else {}
        if "FromFile" in name:
            kwargs["model_dir"] = run_dir
        steps.append(getattr(module, name)(**kwargs))
    return steps
