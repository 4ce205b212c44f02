"""LEMURS dict-protocol preprocessing transforms (numpy).

Counterparts of `/root/reference/experiments/lemurs/transforms.py`: every step
maps a dict with keys ``showers`` (B, H, W, L), ``extra_dims`` (u-vectors),
``incident_energy/theta/phi`` and ``label``, and is invertible via
``rev=True``. The u-space construction (``LEMURSNormalizeByElayer``) is fully
vectorized with a right-to-left cumulative sum (reference :209-270).
"""

from __future__ import annotations

import os

import numpy as np


# one shared regularized logit across the transform families (the reference
# re-defines it per module; a numerical fix must not diverge between them)
from vit4hep_tpu.data.calochallenge.transforms import logit  # noqa: F401


class LEMURSGlobalStandardizeFromFile:
    """Global mean/std over non-saturated logit values of showers + u's,
    persisted as ``means.npy``/``stds.npy`` (reference :17-62)."""

    def __init__(self, model_dir, eps=1.0e-6):
        self.model_dir = str(model_dir)
        self.mean_path = os.path.join(self.model_dir, "means.npy")
        self.std_path = os.path.join(self.model_dir, "stds.npy")
        eps = float(eps)
        self.eps = float(np.log(eps / (1 - eps)))
        self.u_transform = True
        self.keys = ["showers", "extra_dims"]
        try:
            self.mean = float(np.load(self.mean_path))
            self.std = float(np.load(self.std_path))
            self.written = True
        except FileNotFoundError:
            self.written = False

    def __call__(self, data_dict, rev=False, rank=0):
        keys = [k for k in self.keys if k in data_dict]
        if rev:
            for key in keys:
                data_dict[key] = data_dict[key] * self.std + self.mean
            return data_dict
        if not self.written:
            flat = np.concatenate([np.ravel(data_dict[k]) for k in keys])
            mask = (flat > self.eps) & (flat < -self.eps)
            self.mean = float(flat[mask].mean())
            self.std = float(flat[mask].std(ddof=1))
            if rank == 0:
                np.save(self.mean_path, np.float32(self.mean))
                np.save(self.std_path, np.float32(self.std))
            self.written = True
        for key in keys:
            data_dict[key] = (data_dict[key] - self.mean) / self.std
        return data_dict


class LEMURSStandardizeUsFromFile:
    """Per-component u-vector standardization, persisted as
    ``means_u.npy``/``stds_u.npy`` (reference :65-106)."""

    def __init__(self, n_us, model_dir):
        self.model_dir = str(model_dir)
        self.mean_us_path = os.path.join(self.model_dir, "means_u.npy")
        self.std_us_path = os.path.join(self.model_dir, "stds_u.npy")
        self.n_us = int(n_us)
        self.u_transform = True
        try:
            self.mean_u = np.load(self.mean_us_path)
            self.std_u = np.load(self.std_us_path)
            self.written = True
        except FileNotFoundError:
            self.written = False

    def __call__(self, data_dict, rev=False, rank=0):
        us = data_dict["extra_dims"]
        if rev:
            data_dict["extra_dims"] = us * self.std_u + self.mean_u
            return data_dict
        if not self.written:
            self.mean_u = us.mean(0)
            self.std_u = us.std(0, ddof=1)
            if rank == 0:
                np.save(self.mean_us_path, self.mean_u)
                np.save(self.std_us_path, self.std_u)
            self.written = True
        data_dict["extra_dims"] = (us - self.mean_u) / self.std_u
        return data_dict


class LEMURSPreprocessConds:
    """Min-max scale E/theta/phi to [0, 1] (reference :108-133)."""

    def __init__(self, scale_E=(1e3, 1e6), scale_theta=(0.87, 2.27),
                 scale_phi=(-3.1416, 3.1416)):
        self.cond_transform = True
        self.keys = ["incident_energy", "incident_theta", "incident_phi"]
        self.rescaling = [list(scale_E), list(scale_theta), list(scale_phi)]

    def __call__(self, data_dict, rev=False, rank=0):
        for n, key in enumerate(self.keys):
            lo, hi = self.rescaling[n]
            if rev:
                data_dict[key] = data_dict[key] * (hi - lo) + lo
            else:
                data_dict[key] = (data_dict[key] - lo) / (hi - lo)
        return data_dict


class LEMURSScaleTotalEnergy:
    """Scale u_0 = E_tot/E_inc by a factor (reference :136-153)."""

    def __init__(self, factor):
        self.factor = float(factor)
        self.u_transform = True

    def __call__(self, data_dict, rev=False, rank=0):
        us = np.array(data_dict["extra_dims"])
        us[..., 0] = us[..., 0] / self.factor if rev else us[..., 0] * self.factor
        data_dict["extra_dims"] = us
        return data_dict


class LEMURSExclusiveLogitTransform:
    """(Rescaled) logit of showers and u's (reference :156-180)."""

    def __init__(self, delta, rescale=False):
        self.delta = float(delta)
        self.rescale = bool(rescale)
        self.u_transform = True
        self.keys = ["showers", "extra_dims"]

    def __call__(self, data_dict, rev=False, rank=0):
        for key in [k for k in self.keys if k in data_dict]:
            x = data_dict[key]
            if rev:
                if self.rescale:
                    data_dict[key] = logit(x, alpha=self.delta, inv=True)
                else:
                    data_dict[key] = 1.0 / (1.0 + np.exp(-x))
            else:
                if self.rescale:
                    data_dict[key] = logit(x, alpha=self.delta)
                else:
                    xc = np.clip(x, self.delta, 1 - self.delta)
                    data_dict[key] = np.log(xc / (1 - xc))
        return data_dict


class LEMURSCutValues:
    """Reverse-only cut in normalized space (reference :183-205)."""

    def __init__(self, cut=0.0):
        self.cut = float(cut)

    def __call__(self, data_dict, rev=False, rank=0):
        if rev and self.cut:
            shower = np.array(data_dict["showers"])
            shower[shower <= self.cut] = 0.0
            data_dict["showers"] = shower
        return data_dict


class LEMURSNormalizeByElayer:
    """u-space construction on (B, H, W, L) showers: per-layer unit
    normalization + u-vector (u_0 = E_tot/E_inc, u_i = E_i/E_{>=i}), fully
    vectorized; reverse reconstructs layer energies recursively
    (reference :209-270)."""

    def __init__(self, cut=0.0, eps=1.0e-10):
        self.eps = float(eps)
        self.cut = float(cut)

    def __call__(self, data_dict, rev=False, rank=0):
        shower = np.array(data_dict["showers"])
        b, h, w, n_layers = shower.shape
        if rev:
            us = np.array(data_dict["extra_dims"])
            energy = np.asarray(data_dict["incident_energy"])
            us[:, 1:] = np.clip(us[:, 1:], 0.0, 1.0)
            # the reference clamps in place, so the clipped u's are what ends
            # up in the saved sample dict — mirror that
            data_dict["extra_dims"] = us
            layer_es = []
            total_e = energy.reshape(-1) * us[:, 0]
            remaining = total_e.copy()
            for i in range(n_layers - 1):
                e_i = remaining * us[:, i + 1]
                layer_es.append(e_i)
                remaining = remaining - e_i
            layer_es.append(remaining)
            layer_es = np.stack(layer_es, axis=1).reshape(b, 1, 1, n_layers)

            shower = shower / (shower.sum(axis=(1, 2), keepdims=True) + self.eps)
            if self.cut > 0.0:
                shower[shower <= self.cut] = 0.0
            shower = shower * layer_es
        else:
            layer_es = shower.sum(axis=(1, 2))  # (B, L)
            shower = shower / (layer_es.reshape(b, 1, 1, n_layers) + self.eps)
            u_0 = layer_es.sum(axis=1, keepdims=True) / (
                np.asarray(data_dict["incident_energy"]) + self.eps
            )
            remaining = np.cumsum(layer_es[:, ::-1], axis=1)[:, ::-1]
            us_rest = layer_es[:, :-1] / (remaining[:, :-1] + self.eps)
            data_dict["extra_dims"] = np.concatenate([u_0, us_rest], axis=1)
        data_dict["showers"] = shower
        return data_dict


def build_pipeline(transforms_cfg, run_dir, module=None):
    """Ordered dict-protocol pipeline with *FromFile run-dir injection."""
    import sys

    module = module or sys.modules[__name__]
    steps = []
    for name, kwargs in transforms_cfg.items():
        kwargs = dict(kwargs) if kwargs else {}
        if "FromFile" in name:
            kwargs["model_dir"] = run_dir
        steps.append(getattr(module, name)(**kwargs))
    return steps
