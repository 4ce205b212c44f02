"""CaloHadronic dict-protocol preprocessing transforms (numpy).

Counterparts of `/root/reference/experiments/calohadronic/transforms.py`:
steps operate on a dict with keys ``ecal`` (B, 10|30, 15|180, 15|180 grids),
``hcal`` (B, 48, 30, 30), ``extra_dims`` (58 u's spanning ECal+HCal layers
jointly) and ``energy``. ``SumPool3dDownScale`` is the irreversible
30x180x180 -> 10x15x15 ECal downsample (reference :314-331).
"""

from __future__ import annotations

import os

import numpy as np

CALO_KEYS = ["ecal", "hcal"]


# one shared regularized logit across the transform families (the reference
# re-defines it per module; a numerical fix must not diverge between them)
from vit4hep_tpu.data.calochallenge.transforms import logit  # noqa: F401


class CaloHadGlobalStandardizeFromFile:
    """Global mean/std over non-saturated logit values of ecal+hcal+u's
    (reference :17-62)."""

    def __init__(self, model_dir, eps=1.0e-6):
        self.model_dir = str(model_dir)
        self.mean_path = os.path.join(self.model_dir, "means.npy")
        self.std_path = os.path.join(self.model_dir, "stds.npy")
        eps = float(eps)
        self.eps = float(np.log(eps / (1 - eps)))
        self.u_transform = True
        self.keys = CALO_KEYS + ["extra_dims"]
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


class CaloHadStandardizeUsFromFile:
    """Per-component u standardization with the (std+1) convention of the
    reference (:65-106)."""

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
            data_dict["extra_dims"] = us * (self.std_u + 1) + self.mean_u
            return data_dict
        if not self.written:
            self.mean_u = us.mean(0)
            self.std_u = us.std(0, ddof=1)
            if rank == 0:
                np.save(self.mean_us_path, self.mean_u)
                np.save(self.std_us_path, self.std_u)
            self.written = True
        data_dict["extra_dims"] = (us - self.mean_u) / (self.std_u + 1)
        return data_dict


class CaloHadPreprocessConds:
    """Min-max scale the incident energy (GeV, default [10, 90])
    (reference :109-133)."""

    def __init__(self, scale_E=(1e1, 9e1)):
        self.cond_transform = True
        self.lo, self.hi = float(scale_E[0]), float(scale_E[1])

    def __call__(self, data_dict, rev=False, rank=0):
        e = data_dict["energy"]
        if rev:
            data_dict["energy"] = e * (self.hi - self.lo) + self.lo
        else:
            data_dict["energy"] = (e - self.lo) / (self.hi - self.lo)
        return data_dict


class CaloHadScaleTotalEnergy:
    """Scale u_0 by a factor (reference :136-153)."""

    def __init__(self, factor):
        self.factor = float(factor)
        self.u_transform = True

    def __call__(self, data_dict, rev=False, rank=0):
        us = np.array(data_dict["extra_dims"])
        us[..., 0] = us[..., 0] / self.factor if rev else us[..., 0] * self.factor
        data_dict["extra_dims"] = us
        return data_dict


class CaloHadExclusiveLogitTransform:
    """(Rescaled) logit of ecal/hcal voxels and u's (reference :156-196)."""

    def __init__(self, delta, rescale=False):
        self.delta = float(delta)
        self.rescale = bool(rescale)
        self.u_transform = True
        self.keys = CALO_KEYS + ["extra_dims"]

    def __call__(self, data_dict, rev=False, rank=0):
        for key in [k for k in self.keys if k in data_dict]:
            x = data_dict[key]
            if rev:
                z = 1.0 / (1.0 + np.exp(-x))
                data_dict[key] = (z - self.delta) / (1 - 2 * self.delta) if self.rescale else z
            else:
                if self.rescale:
                    z = x * (1 - 2 * self.delta) + self.delta
                else:
                    z = np.clip(x, self.delta, 1 - self.delta)
                data_dict[key] = np.log(z / (1 - z))
        return data_dict


class CaloHadCutValues:
    """Reverse-only cut in normalized space (reference :199-220)."""

    def __init__(self, cut=0.0):
        self.cut = float(cut)
        self.keys = CALO_KEYS

    def __call__(self, data_dict, rev=False, rank=0):
        if rev and self.cut:
            for key in self.keys:
                shower = np.array(data_dict[key])
                shower[shower <= self.cut] = 0.0
                data_dict[key] = shower
        return data_dict


class CaloHadNormalizeByElayer:
    """Joint ECal+HCal u-space: per-layer unit normalization of each calo and
    one u-vector over all layers (u_0 = E_tot/E_inc, u_i = E_i/E_{>=i});
    reverse reconstructs the layer energies recursively (reference :223-289)."""

    def __init__(self, cut=0.0, eps=1.0e-10):
        self.keys = CALO_KEYS
        self.eps = float(eps)
        self.cut = float(cut)

    def __call__(self, data_dict, rev=False, rank=0):
        if rev:
            us = np.array(data_dict["extra_dims"])
            energy = np.asarray(data_dict["energy"])
            b, n_layers = us.shape
            us[:, 1:] = np.clip(us[:, 1:], 0.0, 1.0)
            # reference clamps in place — the saved dict carries clipped u's
            data_dict["extra_dims"] = us
            layer_es = []
            total_e = energy.reshape(-1) * us[:, 0]
            remaining = total_e.copy()
            for i in range(n_layers - 1):
                e_i = remaining * us[:, i + 1]
                layer_es.append(e_i)
                remaining = remaining - e_i
            layer_es.append(remaining)
            layer_es = np.stack(layer_es, axis=1)  # (B, L_total)

            offset = 0
            for key in self.keys:
                shower = np.array(data_dict[key])
                l_here = shower.shape[1]
                sums = shower.sum(axis=(-1, -2), keepdims=True) + self.eps
                shower = shower / sums
                if self.cut > 0.0:
                    shower[shower <= self.cut] = 0.0
                # ecal takes the first L_ecal layer energies, hcal the last
                # L_hcal (reference :268-276)
                if key == "ecal":
                    es = layer_es[:, :l_here]
                else:
                    es = layer_es[:, -l_here:]
                data_dict[key] = shower * es[:, :, None, None]
        else:
            all_layer_es = []
            for key in self.keys:
                shower = np.array(data_dict[key])
                b = shower.shape[0]
                layer_es = shower.sum(axis=(-1, -2))  # (B, L)
                data_dict[key] = shower / (layer_es[:, :, None, None] + self.eps)
                all_layer_es.append(layer_es)
            layer_es = np.concatenate(all_layer_es, axis=1)
            u_0 = layer_es.sum(axis=1, keepdims=True) / (
                np.asarray(data_dict["energy"]) + self.eps
            )
            remaining = np.cumsum(layer_es[:, ::-1], axis=1)[:, ::-1]
            us_rest = layer_es[:, :-1] / (remaining[:, :-1] + self.eps)
            data_dict["extra_dims"] = np.concatenate([u_0, us_rest], axis=1)
        return data_dict


class Reshape:
    """Per-calo reshape: forward flattens to (B, 1, n_voxels), reverse restores
    the 3-D grids (reference :292-311)."""

    def __init__(self, dict_shape):
        self.dict_shape = {k: tuple(v) for k, v in dict_shape.items()}
        self.keys = CALO_KEYS

    def __call__(self, data_dict, rev=False, rank=0):
        for key in self.keys:
            shape = self.dict_shape[key]
            if rev:
                data_dict[key] = np.reshape(data_dict[key], (-1, *shape))
            else:
                data_dict[key] = np.reshape(
                    data_dict[key], (-1, 1, int(np.prod(shape)))
                )
        return data_dict


class SumPool3dDownScale:
    """Irreversible sum-pool downsample of the ECal grid (reference :314-331)."""

    def __init__(self, calo="ecal", kernel=(3, 12, 12)):
        self.calo = calo
        self.kernel = tuple(int(k) for k in kernel)

    def __call__(self, data_dict, rev=False, rank=0):
        if rev:
            return data_dict
        x = np.asarray(data_dict[self.calo])
        b, l, h, w = x.shape
        kl, kh, kw = self.kernel
        x = x.reshape(b, l // kl, kl, h // kh, kh, w // kw, kw).sum(axis=(2, 4, 6))
        data_dict[self.calo] = x
        return data_dict


class AddLEMURSConditions:
    """Append fixed (theta, phi, label) conditions for LEMURS-backbone
    fine-tuning (reference :334-358)."""

    def __init__(self, theta=0.5, phi=0.5, label=(0.2, 0.2, 0.2, 0.2, 0.2)):
        self.theta = float(theta)
        self.phi = float(phi)
        self.label = list(label)
        self.n_conds = 2 + len(self.label)

    def __call__(self, data_dict, rev=False, rank=0):
        if rev:
            return data_dict
        n = len(np.atleast_1d(data_dict["energy"]))
        data_dict["additional_conds"] = np.tile(
            np.asarray([self.theta, self.phi] + self.label, np.float32), (n, 1)
        )
        return data_dict


def build_pipeline(transforms_cfg, run_dir, module=None):
    """Ordered dict-protocol pipeline with *FromFile run-dir injection.

    CaloHadronic injects only when the config leaves model_dir unset
    (reference experiment.py:54-56) — an explicit model_dir (e.g. reusing a
    pretrained run's normalization stats when fine-tuning) is honored.
    The other families overwrite unconditionally, as their references do."""
    import sys

    module = module or sys.modules[__name__]
    steps = []
    for name, kwargs in transforms_cfg.items():
        kwargs = dict(kwargs) if kwargs else {}
        if "FromFile" in name and kwargs.get("model_dir") is None:
            kwargs["model_dir"] = run_dir
        steps.append(getattr(module, name)(**kwargs))
    return steps
