"""Invertible preprocessing pipeline for CaloChallenge showers (numpy, host-side).

Re-implements every transform class of the reference
(`/root/reference/experiments/calochallenge/transforms.py`) with the same class
names, constructor kwargs, and step protocol

    __call__(shower, energy, rev=False, rank=0) -> (shower, energy)

so that the ``cfg.data.transforms`` ordered dicts in existing configs resolve
unchanged. Marker attributes ``u_transform`` / ``cond_transform`` select the
steps applied to sampled u-vectors / conditions at generation time, as in the
reference (experiments/calochallenge/experiment.py:188-190, 240-246).

Differences from the reference (by design, not behavior):
- numpy instead of torch; the pipeline runs once on the host at dataset
  construction (eager), so device transfer happens only for training batches.
- ``NormalizeByElayer`` is fully vectorized: layer sums via ``np.add.reduceat``
  and the recursive reverse energy reconstruction via cumulative products,
  replacing the reference's per-layer Python loops (transforms.py:344-397).
"""

from __future__ import annotations

import os

import numpy as np

from vit4hep_tpu.data.xml_handler import XMLHandler

_rng = np.random.default_rng()


def seed_transforms(seed: int):
    """Seed the noise source used by stochastic transforms."""
    global _rng
    _rng = np.random.default_rng(seed)


def logit(array, alpha=1.0e-6, inv=False):
    """Regularized logit / its inverse (reference transforms.py:11-18)."""
    if inv:
        z = 1.0 / (1.0 + np.exp(-array))
        return (z - alpha) / (1 - 2 * alpha)
    z = array * (1 - 2 * alpha) + alpha
    return np.log(z / (1 - z))


class GlobalStandardizeFromFile:
    """Scalar standardization with stats computed on first call and persisted as
    ``means.npy``/``stds.npy`` in the run dir (on-disk contract of the reference,
    transforms.py:21-64). ``exclude_zeros`` drops saturated-logit entries."""

    def __init__(self, model_dir, exclude_zeros=True, eps=1.0e-6):
        self.model_dir = model_dir
        self.mean_path = os.path.join(model_dir, "means.npy")
        self.std_path = os.path.join(model_dir, "stds.npy")
        self.u_transform = True
        self.exclude_zeros = exclude_zeros
        self.eps = float(np.log(eps / (1 - eps)))  # logit(eps)
        try:
            self.mean = np.load(self.mean_path)
            self.std = np.load(self.std_path)
            self.written = True
        except FileNotFoundError:
            self.written = False

    def write(self):
        np.save(self.mean_path, np.asarray(self.mean))
        np.save(self.std_path, np.asarray(self.std))

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            return shower * self.std + self.mean, energy
        if not self.written:
            if self.exclude_zeros:
                mask = (shower > self.eps) & (shower < -self.eps)
            else:
                mask = np.ones_like(shower, dtype=bool)
            vals = shower[mask]
            self.mean = vals.mean()
            self.std = vals.std(ddof=1)
            if rank == 0:
                self.write()
            self.written = True
        return (shower - self.mean) / self.std, energy


class StandardizeUsFromFile:
    """Per-dimension standardization of the trailing ``n_us`` u-features,
    persisted as ``means_u.npy``/``stds_u.npy`` (reference transforms.py:67-110)."""

    def __init__(self, n_us, model_dir):
        self.model_dir = model_dir
        self.mean_us_path = os.path.join(model_dir, "means_u.npy")
        self.std_us_path = os.path.join(model_dir, "stds_u.npy")
        self.n_us = n_us
        self.u_transform = True
        try:
            self.mean_u = np.load(self.mean_us_path)
            self.std_u = np.load(self.std_us_path)
            self.written = True
        except FileNotFoundError:
            self.written = False

    def write(self):
        np.save(self.mean_us_path, np.asarray(self.mean_u))
        np.save(self.std_us_path, np.asarray(self.std_u))

    def __call__(self, shower, energy, rev=False, rank=0):
        us = shower[:, -self.n_us :]
        voxels = shower[:, : -self.n_us]
        if rev:
            trafo = us * self.std_u + self.mean_u
        else:
            if not self.written:
                self.mean_u = us.mean(0)
                self.std_u = us.std(0, ddof=1)
                if rank == 0:
                    self.write()
                self.written = True
            trafo = (us - self.mean_u) / self.std_u
        return np.concatenate((voxels, trafo), axis=1), energy


class SelectDims:
    """Keep features in [start, end) — negative indices allowed
    (reference transforms.py:113-127). Irreversible (rev is a no-op)."""

    def __init__(self, start, end):
        self.indices = np.arange(start, end)

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            return shower, energy
        return shower[..., self.indices], energy


class AddFeaturesToCond:
    """Move features past ``split_index`` into the condition vector
    (reference transforms.py:130-146)."""

    def __init__(self, split_index):
        self.split_index = split_index

    def __call__(self, x, c, rev=False, rank=0):
        if rev:
            c_, split = c[:, -1:], c[:, :-1]
            x_ = np.concatenate([x, split], axis=1)
        else:
            x_, split = x[:, : self.split_index], x[:, self.split_index :]
            c_ = np.concatenate([split, c], axis=1)
        return x_, c_


class LogEnergy:
    def __init__(self, alpha=0.0):
        self.alpha = alpha
        self.cond_transform = True

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            return shower, np.exp(energy) - self.alpha
        return shower, np.log(energy + self.alpha)


class ScaleVoxels:
    def __init__(self, factor):
        self.factor = factor

    def __call__(self, shower, energy, rev=False, rank=0):
        return (shower / self.factor if rev else shower * self.factor), energy


class ScaleTotalEnergy:
    """Scale only u_0 = E_tot/E_inc (column -n_layers), reference :184-202."""

    def __init__(self, factor, n_layers=45):
        self.factor = factor
        self.n_layers = n_layers
        self.u_transform = True

    def __call__(self, shower, energy, rev=False, rank=0):
        shower = shower.copy()
        if rev:
            shower[..., -self.n_layers] /= self.factor
        else:
            shower[..., -self.n_layers] *= self.factor
        return shower, energy


class ScaleEnergy:
    """Min-max scale the (log-)incident energy to [0, 1] (reference :205-224)."""

    def __init__(self, e_min, e_max):
        self.e_min = e_min
        self.e_max = e_max
        self.cond_transform = True

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            return shower, energy * (self.e_max - self.e_min) + self.e_min
        return shower, (energy - self.e_min) / (self.e_max - self.e_min)


class ExclusiveLogitTransform:
    """Logit transform with optional index exclusions (reference :227-254)."""

    def __init__(self, delta, exclusions=None, rescale=False):
        self.delta = delta
        self.exclusions = exclusions
        self.rescale = rescale
        self.u_transform = True

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            if self.rescale:
                transformed = logit(shower, alpha=self.delta, inv=True)
            else:
                transformed = 1.0 / (1.0 + np.exp(-shower))
        else:
            if self.rescale:
                transformed = logit(shower, alpha=self.delta)
            else:
                clipped = np.clip(shower, self.delta, 1 - self.delta)
                transformed = np.log(clipped / (1 - clipped))
        if self.exclusions is not None:
            transformed[..., self.exclusions] = shower[..., self.exclusions]
        return transformed, energy


class SelectiveUniformNoise:
    """Train-time additive uniform noise; reverse applies a threshold cut
    (reference :257-288)."""

    def __init__(self, a, b, exclusions=None, cut=False):
        self.a = a
        self.b = b
        self.exclusions = exclusions
        self.cut = cut

    def __call__(self, shower, energy, rev=False, rank=0):
        shower = shower.copy()
        if rev:
            mask = shower < self.b
            if self.exclusions:
                mask[:, self.exclusions] = False
            if self.cut:
                shower[mask] = 0.0
        else:
            noise = _rng.uniform(self.a, self.b, size=shower.shape).astype(shower.dtype)
            if self.exclusions:
                noise[:, self.exclusions] = 0.0
            mask = shower != 1
            shower[mask] = (shower + noise)[mask]
        return shower, energy


class CutValues:
    """Threshold cut in normalized space, sparing the trailing u-features
    (reference :291-311)."""

    def __init__(self, cut=0.0, n_layers=45):
        self.cut = cut
        self.n_layers = n_layers

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev and self.cut:
            shower = shower.copy()
            mask = shower <= self.cut
            mask[:, -self.n_layers :] = False
            shower[mask] = 0.0
        return shower, energy


class Reshape:
    """(B, prod) <-> (B, *shape) (reference :314-328)."""

    def __init__(self, shape):
        self.shape = tuple(shape)

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            return shower.reshape(-1, int(np.prod(self.shape))), energy
        return shower.reshape(-1, *self.shape), energy


class NormalizeByElayer:
    """The u-space construction (reference :331-397): normalize each calorimeter
    layer to unit energy and append the generalized energy-ratio features
    u_0 = E_tot/E_inc, u_i = E_{i-1}/E_{>=i-1}. The reverse reconstructs layer
    energies from the u's and rescales the normalized voxels.

    NB the reference configs swap the two ctor kwargs (``ptype`` carries the XML
    path and ``xml_file`` the particle name, e.g.
    configs/calochallenge/cfm/calochallenge_ds2.yaml); accepted as-is.
    """

    def __init__(self, ptype, xml_file, cut=0.0, eps=1.0e-10):
        self.eps = eps
        # kwargs arrive swapped from the configs: ptype=XML path, xml_file=particle
        self.xml = XMLHandler(particle_name=xml_file, filename=ptype)
        self.layer_boundaries = np.unique(self.xml.GetBinEdges())
        self.n_layers = len(self.layer_boundaries) - 1
        self.layer_sizes = np.diff(self.layer_boundaries)
        self.cut = cut

    def _layer_sums(self, voxels):
        return np.add.reduceat(voxels, self.layer_boundaries[:-1], axis=1)

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            us = shower[:, -self.n_layers :].copy()
            us[:, 1:] = np.clip(us[:, 1:], 0.0, 1.0)
            voxels = shower[:, : -self.n_layers]

            # reconstruct layer energies: R_0 = Einc*u_0; E_i = R_i*u_{i+1};
            # R_{i+1} = R_i*(1 - u_{i+1}); E_{L-1} = R_{L-1}
            total_E = energy.reshape(-1) * us[:, 0]
            one_minus = np.cumprod(1.0 - us[:, 1:], axis=1)  # (B, L-1)
            remaining = np.concatenate(
                [total_E[:, None], total_E[:, None] * one_minus], axis=1
            )  # (B, L): R_0 .. R_{L-1}
            layer_Es = np.empty((shower.shape[0], self.n_layers), shower.dtype)
            layer_Es[:, :-1] = remaining[:, :-1] * us[:, 1:]
            layer_Es[:, -1] = remaining[:, -1]

            # normalize each layer to unity, apply normalized cut, scale to E_layer
            sums = self._layer_sums(voxels)
            norm = np.repeat(sums + self.eps, self.layer_sizes, axis=1)
            layer_norm = voxels / norm
            layer_norm[layer_norm <= self.cut] = 0.0
            transformed = layer_norm * np.repeat(layer_Es, self.layer_sizes, axis=1)
        else:
            layer_Es = self._layer_sums(shower)  # (B, L)
            norm = np.repeat(layer_Es + self.eps, self.layer_sizes, axis=1)
            voxels = shower / norm

            # u_0 = E_tot / E_inc; u_i = E_{i-1} / sum_{j>=i-1} E_j
            rev_cumsum = np.cumsum(layer_Es[:, ::-1], axis=1)[:, ::-1]  # (B, L)
            u0 = rev_cumsum[:, :1] / energy.reshape(-1, 1)
            ui = layer_Es[:, :-1] / (rev_cumsum[:, :-1] + self.eps)
            transformed = np.concatenate((voxels, u0, ui), axis=1)
        return transformed, energy


class AddAngularBins:
    """Pad irregular per-layer alpha binning to a regular grid; the inverse takes
    the max over the added bins (reference :400-456). The new layer boundaries
    are static, so they are precomputed here instead of captured in forward."""

    def __init__(self, xml_filename, ptype, num_bins, add_bins):
        # NB the shipped configs swap these kwargs (ptype carries the XML path,
        # xml_filename the particle name — e.g. calochallenge_ds1_photons.yaml);
        # the reference's positional XMLHandler call absorbs the swap
        # (transforms.py:413) and so must we for config compatibility.
        self.xml = XMLHandler(particle_name=xml_filename, filename=ptype)
        self.layer_boundaries = np.unique(self.xml.GetBinEdges())
        self.num_bins = np.array(num_bins)
        self.add_bins = np.array(add_bins)
        self.n_voxels = int(self.layer_boundaries[-1])
        sizes = np.diff(self.layer_boundaries)
        # per-layer alpha axis grows by add_bins//num_bins - 1 padded slots
        new_alpha = self.num_bins + self.add_bins // self.num_bins - 1
        new_sizes = sizes // self.num_bins * new_alpha
        self.new_layer_boundaries = np.concatenate([[0], np.cumsum(new_sizes)]).astype(int)

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            new_n_voxels = int(self.new_layer_boundaries[-1])
            voxels, us = shower[:, :new_n_voxels], shower[:, new_n_voxels:]
            parts = []
            for L in range(len(self.new_layer_boundaries) - 1):
                start, end = self.new_layer_boundaries[L], self.new_layer_boundaries[L + 1]
                alpha_bins = self.num_bins[L]
                fold = self.add_bins[L] // alpha_bins
                layer = voxels[:, start:end].reshape(shower.shape[0], -1, alpha_bins, fold)
                parts.append(layer.max(-1).reshape(shower.shape[0], -1))
            out = np.concatenate(parts, axis=-1)
        else:
            voxels, us = shower[:, : self.n_voxels], shower[:, self.n_voxels :]
            parts = []
            for L in range(len(self.layer_boundaries) - 1):
                start, end = self.layer_boundaries[L], self.layer_boundaries[L + 1]
                alpha_bins = self.num_bins[L]
                extra = self.add_bins[L] // alpha_bins - 1
                layer = voxels[:, start:end].reshape(shower.shape[0], -1, alpha_bins)
                pad_left = extra // 2
                pad_right = extra - pad_left
                layer = np.pad(layer, ((0, 0), (0, 0), (pad_left, pad_right)))
                parts.append(layer.reshape(layer.shape[0], -1))
            out = np.concatenate(parts, axis=-1)
        return np.concatenate((out, us), axis=-1).astype(shower.dtype), energy


class AddLEMURSConditions:
    """Append fixed (theta, phi, one-hot label) columns to the condition vector
    to match the LEMURS conditioning scheme (reference :459-488)."""

    def __init__(self, theta=0.5, phi=0.5, label=(1, 0, 0, 0, 0)):
        self.theta = theta
        self.phi = phi
        self.label = list(label)
        self.n_conds = 2 + len(self.label)

    def __call__(self, shower, energy, rev=False, rank=0):
        if rev:
            return shower, energy[:, : -self.n_conds]
        extra = np.tile(
            np.asarray([self.theta, self.phi] + self.label, dtype=energy.dtype),
            (energy.shape[0], 1),
        )
        return shower, np.concatenate((energy, extra), axis=1)


def build_pipeline(transforms_cfg, run_dir: str, module=None):
    """Resolve a ``cfg.data.transforms`` ordered mapping into transform instances,
    injecting the run dir into ``*FromFile`` steps
    (reference experiments/calochallenge/experiment.py:55-59)."""
    import sys

    module = module or sys.modules[__name__]
    steps = []
    for name, kwargs in transforms_cfg.items():
        kwargs = dict(kwargs.items()) if hasattr(kwargs, "items") else {}
        if "FromFile" in name and kwargs.get("model_dir") is None:
            kwargs["model_dir"] = run_dir
        steps.append(getattr(module, name)(**kwargs))
    return steps


def apply_pipeline(steps, shower, energy, rev=False, rank=0):
    """Apply a transform chain (reversed order when rev=True)."""
    for fn in reversed(steps) if rev else steps:
        shower, energy = fn(shower, energy, rev=rev, rank=rank)
    return shower, energy
