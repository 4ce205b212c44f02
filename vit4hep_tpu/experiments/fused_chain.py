"""One-program two-stage generation: energy RK4 -> u mapping -> shape RK4.

SURVEY §7's stated ideal (VERDICT r3 next #6): the staged `sample_n` path
(experiments/calochallenge.py) dispatches the energy model per batch,
fetches the u-vectors to the HOST, runs the u-transform chain in numpy,
re-uploads, then dispatches the shape model — a device->host->device round
trip per batch between the two RK4 loops. The sample_us transform chain is
pure elementwise linear algebra (standardize, logit, column scales), so the
whole generate(E_inc) -> shower pipeline compiles into ONE jitted XLA
program: energy sampling scan, on-device u mapping, condition concat, shape
sampling scan. Both RK4 `lax.scan`s and all shipped kernels (energy decoder
megakernel, whole-ViT sampling megakernel) ride along unchanged.

Device twins are registered per transform class below; a chain containing a
transform without a twin raises `UnsupportedTransform` and the caller falls
back to the staged path (correctness first — the staged path stays the
default; `fused_generation: true` in the experiment cfg opts in).

Reference behavior being fused: experiments/calochallenge/experiment.py
:170-247 (sample_n + sample_us + the u_transform loops at :240-246).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class UnsupportedTransform(Exception):
    """A u-transform in the chain has no registered device twin."""


def _twin_global_standardize(t, rev):
    mean = jnp.asarray(np.asarray(t.mean, np.float32))
    std = jnp.asarray(np.asarray(t.std, np.float32))
    if rev:
        return lambda u: u * std + mean
    return lambda u: (u - mean) / std


def _twin_standardize_us(t, rev):
    mean = jnp.asarray(np.asarray(t.mean_u, np.float32))
    std = jnp.asarray(np.asarray(t.std_u, np.float32))
    n_us = int(t.n_us)

    def fwd(u):
        us, vox = u[:, -n_us:], u[:, :-n_us]
        return jnp.concatenate([vox, (us - mean) / std], axis=1)

    def irev(u):
        us, vox = u[:, -n_us:], u[:, :-n_us]
        return jnp.concatenate([vox, us * std + mean], axis=1)

    return irev if rev else fwd


def _twin_scale_total_energy(t, rev):
    factor, n_layers = float(t.factor), int(t.n_layers)
    col = -n_layers

    def apply(u, f):
        return u.at[..., col].multiply(f)

    return (lambda u: apply(u, 1.0 / factor)) if rev \
        else (lambda u: apply(u, factor))


def _twin_exclusive_logit(t, rev):
    delta = float(t.delta)
    exclusions = None if t.exclusions is None else jnp.asarray(
        np.asarray(t.exclusions, np.int64))
    rescale = bool(t.rescale)

    def fwd(u):
        if rescale:
            z = u * (1 - 2 * delta) + delta
            out = jnp.log(z / (1 - z))
        else:
            clipped = jnp.clip(u, delta, 1 - delta)
            out = jnp.log(clipped / (1 - clipped))
        if exclusions is not None:
            out = out.at[..., exclusions].set(u[..., exclusions])
        return out

    def irev(u):
        if rescale:
            z = jax.nn.sigmoid(u)
            out = (z - delta) / (1 - 2 * delta)
        else:
            out = jax.nn.sigmoid(u)
        if exclusions is not None:
            out = out.at[..., exclusions].set(u[..., exclusions])
        return out

    return irev if rev else fwd


def _twin_standardize_us_dict(t, rev):
    """LEMURS per-component u standardization: the staged path feeds a
    u-only ``{"extra_dims": u}`` dict, so the twin acts on the whole
    array (data/lemurs/transforms.py:LEMURSStandardizeUsFromFile)."""
    mean = jnp.asarray(np.asarray(t.mean_u, np.float32))
    std = jnp.asarray(np.asarray(t.std_u, np.float32))
    if rev:
        return lambda u: u * std + mean
    return lambda u: (u - mean) / std


def _twin_standardize_us_plus1(t, rev):
    """CaloHadronic's (std + 1) convention
    (data/calohadronic/transforms.py:CaloHadStandardizeUsFromFile)."""
    mean = jnp.asarray(np.asarray(t.mean_u, np.float32))
    std1 = jnp.asarray(np.asarray(t.std_u, np.float32)) + 1.0
    if rev:
        return lambda u: u * std1 + mean
    return lambda u: (u - mean) / std1


def _twin_scale_u0(t, rev):
    """Dict-protocol ScaleTotalEnergy: u_0 lives in column 0 (not
    column -n_layers as in the CaloChallenge array layout)."""
    factor = float(t.factor)
    if rev:
        return lambda u: u.at[..., 0].divide(factor)
    return lambda u: u.at[..., 0].multiply(factor)


def _twin_elementwise_logit(t, rev):
    """Dict-protocol (rescaled) logit of LEMURS/CaloHadronic/CaloGAN on a
    u-only dict: plain elementwise, no exclusion columns (the GAN class
    stores ``exclusions`` but never applies it, matching the reference)."""
    delta = float(t.delta)
    rescale = bool(t.rescale)

    def fwd(u):
        if rescale:
            z = u * (1 - 2 * delta) + delta
        else:
            z = jnp.clip(u, delta, 1 - delta)
        return jnp.log(z / (1 - z))

    def irev(u):
        z = jax.nn.sigmoid(u)
        return (z - delta) / (1 - 2 * delta) if rescale else z

    return irev if rev else fwd


# class name -> builder(transform, rev) -> (u -> u); names, not classes, so
# every family's transforms module (calochallenge/calogan/...) resolves to
# the same twin as long as its math matches (they share the class contract)
_REGISTRY = {
    "GlobalStandardizeFromFile": _twin_global_standardize,
    "StandardizeUsFromFile": _twin_standardize_us,
    "ScaleTotalEnergy": _twin_scale_total_energy,
    "ExclusiveLogitTransform": _twin_exclusive_logit,
    # dict-protocol families: the staged sample_us path applies these to a
    # u-only {"extra_dims": u} dict (experiments/{lemurs,calogan,
    # calohadronic}.py sample_us), so each twin is the transform's action
    # on that single key
    "LEMURSGlobalStandardizeFromFile": _twin_global_standardize,
    "LEMURSStandardizeUsFromFile": _twin_standardize_us_dict,
    "LEMURSScaleTotalEnergy": _twin_scale_u0,
    "LEMURSExclusiveLogitTransform": _twin_elementwise_logit,
    "CaloHadGlobalStandardizeFromFile": _twin_global_standardize,
    "CaloHadStandardizeUsFromFile": _twin_standardize_us_plus1,
    "CaloHadScaleTotalEnergy": _twin_scale_u0,
    "CaloHadExclusiveLogitTransform": _twin_elementwise_logit,
    "GlobalStandardizeFromFileGAN": _twin_global_standardize,
    "ExclusiveLogitTransformGAN": _twin_elementwise_logit,
}


def device_u_chain(energy_transforms, shape_transforms):
    """Build the on-device u mapping: the energy model's u_transform steps
    in REVERSE, then the shape model's in forward order — exactly the
    staged `sample_us` loops (experiments/calochallenge.py:220-225)."""
    fns = []
    # gate on hasattr, NOT truthiness: the staged loops
    # (calochallenge.py sample_us) apply any transform that merely CARRIES
    # the attribute, and the fused path's contract is staged parity
    for t in list(energy_transforms)[::-1]:
        if hasattr(t, "u_transform"):
            fns.append(_twin(t, rev=True))
    for t in shape_transforms:
        if hasattr(t, "u_transform"):
            fns.append(_twin(t, rev=False))

    def apply(u):
        for f in fns:
            u = f(u)
        return u

    return apply


def _twin(t, rev):
    name = type(t).__name__
    if name not in _REGISTRY:
        raise UnsupportedTransform(
            f"no device twin registered for u-transform {name}; "
            f"fused generation falls back to the staged path")
    try:
        return _REGISTRY[name](t, rev)
    except AttributeError as e:
        # unfitted *FromFile stats (written=False — e.g. a sample-only run
        # whose means.npy was never written): the staged path fits stats on
        # the fly, so report it as unsupported rather than crashing
        raise UnsupportedTransform(
            f"u-transform {name} has no fitted stats ({e}); "
            f"fused generation falls back to the staged path")


def chain_fingerprint(energy_transforms, shape_transforms):
    """Digest of the u-chain-relevant transform state (class names + fitted
    constants). Cached jitted chains bake the constants in at build time;
    keying the cache on this digest means a refit/reload after the first
    build invalidates the cache instead of serving stale constants."""
    import hashlib

    h = hashlib.sha1()
    # the "|" separator keeps list PLACEMENT in the key: a transform in the
    # energy list is applied in reverse, the same one in the shape list
    # forward, so moving it between lists must change the fingerprint
    for t in list(energy_transforms) + ["|"] + list(shape_transforms):
        if not hasattr(t, "u_transform"):
            if t == "|":
                h.update(b"|")
            continue
        h.update(type(t).__name__.encode())
        for attr in ("mean", "std", "mean_u", "std_u", "factor", "delta",
                     "rescale", "n_us", "n_layers", "exclusions", "written"):
            v = getattr(t, attr, None)
            if v is None:
                continue
            h.update(attr.encode())
            h.update(np.asarray(v).tobytes())
    return h.hexdigest()


def make_fused_generate(shape_model, energy_model, energy_transforms,
                        shape_transforms, u_position="first",
                        energy_cond_width=None):
    """One jittable (shape_params, energy_params, cond, key) ->
    (shower, full_cond) program for a fixed batch shape. `cond` is the
    TRANSFORMED condition (the staged path's `transformed_cond`); the
    returned sample is in the shape model's training basis, identical to
    the staged chain's input to inverse preprocessing, and `full_cond` is
    the concat the staged path hands to eval.

    Per-family cond composition (matching each staged sample_n):
    - ``u_position="first"`` -> full_cond = [u | cond] (CaloChallenge,
      LEMURS, CaloHadronic — for LEMURS pass cond = [E,theta,phi,labels]
      so the labels land after the base conds as the staged path does);
    - ``u_position="last"`` -> full_cond = [cond | u] (CaloGAN,
      experiments/calogan.py sample_n);
    - ``energy_cond_width=k`` feeds only the first k cond columns to the
      energy model (LEMURS: the staged sample_us conditions the energy
      model on [E,theta,phi] while the shape cond also carries labels)."""
    u_map = device_u_chain(energy_transforms, shape_transforms)

    def generate(shape_params, energy_params, cond, key):
        k_u, k_s = jax.random.split(key)
        e_cond = cond if energy_cond_width is None \
            else cond[:, :energy_cond_width]
        u = energy_model.sample_batch(energy_params, e_cond, k_u)
        u = u_map(u)
        parts = [u, cond] if u_position == "first" else [cond, u]
        cond2 = jnp.concatenate(parts, axis=1)
        return shape_model.sample_batch(shape_params, cond2, k_s), cond2

    return generate
