"""Distribution-distance metrics: FPD and KPD on high-level features.

The reference calls ``jetnet.evaluation.fpd/kpd``
(`/root/reference/experiments/calo_utils/ugr_evaluation/evaluate.py:758-789`);
jetnet is not available in this environment, so the metrics are implemented
here following their definitions (Kansal et al., arXiv:2211.10295):

- **FPD** (Frechet physics distance): Frechet/Wasserstein-2 distance between
  Gaussian fits of the two feature sets, evaluated at several subsample sizes
  and linearly extrapolated in 1/N to the infinite-sample intercept.
- **KPD** (kernel physics distance): unbiased MMD^2 with the cubic polynomial
  kernel k(x, y) = (x.y / d + 1)^3, median over random batches.

Features are standardized by the reference set's mean/std before either
metric. NB: jetnet normalizes by the max absolute feature value instead, and
its exact batching constants cannot be verified in this environment (the
package is absent) — so absolute FPD/KPD values are self-consistent across
runs of THIS harness but are not guaranteed numerically comparable to
jetnet-computed numbers; relative comparisons (model A vs model B, or vs the
AUC -> 0.5 target) are unaffected. Documented in PARITY.md "Known deltas".
"""

from __future__ import annotations

import numpy as np


def _standardize(reference, sample):
    mu = reference.mean(axis=0)
    sigma = reference.std(axis=0) + 1e-12
    return (reference - mu) / sigma, (sample - mu) / sigma


def frechet_distance(x, y):
    """Frechet distance between Gaussian fits of two feature matrices."""
    mu_x, mu_y = x.mean(axis=0), y.mean(axis=0)
    cov_x = np.cov(x, rowvar=False)
    cov_y = np.cov(y, rowvar=False)
    diff = mu_x - mu_y
    # sqrtm(cov_x @ cov_y) via eigendecomposition of the symmetrized product
    import scipy.linalg

    covmean, _ = scipy.linalg.sqrtm(cov_x @ cov_y, disp=False)
    covmean = np.real(covmean)
    return float(diff @ diff + np.trace(cov_x) + np.trace(cov_y) - 2 * np.trace(covmean))


def fpd(reference, sample, min_samples=10000, num_points=10, num_batches=10,
        seed=0):
    """FPD with 1/N extrapolation; returns (value, fit std error).

    Each subsample size is measured as the mean FD over ``num_batches``
    independent draws, which stabilizes the 1/N intercept considerably."""
    reference = np.asarray(reference, np.float64)
    sample = np.asarray(sample, np.float64)
    reference, sample = _standardize(reference, sample)
    rng = np.random.default_rng(seed)

    n_max = min(len(reference), len(sample))
    n_min = min(min_samples, n_max // 2) or n_max
    sizes = np.unique(np.linspace(n_min, n_max, num_points).astype(int))
    vals, inv_n = [], []
    for n in sizes:
        draws = []
        n_draws = 1 if n == n_max else num_batches
        for _ in range(n_draws):
            idx_r = rng.choice(len(reference), n, replace=False)
            idx_s = rng.choice(len(sample), n, replace=False)
            draws.append(frechet_distance(reference[idx_r], sample[idx_s]))
        vals.append(float(np.mean(draws)))
        inv_n.append(1.0 / n)
    if len(sizes) == 1:
        return vals[0], 0.0
    # linear fit FD(n) = a + b/n; intercept a is the infinite-sample estimate
    A = np.stack([np.ones_like(inv_n), np.asarray(inv_n)], axis=1)
    coef, res, *_ = np.linalg.lstsq(A, np.asarray(vals), rcond=None)
    resid = np.asarray(vals) - A @ coef
    dof = max(len(vals) - 2, 1)
    cov = np.linalg.inv(A.T @ A) * (resid @ resid) / dof
    return float(coef[0]), float(np.sqrt(max(cov[0, 0], 0.0)))


def _poly_kernel(x, y):
    d = x.shape[1]
    return (x @ y.T / d + 1.0) ** 3


def _mmd_unbiased(x, y):
    kxx = _poly_kernel(x, x)
    kyy = _poly_kernel(y, y)
    kxy = _poly_kernel(x, y)
    n, m = len(x), len(y)
    sum_xx = (kxx.sum() - np.trace(kxx)) / (n * (n - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
    return float(sum_xx + sum_yy - 2.0 * kxy.mean())


def kpd(reference, sample, batch_size=10000, num_batches=10, seed=0):
    """KPD (median unbiased MMD^2 over batches); returns (median, std)."""
    reference = np.asarray(reference, np.float64)
    sample = np.asarray(sample, np.float64)
    reference, sample = _standardize(reference, sample)
    rng = np.random.default_rng(seed)
    bs = min(batch_size, len(reference), len(sample))
    vals = [
        _mmd_unbiased(
            reference[rng.choice(len(reference), bs, replace=False)],
            sample[rng.choice(len(sample), bs, replace=False)],
        )
        for _ in range(num_batches)
    ]
    return float(np.median(vals)), float(np.std(vals))
