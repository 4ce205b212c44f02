"""Distribution-distance metrics: FPD and KPD on high-level features.

The reference calls ``jetnet.evaluation.fpd/kpd``
(`/root/reference/experiments/calo_utils/ugr_evaluation/evaluate.py:758-795`);
jetnet is not installed in this environment (and cannot be fetched), so the
metrics are reimplemented here to match the *published algorithm* of Kansal et
al., "Evaluating generative models in high energy physics" (arXiv:2211.10295)
and jetnet's documented estimator, normalization, and batching constants:

- **Feature normalization**: every feature of both sets is divided by the
  maximum absolute value of that feature in the REAL (reference) set —
  jetnet ``normalise_features``; NOT a mean/std standardization.
- **FPD** (Frechet physics distance): the Frechet/Wasserstein-2 distance
  between Gaussian fits, computed at ``num_points`` subsample sizes spaced
  uniformly in 1/N between ``min_samples`` and ``max_samples`` (so the linear
  fit in 1/N is evenly sampled), each the mean over ``num_batches``
  with-replacement draws; the reported value is the 1/N -> 0 intercept of a
  degree-1 polyfit and the error is the intercept's fit standard error.
  Defaults: min 20 000 / max 50 000 / 20 batches / 10 points / seed 42.
- **KPD** (kernel physics distance): unbiased MMD^2 (KID-style estimator,
  off-diagonal means) with the dot-product kernel k(x, y) = (x.y / d + 1)^3,
  over ``num_batches`` with-replacement draws of ``batch_size``; reported as
  the median with a 1-sigma-equivalent IQR error (jetnet's
  ``iqr(vals, rng=(16.275, 83.725)) / 2`` convention).
  Defaults: 10 batches / batch 5 000 / seed 42.

The reference harness invokes ``fpd(ref, src, min_samples=10000)`` and
``kpd(ref, src, batch_size=10000)`` (evaluate.py:778-783), which the call
sites in ``ugr_evaluation.py``/``lemurs.py`` mirror verbatim. Draws use the
legacy ``np.random.seed``/``np.random.choice`` stream like jetnet, so given
equal inputs and constants the estimates agree with jetnet's to the
estimator's own subsampling noise (the extrapolation/median is designed to
make that noise small); unit tests pin the estimator pieces to hand-computed
values (tests/test_evaluation.py).
"""

from __future__ import annotations

import numpy as np


def normalise_features(reference, sample):
    """jetnet ``normalise_features``: scale every feature of BOTH sets by the
    max absolute value of that feature in the reference set."""
    maxes = np.max(np.abs(reference), axis=0)
    maxes = np.where(maxes == 0, 1.0, maxes)
    return reference / maxes, sample / maxes


def frechet_distance(x, y):
    """Frechet distance between Gaussian fits of two feature matrices
    (jetnet ``frechet_gaussian_distance`` without the normalise step)."""
    mu_x, mu_y = x.mean(axis=0), y.mean(axis=0)
    cov_x = np.atleast_2d(np.cov(x, rowvar=False))
    cov_y = np.atleast_2d(np.cov(y, rowvar=False))
    diff = mu_x - mu_y
    import scipy.linalg

    covmean = np.real(scipy.linalg.sqrtm(cov_x @ cov_y))
    return float(diff @ diff + np.trace(cov_x) + np.trace(cov_y) - 2 * np.trace(covmean))


def fpd(reference, sample, min_samples=20000, max_samples=50000,
        num_batches=20, num_points=10, normalise=True, seed=42):
    """FPD with 1/N extrapolation; returns (value, intercept fit error).

    Subsample sizes are uniform in 1/N between min_samples and max_samples
    (jetnet's grid); draws are WITH replacement, so sizes may exceed the
    available statistics like in jetnet."""
    reference = np.asarray(reference, np.float64)
    sample = np.asarray(sample, np.float64)
    if normalise:
        reference, sample = normalise_features(reference, sample)
    rng = np.random.RandomState(seed)

    sizes = (1.0 / np.linspace(1.0 / min_samples, 1.0 / max_samples, num_points)
             ).astype(np.int64)
    vals = []
    for n in sizes:
        draws = []
        for _ in range(num_batches):
            idx_r = rng.choice(len(reference), n)
            idx_s = rng.choice(len(sample), n)
            draws.append(frechet_distance(reference[idx_r], sample[idx_s]))
        vals.append(float(np.mean(draws)))
    # degree-1 polyfit of FD vs 1/N; the intercept is the infinite-sample
    # estimate and its fit covariance gives the quoted error (jetnet)
    coef, cov = np.polyfit(1.0 / sizes, np.asarray(vals), 1, cov=True)
    return float(coef[1]), float(np.sqrt(cov[1, 1]))


def _poly_kernel(x, y):
    d = x.shape[1]
    return (x @ y.T / d + 1.0) ** 3


def _kernel_sum(x, y, block=2048):
    """Sum of the pairwise polynomial kernel, accumulated in row blocks so the
    full (n, m) kernel matrix (800 MB at jetnet's batch 10 000) never
    materializes."""
    total = 0.0
    for i in range(0, len(x), block):
        total += float(_poly_kernel(x[i:i + block], y).sum())
    return total


def _mmd_unbiased(x, y):
    """KID-style unbiased MMD^2: off-diagonal means of kxx/kyy, full mean kxy."""
    n, m = len(x), len(y)
    d = x.shape[1]
    trace_xx = float((((x * x).sum(axis=1) / d + 1.0) ** 3).sum())
    trace_yy = float((((y * y).sum(axis=1) / d + 1.0) ** 3).sum())
    sum_xx = (_kernel_sum(x, x) - trace_xx) / (n * (n - 1))
    sum_yy = (_kernel_sum(y, y) - trace_yy) / (m * (m - 1))
    return float(sum_xx + sum_yy - 2.0 * _kernel_sum(x, y) / (n * m))


def kpd(reference, sample, num_batches=10, batch_size=5000, normalise=True,
        seed=42):
    """KPD; returns (median MMD^2 over batches, IQR-based 1-sigma error)."""
    reference = np.asarray(reference, np.float64)
    sample = np.asarray(sample, np.float64)
    if normalise:
        reference, sample = normalise_features(reference, sample)
    rng = np.random.RandomState(seed)
    vals = [
        _mmd_unbiased(
            reference[rng.choice(len(reference), batch_size)],
            sample[rng.choice(len(sample), batch_size)],
        )
        for _ in range(num_batches)
    ]
    from scipy.stats import iqr

    # jetnet's 1-sigma-equivalent IQR convention (16.275/83.725 percentiles)
    return float(np.median(vals)), float(iqr(vals, rng=(16.275, 83.725)) / 2)
