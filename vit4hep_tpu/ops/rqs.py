"""Rational-quadratic spline transforms (Durkan et al., arXiv:1906.04032) as
pure jnp functions.

Two parametrizations, matching the reference's two spline families:

- :func:`nflows_rqs`: fixed symmetric domain [-B, B], softmax bin widths and
  heights, softplus knot derivatives, identity (linear) tails — the math of
  `/root/reference/nn/inn/rqs_nflows.py:358-508`.
- :func:`binned_rqs`: network-predicted domain (left/bottom edge + positive
  widths/heights via shifted softplus), derivative continuity with the affine
  tails ``y = scale * x + shift`` outside the domain — the math of
  `/root/reference/nn/inn/binned.py:144-383` + ``rqs_v2.py:11-261``.

Both are written with full-tensor ``jnp.where`` masking instead of the
reference's boolean-mask scatter (SURVEY.md "hard parts"), so they jit and
batch cleanly on TPU. The inverse uses the numerically stable quadratic root
``2c / (-b - sqrt(b^2 - 4ac))``; intermediates are computed in float32 (the
reference upcasts to float64, rqs_v2.py:219-245 — on TPU the stable root form
keeps max round-trip error < 1e-4 in the bulk, verified in tests).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

MIN_BIN_WIDTH = 1e-6
MIN_BIN_HEIGHT = 1e-6
MIN_DERIVATIVE = 1e-6


def _searchsorted(knots, x):
    """Index of the bin containing x: largest i with knots[..., i] <= x."""
    return jnp.clip(
        jnp.sum(x[..., None] >= knots, axis=-1) - 1, 0, knots.shape[-1] - 2
    )


def _csum0(vals):
    """``concat([0, cumsum(vals)])`` along the last axis, as one matmul.

    ``jnp.cumsum`` lowers to a reduce-window on TPU — measured 0.18 ms per
    (256, 3240, 10) call at ds2-cINN shapes plus a pad fusion for the
    leading-zero concat, x80 per sampler call (~20 ms/batch, round-3
    profile). A (K, K+1) strictly-upper-triangular matmul emits the leading
    zero and every partial sum in one MXU op. ``Precision.HIGHEST`` keeps
    true-f32 accumulation (the default TPU bf16-multiplicand mode would
    move knots by ~0.4%); summation order is tree-wise either way — the
    reduce-window lowering was never sequential-order exact.
    """
    k = vals.shape[-1]
    tri = jnp.asarray(np.triu(np.ones((k, k + 1), np.float32), 1), vals.dtype)
    return jax.lax.dot_general(
        vals, tri, (((vals.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=vals.dtype,
    )


def _gather_bin_params(idx, knot_x, knot_y, derivs):
    """Select (xk, xkp, yk, ykp, dk, dkp) = arr[..., idx] / arr[..., idx+1]
    for the three knot arrays (..., K+1) at bin index idx (..., ) in [0, K-1].

    Deliberately NOT take_along_axis: a gather along the minor (lane) axis
    serializes on TPU — measured 66 ms per coupling inverse at ds2-cINN
    shapes (256 x 3240 x 11 knots) against a 0.3 ms HBM floor. A one-hot
    mask-sum is exact (selects identical elements), stays on the VPU, and
    costs ~12*K flops per element.
    """
    nbins = knot_x.shape[-1] - 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (nbins,), 0)
    onehot = (idx[..., None] == iota).astype(knot_x.dtype)
    out = []
    for arr in (knot_x, knot_y, derivs):
        out.append(jnp.sum(arr[..., :-1] * onehot, axis=-1))
        out.append(jnp.sum(arr[..., 1:] * onehot, axis=-1))
    xk, xkp, yk, ykp, dk, dkp = out
    return xk, xkp, yk, ykp, dk, dkp


def _rq_bin(x_or_y, xk, xkp, yk, ykp, dk, dkp, rev):
    """Evaluate one rational-quadratic bin (forward eq. 4, inverse eq. 6-8,
    log-derivative eq. 5 of arXiv:1906.04032). All args elementwise."""
    dx = xkp - xk
    dy = ykp - yk
    sk = dy / dx

    def fwd_eval(xi):
        omx = 1 - xi
        num = dy * (sk * xi**2 + dk * xi * omx)
        den = sk + (dkp + dk - 2 * sk) * xi * omx
        return yk + num / den, den

    if not rev:
        xi = (x_or_y - xk) / dx
        out, _ = fwd_eval(xi)
        omx = 1 - xi
    else:
        # The textbook quadratic root (reference rqs_v2.py:219-245, float64,
        # (-b + sqrt(disc)) / 2a) is ill-conditioned in float32 when a -> 0
        # (near-linear bins). The Citardauq form 2c / (-b - sqrt(disc)) is
        # stable there (it degrades to the linear solve -c/b), and two Newton
        # polish steps push forward-consistency |fwd(inv(y)) - y| to f32 eps
        # even at extreme knot slopes — measured >=100x more consistent than
        # a 20-step bisection at ~5x fewer VPU ops.
        y_target = x_or_y
        t = y_target - yk
        qa = dy * (sk - dk) + t * (dkp + dk - 2 * sk)
        qb = dy * dk - t * (dkp + dk - 2 * sk)
        qc = -sk * t
        disc = jnp.maximum(qb * qb - 4 * qa * qc, 0.0)
        denom = -qb - jnp.sqrt(disc)
        denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        xi = jnp.clip(2 * qc / denom, 0.0, 1.0)
        for _ in range(2):
            y_hat, den = fwd_eval(xi)
            omx = 1 - xi
            dy_dxi = sk**2 * (dkp * xi**2 + 2 * sk * xi * omx + dk * omx**2) / den**2 * dx
            xi = jnp.clip(xi - (y_hat - y_target) / jnp.maximum(dy_dxi, 1e-12), 0.0, 1.0)
        out = xi * dx + xk
        omx = 1 - xi
    deriv_num = sk**2 * (dkp * xi**2 + 2 * sk * xi * omx + dk * omx**2)
    deriv_den = (sk + (dkp + dk - 2 * sk) * xi * omx) ** 2
    log_deriv = jnp.log(deriv_num) - jnp.log(deriv_den)
    return out, log_deriv


# ---------------------------------------------------------------------------
# nflows parametrization: fixed [-B, B] domain, linear identity tails
# ---------------------------------------------------------------------------
# thin aliases so the spline code reads like the reference formulas
_softmax = functools.partial(jax.nn.softmax, axis=-1)
_softplus = jax.nn.softplus


def nflows_knots(theta, num_bins, bound):
    """Split + constrain nflows spline parameters.

    Returns (knot_x, knot_y, derivatives), shapes (..., K+1)."""
    uw = theta[..., :num_bins]
    uh = theta[..., num_bins : 2 * num_bins]
    ud = theta[..., 2 * num_bins :]

    widths = MIN_BIN_WIDTH + (1 - MIN_BIN_WIDTH * num_bins) * _softmax(uw)
    knot_x = _csum0(widths)
    knot_x = 2 * bound * knot_x - bound

    heights = MIN_BIN_HEIGHT + (1 - MIN_BIN_HEIGHT * num_bins) * _softmax(uh)
    knot_y = _csum0(heights)
    knot_y = 2 * bound * knot_y - bound

    const = np.log(np.exp(1 - MIN_DERIVATIVE) - 1)
    ud = jnp.concatenate(
        [jnp.full_like(ud[..., :1], const), ud, jnp.full_like(ud[..., :1], const)],
        axis=-1,
    )
    derivs = MIN_DERIVATIVE + _softplus(ud)
    return knot_x, knot_y, derivs


def nflows_rqs(x, theta, num_bins, bound, rev=False, event_mask=True):
    """Unconstrained RQS with linear tails on a fixed [-B, B] domain.

    x: (..., ) inputs; theta: (..., 3*num_bins - 1) raw network outputs.
    Returns (y, logabsdet) where logabsdet sums over the last axis (per event
    when x is (B, D)).

    ``event_mask=True`` replicates the reference's event-level gating
    (rqs_nflows.py:359-362): an event is splined only if *all* of its
    dimensions lie inside the domain; otherwise the whole event passes through
    identically.
    """
    knot_x, knot_y, derivs = nflows_knots(theta, num_bins, bound)

    inside = (x >= -bound) & (x <= bound)
    x_safe = jnp.clip(x, -bound, bound)

    idx = _searchsorted(knot_y if rev else knot_x, x_safe)
    xk, xkp, yk, ykp, dk, dkp = _gather_bin_params(idx, knot_x, knot_y, derivs)

    y_spline, log_deriv = _rq_bin(x_safe, xk, xkp, yk, ykp, dk, dkp, rev)

    if event_mask:
        ev_inside = jnp.all(inside, axis=-1, keepdims=True)
        y = jnp.where(ev_inside, y_spline, x)
        logdet = jnp.where(ev_inside[..., 0], jnp.sum(log_deriv, axis=-1), 0.0)
    else:
        y = jnp.where(inside, y_spline, x)
        logdet = jnp.sum(jnp.where(inside, log_deriv, 0.0), axis=-1)
    # log_deriv is always the FORWARD derivative (at the recovered point when
    # rev); the applied direction's logdet is its negation in reverse.
    return y, (-logdet if rev else logdet)


# ---------------------------------------------------------------------------
# FrEIA "binned" parametrization: predicted domain, affine tails
# ---------------------------------------------------------------------------
def binned_constrain(
    theta,
    bins,
    min_bin_sizes=(0.01, 0.01),
    default_domain=(-15.0, 15.0, -15.0, 15.0),
    identity_tails=False,
    domain_clamping=None,
):
    """Split + constrain FrEIA-style spline params (binned.py:223-288 + rqs_v2.py:17-37).

    theta: (..., D, P) with P = 2*bins + (bins-1) + (1 if identity_tails else 2).
    Returns dict with knot_x, knot_y (..., D, bins+1), derivs (..., D, bins+1),
    scale/shift of the affine tails (..., D).
    """
    widths_u = theta[..., :bins]
    heights_u = theta[..., bins : 2 * bins]
    if identity_tails:
        total_width_u = theta[..., 2 * bins : 2 * bins + 1]
        deltas_u = theta[..., 2 * bins + 1 :]
    else:
        bottom_u = theta[..., 2 * bins : 2 * bins + 1]
        left_u = theta[..., 2 * bins + 1 : 2 * bins + 2]
        deltas_u = theta[..., 2 * bins + 2 :]

    def clamp_domain(d):
        if domain_clamping is None:
            return d
        return domain_clamping * jnp.tanh(d / domain_clamping)

    if identity_tails:
        default_width = default_domain[1] - default_domain[0]
        shift0 = np.log(np.e - 1)
        total_width = default_width * _softplus(total_width_u + shift0)
        total_width = clamp_domain(total_width)
        left = -total_width / 2
        bottom = -total_width / 2
        widths = total_width * _softmax(widths_u)
        heights = total_width * _softmax(heights_u)
    else:
        left = left_u + default_domain[0]
        bottom = bottom_u + default_domain[2]
        default_bw = (default_domain[1] - default_domain[0]) / bins
        default_bh = (default_domain[3] - default_domain[2]) / bins
        xshift = np.log(np.exp(default_bw - min_bin_sizes[0]) - 1)
        yshift = np.log(np.exp(default_bh - min_bin_sizes[1]) - 1)
        widths = min_bin_sizes[0] + _softplus(widths_u + xshift)
        heights = min_bin_sizes[1] + _softplus(heights_u + yshift)

        domain_w = jnp.sum(widths, axis=-1, keepdims=True)
        domain_h = jnp.sum(heights, axis=-1, keepdims=True)
        w_resize = clamp_domain(domain_w) / domain_w
        h_resize = clamp_domain(domain_h) / domain_h
        widths = widths * w_resize
        heights = heights * h_resize
        left = left * w_resize
        bottom = bottom * h_resize

    knot_x = left + _csum0(widths)
    knot_y = bottom + _csum0(heights)

    # deltas: positive via shifted softplus; boundary derivative = affine scale
    # (rqs_v2.py:17-37) so the transform is C^1 across the domain edge.
    scale = jnp.sum(heights, axis=-1) / jnp.sum(widths, axis=-1)
    deltas_inner = _softplus(deltas_u + np.log(np.e - 1))
    derivs = jnp.concatenate(
        [scale[..., None], deltas_inner, scale[..., None]], axis=-1
    )
    shift = bottom[..., 0] - scale * left[..., 0]
    return {
        "knot_x": knot_x,
        "knot_y": knot_y,
        "derivs": derivs,
        "scale": scale,
        "shift": shift,
    }


def binned_rqs(x, params, rev=False):
    """RQS on a predicted domain with affine tails.

    x: (..., D); params from :func:`binned_constrain` with matching (..., D, K+1).
    Returns (y, logdet) with logdet summed over D (negated for rev, matching
    binned.py:356-383).
    """
    knot_x, knot_y = params["knot_x"], params["knot_y"]
    derivs, scale, shift = params["derivs"], params["scale"], params["shift"]

    if not rev:
        inside = (x > knot_x[..., 0]) & (x <= knot_x[..., -1])
        tail = scale * x + shift
    else:
        inside = (x > knot_y[..., 0]) & (x <= knot_y[..., -1])
        tail = (x - shift) / scale

    ref_knots = knot_y if rev else knot_x
    x_safe = jnp.clip(x, ref_knots[..., 0], ref_knots[..., -1])
    idx = _searchsorted(ref_knots, x_safe)
    xk, xkp, yk, ykp, dk, dkp = _gather_bin_params(idx, knot_x, knot_y, derivs)

    y_spline, log_deriv = _rq_bin(x_safe, xk, xkp, yk, ykp, dk, dkp, rev)

    y = jnp.where(inside, y_spline, tail)
    log_jac = jnp.where(inside, log_deriv, jnp.log(scale))
    logdet = jnp.sum(log_jac, axis=-1)
    return y, (-logdet if rev else logdet)
