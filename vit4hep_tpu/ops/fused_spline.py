"""Binned-RQS inverse megakernel: constrain + searchsorted + bin-solve in ONE
Pallas kernel per batch group.

Round-3 xplane profile of the ds2 cINN sampler (256 x 3240 elements x 31
spline params per coupling side, 40 sides per sample batch): the composed
XLA spline inverse costs ~1.37 ms per side — ~15 separate fusions
(constrain, knot cumsum, searchsorted, one-hot gather, bin solve), each
re-reading the ~100 MB theta/knot tensors from HBM, against a 0.13 ms
single-pass floor. The spline math itself is trivial VPU work (~2 M ops per
batch element); the cost is purely HBM round trips over the materialized
(B, D, 31) parameter tensors. This kernel reads theta ONCE per element,
keeps every intermediate (knots, derivatives, bin index) in VMEM registers,
and writes only the recovered x and per-element log-derivative.

Matches ``binned_constrain`` + ``binned_rqs(rev=True)`` (ops/rqs.py — the
math of reference ``nn/inn/binned.py:144-383`` + ``rqs_v2.py:11-261``)
elementwise to f32 rounding: same shifted-softplus constrain, same
Citardauq-root + 2-Newton inverse (shared ``_rq_bin`` code), sequential
knot accumulation (exact cumsum order).

Layout: the caller holds theta as (B, D, P) with the P=31 params minor —
per-param rows would waste 97 of every 128 lanes. The kernel instead
consumes theta transposed to (B, P, D): params on sublanes (31 -> one
(32, 128) tile row), elements on lanes. The (B, D, P) -> (B, P, D)
swapaxes costs one XLA relayout pass (~0.25 ms per side at ds2 shapes) —
the remaining ~1 ms per side is what the kernel removes.

Inverse/sampling direction only: the training direction (log_prob) runs the
composed, differentiable-everywhere path — this kernel defines no VJP, and
``BinnedRQSCouplingBlock`` only routes ``inverse()`` through it (gated by
the ``fused_spline`` config flag).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit4hep_tpu.ops.pallas_utils import interpret as _interpret
from vit4hep_tpu.ops.rqs import _rq_bin


def _softplus(x):
    # jax.nn.softplus: log1p(exp(-|x|)) + max(x, 0) — numerically stable in
    # f32 and identical to the composed path's constrain
    return jnp.logaddexp(x, 0.0)


def _spline_inv_kernel(
    y_ref, theta_ref, x_ref, logj_ref, *, bins, min_bin_sizes, default_domain,
    identity_tails, domain_clamping, group
):
    """Every array below is a full (G, D) tile — batch-group rows on
    sublanes, elements on lanes — so each VPU op runs at full occupancy.
    (A first version looped g and worked on (1, D) rows: 1 of 8 sublanes
    used, profiled 1.18 ms/call vs ~0.3 ms for this layout.) The per-param
    rows come from static middle-axis slices of the (G, P, D) theta block."""
    def clamp_domain(d):
        if domain_clamping is None:
            return d
        return domain_clamping * jnp.tanh(d / domain_clamping)

    def prow(k):  # param row k as (G, D)
        return theta_ref[:, k, :]

    widths_u = [prow(k) for k in range(bins)]
    heights_u = [prow(bins + k) for k in range(bins)]

    if identity_tails:
        total_width_u = prow(2 * bins)
        deltas_u = [prow(2 * bins + 1 + k) for k in range(bins - 1)]
        default_width = default_domain[1] - default_domain[0]
        shift0 = float(np.log(np.e - 1))
        total_width = default_width * _softplus(total_width_u + shift0)
        total_width = clamp_domain(total_width)
        left = -total_width / 2
        bottom = -total_width / 2
        # softmax over the param rows
        wmax = widths_u[0]
        hmax = heights_u[0]
        for k in range(1, bins):
            wmax = jnp.maximum(wmax, widths_u[k])
            hmax = jnp.maximum(hmax, heights_u[k])
        we = [jnp.exp(w - wmax) for w in widths_u]
        he = [jnp.exp(h - hmax) for h in heights_u]
        wsum = functools.reduce(jnp.add, we)
        hsum = functools.reduce(jnp.add, he)
        widths = [total_width * w / wsum for w in we]
        heights = [total_width * h / hsum for h in he]
    else:
        bottom_u = prow(2 * bins)
        left_u = prow(2 * bins + 1)
        deltas_u = [prow(2 * bins + 2 + k) for k in range(bins - 1)]
        left = left_u + default_domain[0]
        bottom = bottom_u + default_domain[2]
        default_bw = (default_domain[1] - default_domain[0]) / bins
        default_bh = (default_domain[3] - default_domain[2]) / bins
        xshift = float(np.log(np.exp(default_bw - min_bin_sizes[0]) - 1))
        yshift = float(np.log(np.exp(default_bh - min_bin_sizes[1]) - 1))
        widths = [min_bin_sizes[0] + _softplus(w + xshift) for w in widths_u]
        heights = [min_bin_sizes[1] + _softplus(h + yshift) for h in heights_u]

        domain_w = functools.reduce(jnp.add, widths)
        domain_h = functools.reduce(jnp.add, heights)
        w_resize = clamp_domain(domain_w) / domain_w
        h_resize = clamp_domain(domain_h) / domain_h
        widths = [w * w_resize for w in widths]
        heights = [h * h_resize for h in heights]
        left = left * w_resize
        bottom = bottom * h_resize

    # knots: sequential accumulation (exact cumsum order)
    kx = [left]
    for k in range(bins):
        kx.append(kx[-1] + widths[k])
    ky = [bottom]
    for k in range(bins):
        ky.append(ky[-1] + heights[k])

    scale = (ky[-1] - bottom) / (kx[-1] - left)
    shift = bottom - scale * left
    dv = [scale] + [_softplus(d + float(np.log(np.e - 1))) for d in deltas_u] \
        + [scale]

    yv = y_ref[...]  # (G, D)
    inside = (yv > ky[0]) & (yv <= ky[bins])
    tail = (yv - shift) / scale
    y_safe = jnp.clip(yv, ky[0], ky[bins])

    # searchsorted over the bins+1 y-knots: idx = (# knots <= y) - 1
    cnt = jnp.zeros_like(yv)
    for k in range(bins + 1):
        cnt = cnt + (y_safe >= ky[k]).astype(yv.dtype)
    idx = jnp.clip(cnt - 1.0, 0.0, float(bins - 1))

    # one-hot gather of the active bin's knot parameters
    xk, xkp = kx[0], kx[1]
    yk, ykp = ky[0], ky[1]
    dk, dkp = dv[0], dv[1]
    for k in range(1, bins):
        m = idx == float(k)
        xk = jnp.where(m, kx[k], xk)
        xkp = jnp.where(m, kx[k + 1], xkp)
        yk = jnp.where(m, ky[k], yk)
        ykp = jnp.where(m, ky[k + 1], ykp)
        dk = jnp.where(m, dv[k], dk)
        dkp = jnp.where(m, dv[k + 1], dkp)

    out, log_deriv = _rq_bin(y_safe, xk, xkp, yk, ykp, dk, dkp, rev=True)

    x_ref[...] = jnp.where(inside, out, tail)
    logj_ref[...] = jnp.where(inside, log_deriv, jnp.log(scale))


@functools.partial(
    jax.jit,
    static_argnames=(
        "bins", "min_bin_sizes", "default_domain", "identity_tails",
        "domain_clamping", "group",
    ),
)
def fused_binned_rqs_inverse(
    y, theta, bins, min_bin_sizes=(0.01, 0.01),
    default_domain=(-15.0, 15.0, -15.0, 15.0), identity_tails=False,
    domain_clamping=None, group=16,
):
    """Inverse RQS on a predicted domain, one Pallas pass over theta.

    y: (B, D) points in codomain space; theta: (B, D, P) raw subnet outputs
    with P = 2*bins + (bins-1) + (1 if identity_tails else 2). Returns
    (x, logdet) identical (to f32 rounding) to
    ``binned_rqs(y, binned_constrain(theta, ...), rev=True)``.
    """
    b, d = y.shape
    p = theta.shape[-1]
    # Mosaic requires the sublane-axis block size to be a multiple of 8 (or
    # the full batch) — same constraint fused_energy_decoder.py documents.
    # Round the group DOWN to a multiple of 8 and pad the batch up to a
    # multiple of the group (padded rows run garbage math on zero params —
    # finite, sliced off below); a divisor-of-B group would compile only for
    # batches that happen to be 8-smooth (256 yes, the reference's customary
    # 1000 or a user's 100 no).
    if b <= group:
        g = b
    else:
        g = max(8 * (group // 8), 8)
    b_pad = -(-b // g) * g
    theta_t = jnp.swapaxes(theta, 1, 2)  # (B, P, D): params onto sublanes
    y_in = y if b_pad == b else jnp.pad(y, ((0, b_pad - b), (0, 0)))
    if b_pad != b:
        theta_t = jnp.pad(theta_t, ((0, b_pad - b), (0, 0), (0, 0)))

    kernel = functools.partial(
        _spline_inv_kernel, bins=bins, min_bin_sizes=tuple(min_bin_sizes),
        default_domain=tuple(default_domain), identity_tails=identity_tails,
        domain_clamping=domain_clamping, group=g,
    )
    x, logj = pl.pallas_call(
        kernel,
        grid=(b_pad // g,),
        in_specs=[
            pl.BlockSpec((g, d), lambda i: (i, 0)),
            pl.BlockSpec((g, p, d), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, d), lambda i: (i, 0)),
            pl.BlockSpec((g, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, d), y.dtype),
            jax.ShapeDtypeStruct((b_pad, d), y.dtype),
        ],
        # the unrolled per-group constrain keeps ~3 (P, D) panels of
        # knot/derivative rows live — past the 16M default scoped-VMEM
        # budget at ds2 shapes (g=16, D=3240: 17.4M measured); v5e has 128M
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(y_in, theta_t)
    # rev-direction logdet is the negated forward log-derivative sum
    # (ops/rqs.py:binned_rqs)
    return x[:b], -jnp.sum(logj[:b], axis=-1)
