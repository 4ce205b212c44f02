"""Invertible building blocks for conditional normalizing flows (cINN).

FrEIA-free, Flax-native re-design of the reference's coupling stack
(`/root/reference/nn/inn/`): every block is a Flax module exposing
``forward(x, c) -> (y, logdet)`` and ``inverse(y, c) -> (x, logdet)`` built on
the pure spline math in vit4hep_tpu/ops/rqs.py, and :class:`FlowChain`
sequences (coupling, permutation) pairs — replacing FrEIA's ``GraphINN``
(reference experiments/calochallenge/calochallenge_cinn/model.py:100-127).

Live config surface (freia_utils.py:15-28):
- ``CaloRQSplineFrEIA``   -> :class:`BinnedRQSCouplingBlock` (ViT1D subnets)
- ``RQSplineNFlows``      -> :class:`SimpleRQSCouplingBlock` (MLP subnets)
- ``CaloRQSplineNFlows``  -> :class:`NFlowsRQSCouplingBlock` (ViT1D subnets)
- ``OneSidedCaloRQSplineNFlows`` -> :class:`NFlowsRQSCouplingBlock` with
  ``one_sided=True``
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vit4hep_tpu.ops import rqs


# ---------------------------------------------------------------------------
# subnets
# ---------------------------------------------------------------------------
class SubnetMLP(nn.Module):
    """ReLU MLP parameter subnet (reference nn/inn/subnets.py:34-69)."""

    out_dim: int
    hidden_channels: Sequence[int] = (128, 128)
    n_layers: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_channels[0])(x)
        x = nn.relu(x)
        for n in range(self.n_layers - 1):
            x = nn.Dense(self.hidden_channels[n + 1])(x)
            x = nn.relu(x)
        # zero-init output: every coupling starts as the identity map, which
        # keeps the spline bins well-conditioned at the start of training
        # (the ViT1D subnet gets this for free from its zero-init FinalLayer)
        return nn.Dense(
            self.out_dim, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(x)


# ---------------------------------------------------------------------------
# permutations (reference nn/inn/permute.py + FrEIA PermuteRandom)
# ---------------------------------------------------------------------------
class Permute(nn.Module):
    """Fixed random permutation along ``axis`` (1 = token/channel, 2 = feature).

    The permutation is derived deterministically from ``seed`` so that
    checkpoints reload identically. ``indices`` overrides the seed-derived
    permutation — used when migrating reference FrEIA checkpoints, whose
    ``PermuteRandom`` blocks store their indices as (non-trainable)
    parameters (reference nn/inn/permute.py:31-32).
    """

    size: int
    axis: int = 1
    seed: int = 0
    indices: tuple | None = None

    def setup(self):
        if self.indices is not None:
            perm = np.asarray(self.indices, np.int64)
            if sorted(perm.tolist()) != list(range(self.size)):
                raise ValueError(
                    f"explicit permutation is not a permutation of 0..{self.size - 1}"
                )
        else:
            perm = np.random.default_rng(self.seed).permutation(self.size)
        inv = np.argsort(perm)
        self.perm = jnp.asarray(perm)
        self.perm_inv = jnp.asarray(inv)

    def forward(self, x, c=None):
        return jnp.take(x, self.perm, axis=self.axis), 0.0

    def inverse(self, y, c=None):
        return jnp.take(y, self.perm_inv, axis=self.axis), 0.0

    def __call__(self, x, c=None):  # for init
        return self.forward(x, c)


# ---------------------------------------------------------------------------
# coupling blocks
# ---------------------------------------------------------------------------
def _interleave(y1, y2, axis):
    """Undo the even/odd split: y[..., ::2] = y1, y[..., 1::2] = y2 along axis."""
    stacked = jnp.stack([y1, y2], axis=axis + 1)
    new_shape = list(y1.shape)
    new_shape[axis] = y1.shape[axis] * 2
    return stacked.reshape(new_shape)


class BinnedRQSCouplingBlock(nn.Module):
    """Two-sided RQS coupling with predicted domain + affine tails — the
    ``CaloRQSplineFrEIA`` block of the live shape-cINN configs (reference
    nn/inn/binned.py:10-141, rqs_v2.py:11-71).

    Operates on token sequences (B, T, P). ``spatial=False`` splits tokens
    even/odd; ``spatial=True`` splits features even/odd.
    Each side's subnet sees the passive half + condition and predicts
    ``2*bins + (bins-1) + 2`` params per transformed scalar.
    """

    subnet_ctor: Callable[[int], Any]  # out_params_per_scalar -> module
    bins: int = 10
    min_bin_sizes: tuple = (0.01, 0.01)
    default_domain: tuple = (-15.0, 15.0, -15.0, 15.0)
    identity_tails: bool = False
    domain_clamping: float | None = None
    spatial: bool = False
    # route the inverse (sampling) direction through the single-pass Pallas
    # spline kernel (ops/fused_spline.py) — the composed XLA inverse re-reads
    # the ~(B, D, 31) theta tensors ~15x from HBM (round-3 profile). The
    # forward/likelihood direction always runs the composed differentiable
    # path; the kernel defines no VJP.
    fused_spline: bool = False
    # remat the likelihood spline (constrain + rqs) in training: autodiff
    # saves ~a dozen (B, D, K)-sized elementwise intermediates per coupling
    # side (the round-5 cINN train roofline measured the spline vjp at ~22x
    # its forward); jax.checkpoint keeps only (flat, theta) and recomputes
    # the cheap elementwise forward inside the backward. Opt-in pending the
    # on-chip A/B (tools/cinn_train_ab.py).
    remat_spline: bool = False

    @property
    def n_params(self) -> int:
        return 2 * self.bins + (self.bins - 1) + (1 if self.identity_tails else 2)

    def setup(self):
        self.subnet1 = self.subnet_ctor(self.n_params)
        self.subnet2 = self.subnet_ctor(self.n_params)

    def _split(self, x):
        ax = 2 if self.spatial else 1
        return x.take(jnp.arange(0, x.shape[ax], 2), axis=ax), x.take(
            jnp.arange(1, x.shape[ax], 2), axis=ax
        )

    def _apply_spline(self, subnet, active, passive, c, rev):
        theta = subnet(passive, c)  # (B, T_half, n_params * scalars_per_token)
        b = active.shape[0]
        flat = active.reshape(b, -1)
        theta = theta.reshape(b, flat.shape[1], self.n_params)
        if rev and self.fused_spline:
            from vit4hep_tpu.ops.fused_spline import fused_binned_rqs_inverse

            y, logdet = fused_binned_rqs_inverse(
                flat, theta, self.bins, tuple(self.min_bin_sizes),
                tuple(self.default_domain), self.identity_tails,
                self.domain_clamping,
            )
            return y.reshape(active.shape), logdet
        def composed(flat, theta):
            params = rqs.binned_constrain(
                theta, self.bins, tuple(self.min_bin_sizes),
                tuple(self.default_domain), self.identity_tails,
                self.domain_clamping,
            )
            return rqs.binned_rqs(flat, params, rev=rev)

        fn = jax.checkpoint(composed) if self.remat_spline else composed
        y, logdet = fn(flat, theta)
        return y.reshape(active.shape), logdet

    def _run(self, x, c, rev):
        x1, x2 = self._split(x)
        if not rev:
            y1, j1 = self._apply_spline(self.subnet1, x1, x2, c, False)
            y2, j2 = self._apply_spline(self.subnet2, x2, y1, c, False)
        else:
            y2, j2 = self._apply_spline(self.subnet2, x2, x1, c, True)
            y1, j1 = self._apply_spline(self.subnet1, x1, y2, c, True)
        ax = 2 if self.spatial else 1
        return _interleave(y1, y2, ax), j1 + j2

    def forward(self, x, c):
        return self._run(x, c, rev=False)

    def inverse(self, y, c):
        return self._run(y, c, rev=True)

    def __call__(self, x, c):
        return self.forward(x, c)


class SimpleRQSCouplingBlock(nn.Module):
    """Two-sided nflows-style RQS on flat vectors, MLP subnets — the
    ``RQSplineNFlows`` block of the energy cINN (reference
    nn/inn/rqs_nflows.py:208-284).

    Splits the feature vector into first/second half; each side's subnet sees
    [passive_half, condition] concatenated.
    """

    dims_in: int
    num_bins: int = 10
    bounds_init: float = 1.0
    subnet_kwargs: Any = None

    def setup(self):
        # reference rqs_nflows.py:231-235: x1 = first floor(d/2) features,
        # x2 = the remaining ceil(d/2) (order matters when d is odd)
        half1 = self.dims_in // 2
        half2 = self.dims_in - self.dims_in // 2
        kw = dict(self.subnet_kwargs or {})
        self.subnet1 = SubnetMLP(out_dim=(3 * self.num_bins - 1) * half1, **kw)
        self.subnet2 = SubnetMLP(out_dim=(3 * self.num_bins - 1) * half2, **kw)
        self.half1, self.half2 = half1, half2

    def _apply(self, subnet, active, passive, c, rev):
        inp = jnp.concatenate([passive, c], axis=-1) if c is not None else passive
        theta = subnet(inp).reshape(active.shape[0], active.shape[1], -1)
        return rqs.nflows_rqs(active, theta, self.num_bins, self.bounds_init, rev=rev)

    def _run(self, x, c, rev):
        x1, x2 = x[:, : self.half1], x[:, self.half1 :]
        if not rev:
            y1, j1 = self._apply(self.subnet1, x1, x2, c, False)
            y2, j2 = self._apply(self.subnet2, x2, y1, c, False)
        else:
            y2, j2 = self._apply(self.subnet2, x2, x1, c, True)
            y1, j1 = self._apply(self.subnet1, x1, y2, c, True)
        return jnp.concatenate([y1, y2], axis=1), j1 + j2

    def forward(self, x, c):
        return self._run(x, c, rev=False)

    def inverse(self, y, c):
        return self._run(y, c, rev=True)

    def __call__(self, x, c):
        return self.forward(x, c)


class NFlowsRQSCouplingBlock(nn.Module):
    """nflows-style RQS over token sequences with ViT1D subnets — the
    ``CaloRQSplineNFlows`` / ``OneSidedCaloRQSplineNFlows`` blocks (reference
    nn/inn/rqs_nflows.py:12-205). Tokens (or features when ``spatial``) split
    even/odd; ``one_sided=True`` transforms only the second half.
    """

    subnet_ctor: Callable[[int], Any]
    num_bins: int = 10
    bounds_init: float = 1.0
    spatial: bool = False
    one_sided: bool = False

    def setup(self):
        self.subnet1 = self.subnet_ctor(3 * self.num_bins - 1)
        if not self.one_sided:
            self.subnet2 = self.subnet_ctor(3 * self.num_bins - 1)

    def _split(self, x):
        ax = 2 if self.spatial else 1
        return x.take(jnp.arange(0, x.shape[ax], 2), axis=ax), x.take(
            jnp.arange(1, x.shape[ax], 2), axis=ax
        )

    def _apply(self, subnet, active, passive, c, rev):
        theta = subnet(passive, c)
        b = active.shape[0]
        flat = active.reshape(b, -1)
        theta = theta.reshape(b, flat.shape[1], 3 * self.num_bins - 1)
        return rqs.nflows_rqs(flat, theta, self.num_bins, self.bounds_init, rev=rev)

    def _run(self, x, c, rev):
        x1, x2 = self._split(x)
        ax = 2 if self.spatial else 1
        if self.one_sided:
            if not rev:
                y2, j = self._apply(self.subnet1, x2, x1, c, False)
            else:
                y2, j = self._apply(self.subnet1, x2, x1, c, True)
            return _interleave(x1, y2.reshape(x2.shape), ax), j
        if not rev:
            y1, j1 = self._apply(self.subnet1, x1, x2, c, False)
            y1 = y1.reshape(x1.shape)
            y2, j2 = self._apply(self.subnet2, x2, y1, c, False)
        else:
            y2, j2 = self._apply(self.subnet2, x2, x1, c, True)
            y2 = y2.reshape(x2.shape)
            y1, j1 = self._apply(self.subnet1, x1, y2, c, True)
        return _interleave(y1.reshape(x1.shape), y2.reshape(x2.shape), ax), j1 + j2

    def forward(self, x, c):
        return self._run(x, c, rev=False)

    def inverse(self, y, c):
        return self._run(y, c, rev=True)

    def __call__(self, x, c):
        return self.forward(x, c)


# ---------------------------------------------------------------------------
# flow chain
# ---------------------------------------------------------------------------
class FlowChain(nn.Module):
    """Sequence of invertible blocks sharing one condition — the GraphINN
    replacement. ``forward`` composes in order, ``inverse`` in reverse order,
    accumulating log|det J|."""

    blocks: Sequence[Any]

    def forward(self, x, c):
        logdet = jnp.zeros(x.shape[0], x.dtype)
        for block in self.blocks:
            x, j = block.forward(x, c)
            logdet = logdet + j
        return x, logdet

    def inverse(self, z, c):
        logdet = jnp.zeros(z.shape[0], z.dtype)
        for block in reversed(self.blocks):
            z, j = block.inverse(z, c)
            logdet = logdet + j
        return z, logdet

    def __call__(self, x, c):  # for init
        return self.forward(x, c)


class AllInOneBlock(nn.Module):
    """Affine coupling + permutation + global affine ('ActNorm') in one block —
    the FrEIA-style combi block of the reference's legacy ``nn/aio.py:12-308``
    (unused by live configs; its torch forward had the permutation/ActNorm
    paths commented out and a hard-coded reshape). This is a clean
    reconstruction of the documented behavior:

        y = R (Psi(s_g) * Coupling(x) + t_g)

    with soft-clamped affine coupling u1 = x1 * exp(alpha*tanh(s(x2))) + t(x2),
    optional volume-preserving GIN variant, and a hard or SO(N)-sampled soft
    permutation R. Operates on flat feature vectors (B, D).
    """

    dims_in: int
    subnet_ctor: Callable[[int], Any] = None
    affine_clamping: float = 2.0
    gin_block: bool = False
    global_affine_init: float = 1.0
    permute_soft: bool = False
    seed: int = 0

    def setup(self):
        d = self.dims_in
        self.split1 = d // 2
        self.split2 = d - d // 2
        ctor = self.subnet_ctor or (lambda out: SubnetMLP(out_dim=out))
        self.subnet = ctor(2 * self.split2)

        rng = np.random.default_rng(self.seed)
        if self.permute_soft:
            # SO(N) rotation via QR of a gaussian matrix (det +1)
            q, r = np.linalg.qr(rng.normal(size=(d, d)))
            q = q * np.sign(np.diag(r))
            if np.linalg.det(q) < 0:
                q[:, 0] = -q[:, 0]
            w = q
        else:
            w = np.zeros((d, d))
            for i, j in enumerate(rng.permutation(d)):
                w[i, j] = 1.0
        self.w_perm = jnp.asarray(w, jnp.float32)
        self.w_perm_inv = jnp.asarray(w.T, jnp.float32)

        # ActNorm: softplus-activated global scale + offset (aio.py:139-157)
        init_pre = 2.0 * np.log(np.exp(0.5 * 10.0 * self.global_affine_init) - 1)
        self.global_scale = self.param(
            "global_scale", lambda *_: jnp.full((1, d), init_pre, jnp.float32)
        )
        self.global_offset = self.param(
            "global_offset", lambda *_: jnp.zeros((1, d), jnp.float32)
        )

    def _scale(self):
        return 0.1 * 2.0 * jnp.logaddexp(0.5 * self.global_scale, 0.0)

    def _affine(self, x2, a, rev):
        """Soft-clamped affine (aio.py:238-260); GIN removes the volume change."""
        a = a * 0.1
        s = self.affine_clamping * jnp.tanh(a[:, : self.split2])
        if self.gin_block:
            s = s - jnp.mean(s, axis=1, keepdims=True)
        t = a[:, self.split2 :]
        if rev:
            return (x2 - t) * jnp.exp(-s), -jnp.sum(s, axis=1)
        return x2 * jnp.exp(s) + t, jnp.sum(s, axis=1)

    def forward(self, x, c=None):
        x1, x2 = x[:, : self.split1], x[:, self.split1 :]
        a = self.subnet(jnp.concatenate([x1, c], 1) if c is not None else x1)
        y2, logdet = self._affine(x2, a, rev=False)
        y = jnp.concatenate([x1, y2], axis=1)
        scale = self._scale()
        if not self.gin_block:
            y = y * scale + self.global_offset
            logdet = logdet + jnp.sum(jnp.log(scale))
        return y @ self.w_perm.T, logdet

    def inverse(self, y, c=None):
        y = y @ self.w_perm_inv.T
        scale = self._scale()
        logdet = jnp.zeros(y.shape[0], y.dtype)
        if not self.gin_block:
            y = (y - self.global_offset) / scale
            logdet = logdet - jnp.sum(jnp.log(scale))
        x1, y2 = y[:, : self.split1], y[:, self.split1 :]
        a = self.subnet(jnp.concatenate([x1, c], 1) if c is not None else x1)
        x2, j = self._affine(y2, a, rev=True)
        return jnp.concatenate([x1, x2], axis=1), logdet + j

    def __call__(self, x, c=None):
        return self.forward(x, c)


class ElementwiseRQSBlock(nn.Module):
    """Elementwise RQS: every dimension transformed, spline params predicted
    from the condition alone (or free parameters when unconditional) — the
    reference's ``ElementwiseRationalQuadraticSpline`` (nn/inn/rqs_v2.py:74-159).
    Not reachable from any shipped config; provided for component parity.
    """

    dims_in: int
    condition_dim: int = 0
    bins: int = 10
    min_bin_sizes: tuple = (0.01, 0.01)
    default_domain: tuple = (-15.0, 15.0, -15.0, 15.0)
    identity_tails: bool = False
    domain_clamping: float | None = None
    subnet_kwargs: Any = None

    @property
    def n_params(self) -> int:
        return 2 * self.bins + (self.bins - 1) + (1 if self.identity_tails else 2)

    def setup(self):
        if self.condition_dim > 0:
            kw = dict(self.subnet_kwargs or {})
            self.subnet = SubnetMLP(out_dim=self.dims_in * self.n_params, **kw)
        else:
            self.spline_parameters = self.param(
                "spline_parameters", nn.initializers.zeros,
                (self.dims_in * self.n_params,),
            )

    def _params(self, c, batch):
        if self.condition_dim > 0:
            theta = self.subnet(c)
        else:
            theta = jnp.broadcast_to(
                self.spline_parameters, (batch, self.dims_in * self.n_params)
            )
        theta = theta.reshape(-1, self.dims_in, self.n_params)
        return rqs.binned_constrain(
            theta, self.bins, tuple(self.min_bin_sizes), tuple(self.default_domain),
            self.identity_tails, self.domain_clamping,
        )

    def forward(self, x, c=None):
        return rqs.binned_rqs(x, self._params(c, x.shape[0]), rev=False)

    def inverse(self, y, c=None):
        return rqs.binned_rqs(y, self._params(c, y.shape[0]), rev=True)

    def __call__(self, x, c=None):
        return self.forward(x, c)
