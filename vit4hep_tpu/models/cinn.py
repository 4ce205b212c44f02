"""Conditional Invertible Neural Network (cINN) generative model.

Counterpart of the reference ``CINN`` (models/base_model.py:101-156): maximum
likelihood training with ``log p(x|c) = -||z||^2/2 + log|det J| - d/2 log 2pi``
where ``z = f(x, c)`` is the FlowChain forward pass, and sampling by drawing
``z ~ N(0, 1)`` and running the chain inverse. Both directions are pure
functions of (params, inputs) and compile to single XLA programs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


class CINN:
    """Wraps a FlowChain Flax module with the model API the experiments use
    (init_params / batch_loss / sample_batch), mirroring vit4hep_tpu.models.cfm.CFM."""

    model_type = "cinn"

    def __init__(self, shape, **_ignored):
        self.shape = tuple(int(s) for s in shape)
        self.net = None  # set by subclasses via build_net()
        # optional forward-only twin for the inverse (sampling) direction:
        # identical param tree with the DiT-block-stack megakernel enabled
        # in the ViT1D subnets (vit_kwargs `fused_block: sample`) — the
        # likelihood/training direction stays on the composed path
        self.sample_net = None
        self.in_channels = 1
        self.condition_dim = 1

    # -- structure ---------------------------------------------------------------
    def x_shape(self, batch_size: int) -> tuple:
        return (batch_size, *self.shape)

    def example_inputs(self, batch_size: int = 2):
        x = jnp.zeros(self.x_shape(batch_size), jnp.float32)
        c = jnp.zeros((batch_size, self.condition_dim), jnp.float32)
        return x, c

    def init_params(self, rng, batch_size: int = 2):
        x, c = self.example_inputs(batch_size)
        return self.net.init(rng, self.to_patches(x), c)

    def to_patches(self, x):
        return x

    def from_patches(self, x):
        return x

    # -- math --------------------------------------------------------------------
    def forward(self, params, x, c, rev=False, net=None):
        """rev=False: x -> (z, log|det J|); rev=True: z -> (x, log|det J^-1|).

        Always runs the composed (differentiable-everywhere) flow unless a
        ``net`` override is passed: the megakernel twin (``sample_net``) is
        gated at the sampling call site only (``sample_batch``), so any
        future inverse-direction LOSS differentiates the composed likelihood
        path, not the kernel's recompute backward + bf16-matmul numerics.
        """
        tokens = self.to_patches(x)
        method = "inverse" if rev else "forward"
        z, log_jac = (net or self.net).apply(params, tokens, c, method=method)
        return self.from_patches(z), log_jac

    def log_prob(self, params, x, c):
        """Mean conditional log-likelihood (reference models/base_model.py:107-121)."""
        z, log_jac_det = self.forward(params, x, c, rev=False)
        z = z.reshape(z.shape[0], -1)
        d = z.shape[1]
        log_prob = (
            -0.5 * jnp.sum(z**2, axis=1) + log_jac_det - d / 2 * math.log(2 * math.pi)
        )
        return jnp.mean(log_prob)

    def batch_loss(self, params, x, c, rng=None):
        return -self.log_prob(params, x, c)

    def sample_batch(self, params, c, rng):
        z = jax.random.normal(rng, self.x_shape(c.shape[0]), dtype=jnp.float32)
        x, _ = self.forward(params, z, c, rev=True, net=self.sample_net)
        return x.reshape(z.shape)

    def net_evals_per_sample(self) -> int:
        return 1

    def param_count(self, params) -> int:
        return sum(int(math.prod(p.shape)) for p in jax.tree.leaves(params))
