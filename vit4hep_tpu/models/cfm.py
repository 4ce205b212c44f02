"""Conditional Flow Matching generative model, as pure functions over params.

The reference's ``CFM`` (models/base_model.py:159-247) is a stateful torch
module whose sampler drives torchdiffeq step-by-step from Python. Here the model
is a thin wrapper that owns only *static* structure (the Flax net, shapes,
trajectory, ODE config); everything numerical is a pure function of
``(params, inputs, rng)`` so the training step and the entire 20-step RK4
sampling loop each compile to a single XLA program (`vit4hep_tpu/ops/ode.py`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vit4hep_tpu.models.trajectories import get_trajectory
from vit4hep_tpu.ops.ode import odeint, parse_odeint_kwargs


class CFM:
    """Base CFM over flat vectors (the energy model: shape=[n_layers])."""

    model_type = "cfm"

    def __init__(
        self,
        net,
        shape,
        time_distribution="uniform",
        trajectory="linear",
        odeint_kwargs=None,
        **_ignored,
    ):
        if time_distribution != "uniform":
            raise ValueError(f"time_distribution '{time_distribution}' not implemented")
        self.net = net
        self.shape = tuple(int(s) for s in shape)
        self.trajectory = get_trajectory(trajectory)
        self.ode_kwargs = parse_odeint_kwargs(odeint_kwargs)

    # -- static structure ------------------------------------------------------
    @property
    def sample_net(self):
        """Forward-only twin for the sampling ODE: identical param tree, with
        the DiT-block megakernel enabled when the config says
        `fused_block: sample` (models/vit.py:sampling_variant) — training
        keeps the composed path whose backward is faster. A property (not
        set in __init__) because patching subclasses rebuild ``self.net``
        with per-section grids after construction."""
        from vit4hep_tpu.models.vit import sampling_variant

        return sampling_variant(self.net)

    @property
    def condition_dim(self) -> int:
        cfg = self.net.cfg
        # fine-tuned nets prepend a c_mapper taking the TARGET condition width
        # (in_condition_dim); example conditions must use that width or the
        # mapper kernel initializes against the backbone's
        in_dim = getattr(cfg, "in_condition_dim", None)
        if in_dim is not None:
            return in_dim
        return getattr(cfg, "condition_dim", None) or getattr(cfg, "dims_c")

    def x_shape(self, batch_size: int) -> tuple:
        return (batch_size, *self.shape)

    def example_inputs(self, batch_size: int = 2):
        x = jnp.zeros(self.x_shape(batch_size), jnp.float32)
        t = jnp.zeros((batch_size, 1), jnp.float32)
        c = jnp.zeros((batch_size, self.condition_dim), jnp.float32)
        return x, t, c

    def init_params(self, rng, batch_size: int = 2):
        x, t, c = self.example_inputs(batch_size)
        return self.net.init(rng, *self._net_args(x, t, c))

    # -- forward ---------------------------------------------------------------
    def _net_args(self, x, t, c):
        """Hook for patching subclasses; base model feeds the net directly."""
        return (x, t, c)

    def _net_out(self, z, x_shape):
        return z

    def forward(self, params, x, t, c):
        """Predict the velocity field. x: (B, *shape); t: (B, 1); c: (B, K)."""
        z = self.net.apply(params, *self._net_args(x, t, c))
        return self._net_out(z, x.shape)

    # -- loss (reference models/base_model.py:203-218) --------------------------
    def batch_loss(self, params, x, c, rng):
        k_t, k_x0 = jax.random.split(rng)
        bcast = (x.shape[0],) + (1,) * (x.ndim - 1)
        t = jax.random.uniform(k_t, bcast, dtype=x.dtype)
        x_0 = jax.random.normal(k_x0, x.shape, dtype=x.dtype)
        x_t, x_t_dot = self.trajectory(x_0, x, t)
        velocity = self.forward(params, x_t, t.reshape(-1, 1), c)
        return jnp.mean((velocity - x_t_dot) ** 2)

    # -- sampling: one jitted lax.scan over the ODE grid ------------------------
    def token_shape(self, batch_size: int):
        """Patching subclasses return (B, T, P) to integrate the sampling ODE
        in token space (patching is bijective and x_T ~ N(0,1) iid is invariant
        under it, so the voxel<->token transposes hoist out of the RK4 loop);
        None integrates in x-space."""
        return None

    def sample_batch(self, params, c, rng):
        """Draw x_T ~ N(0,1) and integrate the learned velocity field t: 0 -> 1."""
        tshape = self.token_shape(c.shape[0])
        if tshape is None:
            x_T = jax.random.normal(rng, self.x_shape(c.shape[0]), dtype=jnp.float32)

            def f(t, x_t):
                t_b = jnp.full((x_t.shape[0], 1), t, dtype=x_t.dtype)
                z = self.sample_net.apply(params, *self._net_args(x_t, t_b, c))
                return self._net_out(z, x_t.shape)

            return odeint(f, x_T, t0=0.0, t1=1.0, **self.ode_kwargs)

        x_T = jax.random.normal(rng, tshape, dtype=jnp.float32)

        def f(t, tokens):
            t_b = jnp.full((tokens.shape[0], 1), t, tokens.dtype)
            return self.sample_net.apply(params, tokens, t_b, c)

        tokens = odeint(f, x_T, t0=0.0, t1=1.0, **self.ode_kwargs)
        return self.from_patches(tokens)

    def net_evals_per_sample(self) -> int:
        from vit4hep_tpu.ops.ode import NET_EVALS_PER_STEP, grid_steps

        method = self.ode_kwargs.get("method", "rk4")
        step = self.ode_kwargs.get("step_size", 0.05)
        # mirror odeint's truncated-final-step grid: for step sizes that do
        # not divide [0, 1] the remainder costs one extra stepper call
        return NET_EVALS_PER_STEP[method] * grid_steps(step)

    def param_count(self, params) -> int:
        return sum(int(math.prod(p.shape)) for p in jax.tree.leaves(params))
