"""Legacy CaloDREAM autoregressive energy network (reference
`/root/reference/nn/cfm/transformer.py:12-178`).

A causal encoder-decoder transformer over u-vector components with a shared
1-D CFM subnet per dimension. Training evaluates all dimensions in parallel
(teacher-forced, causal mask); sampling generates dimension-by-dimension, each
step solving a 1-D flow-matching ODE with the jitted lax.scan RK4 integrator.
Not referenced by any live reference config (SURVEY.md 2.4) — provided for
full component parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vit4hep_tpu.models.energy_transformer import _DecoderLayer, _EncoderLayer
from vit4hep_tpu.ops.ode import odeint, parse_odeint_kwargs
from vit4hep_tpu.ops.pos_embed import gaussian_fourier_projection


@dataclasses.dataclass(frozen=True)
class ARTransformerParams:
    shape: tuple = (45,)
    n_con: int = 1
    dim_embedding: int = 64
    n_head: int = 4
    n_encoder_layers: int = 2
    n_decoder_layers: int = 2
    dim_feedforward: int = 256
    dropout_transformer: float = 0.0
    x_embed: bool = False
    c_embed: bool = False
    layer_cond: bool = False
    encode_t_dim: int = 64
    encode_t_scale: float = 30.0
    intermediate_dim: int = 512
    layers_per_block: int = 8
    activation: str = "SiLU"

    @classmethod
    def create(cls, param: dict) -> "ARTransformerParams":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in dict(param).items() if k in known}
        if "shape" in kwargs:
            kwargs["shape"] = tuple(kwargs["shape"])
        return cls(**kwargs)

    @property
    def dims_in(self) -> int:
        return int(self.shape[0])


_ACT = {"SiLU": nn.silu, "ReLU": nn.relu, "GELU": nn.gelu}


class _Subnet(nn.Module):
    """Per-dimension 1-D CFM velocity net (reference build_subnet, :80-105)."""

    cfg: ARTransformerParams

    @nn.compact
    def __call__(self, x_t, t_feats, embedding):
        p = self.cfg
        act = _ACT[p.activation]
        h = jnp.concatenate([x_t, t_feats, embedding], axis=-1)
        h = nn.Dense(p.intermediate_dim)(h)
        h = act(h)
        for _ in range(1, p.layers_per_block - 1):
            h = nn.Dense(p.intermediate_dim)(h)
            h = act(h)
        return nn.Dense(1)(h)


def _sincos_positional(n, d):
    pos = np.arange(n)[:, None]
    div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
    pe = np.zeros((n, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class ARTransformerNet(nn.Module):
    """forward(c, x_t, t, x) -> per-dim velocity; sample via
    :class:`ARtransformerModel`. Submodules live in setup() so the training
    pass, the prefix-embedding pass and the 1-D velocity pass share weights."""

    cfg: ARTransformerParams

    def setup(self):
        p = self.cfg
        self.time_embed = nn.Dense(p.encode_t_dim, name="time_embed")
        self.encoders = [
            _EncoderLayer(p.dim_embedding, p.n_head, p.dim_feedforward, "relu",
                          name=f"encoder_{i}")
            for i in range(p.n_encoder_layers)
        ]
        self.decoders = [
            _DecoderLayer(p.dim_embedding, p.n_head, p.dim_feedforward, "relu",
                          name=f"decoder_{i}")
            for i in range(p.n_decoder_layers)
        ]
        self.subnet = _Subnet(p, name="subnet")
        # torch nn.Transformer always applies final encoder/decoder LayerNorms
        self.encoder_norm = nn.LayerNorm(epsilon=1e-5, name="encoder_norm")
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        if p.x_embed:
            self.x_embed_net = [nn.Dense(p.dim_embedding, name="x_embed_0"),
                                nn.Dense(p.dim_embedding, name="x_embed_1")]
        if p.c_embed:
            self.c_embed_net = [nn.Dense(p.dim_embedding, name="c_embed_0"),
                                nn.Dense(p.dim_embedding, name="c_embed_1")]
        w = np.random.default_rng(20260816).normal(
            size=(p.encode_t_dim // 2,)
        ) * p.encode_t_scale
        self._t_freqs = jnp.asarray(w, jnp.float32)

    def _t_feats(self, t):
        feats = gaussian_fourier_projection(
            t.reshape(-1, 1).astype(jnp.float32), self._t_freqs
        )
        return self.time_embed(feats)

    def _embed(self, x, dim, embed_net, act=None):
        """One-hot + zero-pad or learned embedding + sinusoidal positions
        (reference compute_embedding, :61-78). ``act`` sits between the two
        embedding Linears (the reference's c_embed is Linear-ReLU-Linear,
        x_embed Linear-Linear, transformer.py:39-49)."""
        p = self.cfg
        b, n, f = x.shape
        if embed_net is None:
            one_hot = jnp.broadcast_to(jnp.eye(dim, dtype=x.dtype)[None, :n, :], (b, n, dim))
            n_rest = p.dim_embedding - dim - f
            pad = jnp.zeros((b, n, n_rest), x.dtype)
            return jnp.concatenate([x, one_hot, pad], axis=-1)
        h = embed_net[0](x)
        if act is not None:
            h = act(h)
        h = embed_net[1](h)
        return h + jnp.asarray(_sincos_positional(n, p.dim_embedding))[None, :n]

    def _embed_c(self, c):
        return self._embed(c, self.cfg.n_con,
                           self.c_embed_net if self.cfg.c_embed else None,
                           act=nn.relu)

    def _embed_x(self, x):
        return self._embed(x, self.cfg.dims_in + 1,
                           self.x_embed_net if self.cfg.x_embed else None)

    def _transform(self, src, tgt):
        n = tgt.shape[1]
        causal = jnp.tril(jnp.ones((n, n), bool))  # True = attend
        for enc in self.encoders:
            src = enc(src)
        src = self.encoder_norm(src)
        h = tgt
        for dec in self.decoders:
            h = dec(h, src, self_mask=causal)
        return self.decoder_norm(h)

    def __call__(self, c, x_t, t, x):
        """Teacher-forced parallel training pass (reference forward, :134-156).

        c: (B, dims_c, 1); x_t: (B, dims_in, 1) noisy components;
        t: (B, dims_in, 1); x: (B, dims_in, 1) clean targets.
        """
        p = self.cfg
        xp = jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))
        embedding = self._transform(self._embed_c(c), self._embed_x(xp))
        if p.layer_cond:
            one_hot = jnp.broadcast_to(
                jnp.eye(p.dims_in, dtype=embedding.dtype)[None], (len(c), p.dims_in, p.dims_in)
            )
            embedding = jnp.concatenate([embedding, one_hot], axis=-1)
        t_feats = self._t_feats(t.reshape(-1)).reshape(t.shape[0], t.shape[1], -1)
        return self.subnet(x_t, t_feats, embedding)

    def embedding_for(self, c, x_prefix):
        """Decoder embedding of the next dimension given generated prefix
        (used by autoregressive sampling; reference :157-176)."""
        return self._transform(self._embed_c(c), self._embed_x(x_prefix))[:, -1:]

    def velocity_1d(self, x_t, t, embedding):
        """1-D CFM velocity for one dimension (sampling hot loop)."""
        t_feats = self._t_feats(t.reshape(-1)).reshape(x_t.shape[0], 1, -1)
        return self.subnet(x_t[:, None], t_feats, embedding)[:, 0]


class ARtransformerModel:
    """Model wrapper with the CFM-style API (init_params/batch_loss/sample_batch).

    Counterpart of using ``ARtransformer`` as the energy net in the reference's
    CFM (forward handles both directions there; here the AR structure needs its
    own loss/sampler).
    """

    model_type = "cfm"

    def __init__(self, param: dict, odeint_kwargs=None, **_ignored):
        self.cfg = ARTransformerParams.create(param)
        self.net = ARTransformerNet(cfg=self.cfg)
        self.shape = (self.cfg.dims_in,)
        self.ode_kwargs = parse_odeint_kwargs(
            odeint_kwargs or param.get("solver_kwargs")
        )

    @property
    def condition_dim(self) -> int:
        return self.cfg.n_con

    def init_params(self, rng, batch_size: int = 2):
        d = self.cfg.dims_in
        c = jnp.zeros((batch_size, self.cfg.n_con, 1))
        x = jnp.zeros((batch_size, d, 1))
        t = jnp.zeros((batch_size, d, 1))
        return self.net.init(rng, c, x, t, x)

    def batch_loss(self, params, x, c, rng):
        """Parallel teacher-forced CFM loss over all dimensions."""
        if c.ndim == 2:
            c = c[..., None]
        x = x[..., None] if x.ndim == 2 else x
        k_t, k_x0 = jax.random.split(rng)
        t = jax.random.uniform(k_t, (x.shape[0], x.shape[1], 1), dtype=x.dtype)
        x_0 = jax.random.normal(k_x0, x.shape, dtype=x.dtype)
        x_t = (1 - t) * x_0 + t * x
        x_t_dot = x - x_0
        v = self.net.apply(params, c, x_t, t, x)
        return jnp.mean((v - x_t_dot) ** 2)

    def sample_batch(self, params, c, rng):
        """Dimension-by-dimension generation (reference :157-176): each step
        re-encodes the prefix and solves a 1-D ODE with the scan integrator."""
        if c.ndim == 2:
            c = c[..., None]
        b = c.shape[0]
        x = jnp.zeros((b, 1, 1), c.dtype)
        keys = jax.random.split(rng, self.cfg.dims_in)
        for i in range(self.cfg.dims_in):
            emb = self.net.apply(params, c, x, method="embedding_for")
            if self.cfg.layer_cond:
                # reference transformer.py:166-173: one-hot of the dimension
                # being generated is appended per autoregressive step
                one_hot = jnp.zeros((b, 1, self.cfg.dims_in), emb.dtype).at[:, 0, i].set(1.0)
                emb = jnp.concatenate([emb, one_hot], axis=-1)
            x_0 = jax.random.normal(keys[i], (b, 1), c.dtype)

            def f(t, x_t, emb=emb):
                t_b = jnp.full((b, 1), t, x_t.dtype)
                return self.net.apply(params, x_t, t_b, emb, method="velocity_1d")

            x_new = odeint(f, x_0, t0=0.0, t1=1.0, **self.ode_kwargs)
            x = jnp.concatenate([x, x_new[:, :, None]], axis=1)
        return x[:, 1:, 0]


def ARtransformer(param: dict, **kwargs) -> ARtransformerModel:
    """Config-surface factory (``_target_: nn.cfm.transformer.ARtransformer``)."""
    return ARtransformerModel(param, **kwargs)
