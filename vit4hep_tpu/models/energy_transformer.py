"""CFM energy network: encoder-decoder transformer over u-vector components.

Re-implements the reference's ``ParallelTransformer``
(`/root/reference/nn/cfm/transformer_cfm.py:12-119`) — which wraps torch's
post-LayerNorm ``nn.Transformer`` — as Flax modules. It predicts the CFM
velocity for the entire 45/46-dim energy-ratio vector in one forward pass,
conditioned on the (embedded) incident energy.

Two embedding modes, selected by ``embeds`` exactly as in the reference:
- ``embeds: true``  — learned per-component value embeddings + positional
  ``nn.Embed``; d_model = 2 * dim_embedding.
- ``embeds: false`` — [value, one-hot(component), zero-padding] vectors;
  d_model = dim_embedding.

The Gaussian-Fourier time features use a fixed (non-trainable) random
projection; here it is a deterministic constant (or the ``fourier_w`` config
value, e.g. from a migrated torch checkpoint) so checkpoints are reproducible
without carrying a frozen parameter through the optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vit4hep_tpu.ops.attention import dot_product_attention
from vit4hep_tpu.ops.pos_embed import gaussian_fourier_projection


@dataclasses.dataclass(frozen=True)
class EnergyTransformerParams:
    """Defaults track reference nn/cfm/transformer_cfm.py:21-34."""

    dims_in: int = 46
    dims_c: int = 1
    dim_embedding: int = 180
    nhead: int = 4
    num_encoder_layers: int = 2
    num_decoder_layers: int = 4
    dim_feedforward: int = 256
    dropout: float = 0.0
    activation: str = "relu"
    embeds: bool = False
    encode_t_scale: float = 30.0
    encode_t_dim: int = 64
    attn_impl: str = "xla"
    compute_dtype: str = "float32"
    # Frozen Gaussian-Fourier time-projection weights (encode_t_dim // 2 of
    # them). The reference stores these as a non-trainable random parameter in
    # its checkpoints (transformer_cfm.py:154-165); ours default to a
    # deterministic constant. Set explicitly (tuple/list) when migrating a
    # torch checkpoint so the time features match the trained network.
    fourier_w: tuple | None = None

    @classmethod
    def create(cls, param: dict) -> "EnergyTransformerParams":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in dict(param).items() if k in known}
        if kwargs.get("fourier_w") is not None:
            kwargs["fourier_w"] = tuple(float(w) for w in kwargs["fourier_w"])
        return cls(**kwargs)

    def __post_init__(self):
        if self.embeds and self.encode_t_dim != self.dim_embedding:
            # the reference concatenates [t_emb, x_emb] into d_model =
            # 2 * dim_embedding (transformer_cfm.py:78-84), which only closes
            # when encode_t_dim == dim_embedding; its shipped configs satisfy
            # this implicitly. Fail loudly instead of at trace time.
            raise ValueError(
                f"embeds=True requires encode_t_dim ({self.encode_t_dim}) "
                f"== dim_embedding ({self.dim_embedding})"
            )

    @property
    def d_model(self) -> int:
        return 2 * self.dim_embedding if self.embeds else self.dim_embedding

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype in ("bfloat16", "bf16") else jnp.float32


def _activation(name: str):
    return {"relu": nn.relu, "gelu": nn.gelu, "silu": nn.silu}[name]


class _MHA(nn.Module):
    d_model: int
    nhead: int
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask=None):
        b, nq, _ = q_in.shape
        nk = kv_in.shape[1]
        hd = self.d_model // self.nhead
        q = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(kv_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(kv_in)
        q = q.reshape(b, nq, self.nhead, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, self.nhead, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, self.nhead, hd).transpose(0, 2, 1, 3)
        out = dot_product_attention(q, k, v, mask=mask, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)


class _FeedForward(nn.Module):
    d_model: int
    dim_feedforward: int
    activation: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        x = _activation(self.activation)(x)
        return nn.Dense(self.d_model, dtype=self.dtype)(x)


class _EncoderLayer(nn.Module):
    """Post-LN encoder layer (torch TransformerEncoderLayer, norm_first=False)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(
            x + _MHA(self.d_model, self.nhead, attn_impl=self.attn_impl,
                     dtype=self.dtype, name="self_attn")(x, x)
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(
            x + _FeedForward(self.d_model, self.dim_feedforward, self.activation,
                             dtype=self.dtype)(x)
        )
        return x


class _DecoderLayer(nn.Module):
    """Post-LN decoder layer: self-attn, cross-attn, FFN."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str
    attn_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, self_mask=None):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(
            x + _MHA(self.d_model, self.nhead, attn_impl=self.attn_impl,
                     dtype=self.dtype, name="self_attn")(
                x, x, mask=self_mask
            )
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(
            x + _MHA(self.d_model, self.nhead, attn_impl=self.attn_impl,
                     dtype=self.dtype, name="cross_attn")(x, memory)
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(
            x + _FeedForward(self.d_model, self.dim_feedforward, self.activation,
                             dtype=self.dtype)(x)
        )
        return x


class ParallelTransformerNet(nn.Module):
    cfg: EnergyTransformerParams

    def _time_features(self, t):
        """Fixed Gaussian random-feature projection -> Dense (reference :39-42)."""
        p = self.cfg
        if p.fourier_w is not None:
            w = np.asarray(p.fourier_w, np.float32)
        else:
            w = np.random.default_rng(20260816).normal(size=(p.encode_t_dim // 2,)) * p.encode_t_scale
        feats = gaussian_fourier_projection(
            t.reshape(t.shape[0], 1).astype(jnp.float32), jnp.asarray(w, jnp.float32)
        )
        return nn.Dense(p.encode_t_dim, dtype=p.dtype, name="time_embed")(feats.astype(p.dtype))

    def _embed_x(self, x, t_feats):
        """Target-sequence embedding (reference compute_embedding, :71-97)."""
        p = self.cfg
        b, n = x.shape
        if p.embeds:
            xe = nn.Dense(p.dim_embedding, dtype=p.dtype, name="x_embed")(x[..., None])
            pos = nn.Embed(p.dims_in, p.dim_embedding, dtype=p.dtype, name="pos_embed_x")(
                jnp.arange(n)
            )
            xe = xe + pos[None]
            t_rep = jnp.repeat(t_feats[:, None, :], n, axis=1)
            return jnp.concatenate([t_rep, xe], axis=-1)  # (B, N, 2E)
        one_hot = jnp.eye(p.dims_in, dtype=x.dtype)[None, :n, :]
        one_hot = jnp.broadcast_to(one_hot, (b, n, p.dims_in))
        n_rest = p.dim_embedding - p.dims_in - 1
        assert n_rest >= 0
        pad = jnp.zeros((b, n, n_rest), x.dtype)
        return jnp.concatenate([x[..., None], one_hot, pad], axis=-1)

    def _embed_c(self, c):
        p = self.cfg
        b, n = c.shape
        if p.embeds:
            ce = nn.Dense(2 * p.dim_embedding, dtype=p.dtype, name="c_embed")(c[..., None])
            pos = nn.Embed(p.dims_c, 2 * p.dim_embedding, dtype=p.dtype, name="pos_embed_c")(
                jnp.arange(n)
            )
            return ce + pos[None]
        one_hot = jnp.eye(p.dims_c, dtype=c.dtype)[None, :n, :]
        one_hot = jnp.broadcast_to(one_hot, (b, n, p.dims_c))
        n_rest = p.dim_embedding - p.dims_c - 1
        pad = jnp.zeros((b, n, n_rest), c.dtype)
        return jnp.concatenate([c[..., None], one_hot, pad], axis=-1)

    @nn.compact
    def __call__(self, x, t, condition=None):
        """x: (B, dims_in); t: (B,) or (B, 1); condition: (B, dims_c) or None."""
        p = self.cfg
        dt = p.dtype
        x = x.astype(dt)
        t_feats = self._time_features(t)

        tgt = self._embed_x(x, t_feats)
        if condition is None:
            memory = jnp.zeros((x.shape[0], x.shape[1], p.d_model), dt)
        else:
            src = self._embed_c(condition.astype(dt))
            for i in range(p.num_encoder_layers):
                src = _EncoderLayer(
                    p.d_model, p.nhead, p.dim_feedforward, p.activation,
                    attn_impl=p.attn_impl, dtype=dt, name=f"encoder_{i}",
                )(src)
            memory = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="encoder_norm")(src)

        h = tgt
        for i in range(p.num_decoder_layers):
            h = _DecoderLayer(
                p.d_model, p.nhead, p.dim_feedforward, p.activation,
                attn_impl=p.attn_impl, dtype=dt, name=f"decoder_{i}",
            )(h, memory)
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="decoder_norm")(h)

        t_rep = jnp.repeat(t_feats[:, None, :], h.shape[1], axis=1)
        head_in = jnp.concatenate([t_rep, h], axis=-1)
        v = nn.Dense(p.dim_feedforward, dtype=dt, name="head_0")(head_in)
        v = nn.silu(v)
        v = nn.Dense(1, dtype=dt, name="head_1")(v)
        return v[..., 0].astype(jnp.float32)


def ParallelTransformer(param: dict) -> ParallelTransformerNet:
    """Config-surface factory (``_target_: nn.cfm.transformer_cfm.ParallelTransformer``)."""
    return ParallelTransformerNet(cfg=EnergyTransformerParams.create(param))
