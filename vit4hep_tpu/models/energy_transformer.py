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
    # decoder megakernel (ops/fused_energy_decoder.py): False = composed,
    # True = always, "sample" = sampling twin only (the CFM sample_net
    # mechanism, same semantics as the ViT flag). Param tree is unchanged.
    fused_block: Any = False
    # batch elements per kernel grid cell (block-diagonal attention group)
    fused_group: int = 16

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


class _DenseP(nn.Module):
    """Parameter-only stand-in for nn.Dense (flax default inits), used by the
    fused decoder path so checkpoints stay interchangeable."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout))
        b = self.param("bias", nn.initializers.zeros, (self.dout,))
        return k, b


class _LNP(nn.Module):
    """Parameter-only stand-in for nn.LayerNorm (scale + bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _MHAParams(nn.Module):
    """Parameter-only stand-in for _MHA (q/k/v/out projections)."""

    d_model: int

    @nn.compact
    def __call__(self):
        wq, bq = _DenseP(self.d_model, self.d_model, name="q_proj")()
        wk, bk = _DenseP(self.d_model, self.d_model, name="k_proj")()
        wv, bv = _DenseP(self.d_model, self.d_model, name="v_proj")()
        wo, bo = _DenseP(self.d_model, self.d_model, name="out_proj")()
        return (wq, bq, wk, bk, wv, bv, wo, bo)


class _FFParams(nn.Module):
    """Parameter-only stand-in for _FeedForward (Dense_0 / Dense_1)."""

    d_model: int
    dim_feedforward: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseP(self.d_model, self.dim_feedforward, name="Dense_0")()
        w2, b2 = _DenseP(self.dim_feedforward, self.d_model, name="Dense_1")()
        return w1, b1, w2, b2


class _DecoderLayerParams(nn.Module):
    """Parameter-only stand-in for _DecoderLayer: declares the exact same
    param tree (self_attn, cross_attn, _FeedForward_0, LayerNorm_0/1/2) and
    returns the weights the fused decoder kernel consumes. The cross-attn
    q_proj/k_proj are declared for checkpoint parity but mathematically dead
    in the forward whenever the encoder memory is a single token (softmax
    over one key == 1; see ops/fused_energy_decoder.py)."""

    d_model: int
    dim_feedforward: int

    @nn.compact
    def __call__(self):
        sa = _MHAParams(self.d_model, name="self_attn")()
        ln0 = _LNP(self.d_model, name="LayerNorm_0")()
        ca = _MHAParams(self.d_model, name="cross_attn")()
        ln1 = _LNP(self.d_model, name="LayerNorm_1")()
        ff = _FFParams(self.d_model, self.dim_feedforward,
                       name="_FeedForward_0")()
        ln2 = _LNP(self.d_model, name="LayerNorm_2")()
        return sa, ca, ff, (ln0, ln1, ln2)


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

        # decoder megakernel: valid whenever the cross-attention memory
        # collapses to one effective token — a 1-token encoder (dims_c == 1)
        # or the all-identical zero memory of the unconditional branch
        # (softmax over identical keys is uniform; context == v of any token)
        if p.fused_block is True and (condition is None or p.dims_c == 1):
            return self._fused_decoder(tgt, t_feats, memory)

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

    def _fused_decoder(self, tgt, t_feats, memory):
        """Decoder stack + final LN + head as one Pallas kernel per batch
        group (ops/fused_energy_decoder.py). Param tree identical to the
        composed modules, so checkpoints and the `fused_block: sample` twin
        are interchangeable."""
        from vit4hep_tpu.ops.fused_energy_decoder import fused_energy_decoder

        p = self.cfg
        dm = p.d_model
        m0 = memory[:, 0, :].astype(jnp.float32)  # (B, D): the one token

        sas, lns_s, lns_b, crosses = [], [], [], []
        w1s, b1s, w2s, b2s = [], [], [], []
        for i in range(p.num_decoder_layers):
            sa, ca, ff, (ln0, ln1, ln2) = _DecoderLayerParams(
                dm, p.dim_feedforward, name=f"decoder_{i}"
            )()
            wq, bq, wk, bk, wv, bv, wo, bo = sa
            sas.append((jnp.concatenate([wq, wk, wv], axis=1),
                        jnp.concatenate([bq, bk, bv]), wo, bo))
            _, _, _, _, wv_c, bv_c, wo_c, bo_c = ca
            # cross-attention output per element: out_proj(v_proj(memory))
            # (t-independent => XLA hoists it out of the ODE sampling scan)
            crosses.append((m0 @ wv_c + bv_c) @ wo_c + bo_c)
            w1, b1, w2, b2 = ff
            w1s.append(w1); b1s.append(b1); w2s.append(w2); b2s.append(b2)
            lns_s.append(jnp.stack([ln0[0], ln1[0], ln2[0]]))
            lns_b.append(jnp.stack([ln0[1], ln1[1], ln2[1]]))
        fs, fb = _LNP(dm, name="decoder_norm")()
        hw0, hb0 = _DenseP(p.encode_t_dim + dm, p.dim_feedforward,
                           name="head_0")()
        hw1, hb1 = _DenseP(p.dim_feedforward, 1, name="head_1")()

        out = fused_energy_decoder(
            tgt.astype(jnp.float32), t_feats.astype(jnp.float32),
            jnp.stack(crosses, axis=1),
            jnp.stack(lns_s), jnp.stack(lns_b),
            jnp.stack([s[0] for s in sas]), jnp.stack([s[1] for s in sas]),
            jnp.stack([s[2] for s in sas]), jnp.stack([s[3] for s in sas]),
            jnp.stack(w1s), jnp.stack(b1s), jnp.stack(w2s), jnp.stack(b2s),
            fs, fb, hw0, hb0, hw1, hb1,
            p.nhead, p.activation, p.fused_group,
        )
        return out.astype(jnp.float32)


def ParallelTransformer(param: dict) -> ParallelTransformerNet:
    """Config-surface factory (``_target_: nn.cfm.transformer_cfm.ParallelTransformer``)."""
    return ParallelTransformerNet(cfg=EnergyTransformerParams.create(param))
