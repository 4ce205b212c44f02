"""Positional/timestep embeddings for the DiT-style backbone.

Pure-jnp re-implementations of the embedding formulas defined by the reference
ViT (`/root/reference/nn/vit.py:137-162, 354-394, 461-540`) and the energy
transformer (`nn/cfm/transformer_cfm.py:154-165`). The static grids are computed
with numpy at model-construction time (they are constants folded into the XLA
program); only the learnable-frequency products run on device.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# multi-section (L, A, R) meshgrid — reference nn/vit.py:137-154
# ---------------------------------------------------------------------------
def create_meshgrid(num_patches: tuple[tuple[int, int, int], ...]):
    """Concatenated per-section grids; the layer (L) grid is normalized over the
    *total* layer count across sections so irregular geometries (e.g. ds1's five
    sections) embed on one continuous depth axis.

    Returns (pos_z, pos_y, pos_x) flat numpy arrays of length sum(L_i*A_i*R_i).
    """
    sum_l = sum(sec[0] for sec in num_patches)
    sum_lgrid = np.arange(sum_l) / sum_l
    pos_z, pos_y, pos_x = [], [], []
    offset = 0
    for sec in num_patches:
        L, A, R = sec
        lgrid = sum_lgrid[offset : offset + L]
        offset += L
        agrid = np.arange(A) / A
        rgrid = np.arange(R) / R
        z, y, x = np.meshgrid(lgrid, agrid, rgrid, indexing="ij")
        pos_z.append(z.ravel())
        pos_y.append(y.ravel())
        pos_x.append(x.ravel())
    return (
        np.concatenate(pos_z).astype(np.float32),
        np.concatenate(pos_y).astype(np.float32),
        np.concatenate(pos_x).astype(np.float32),
    )


def learnable_fourier_pos_embed_3d(freqs, pos_z, pos_y, pos_x):
    """pe = [sin(xw), cos(xw), sin(yw), cos(yw), sin(zw), cos(zw)]  (T, 6*|freqs|).

    `freqs` is the learnable parameter (hidden//6 frequencies), reference
    nn/vit.py:156-162.
    """
    w = freqs * (2.0 * math.pi)
    z = pos_z[:, None] * w[None, :]
    y = pos_y[:, None] * w[None, :]
    x = pos_x[:, None] * w[None, :]
    return jnp.concatenate(
        (jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y), jnp.sin(z), jnp.cos(z)), axis=1
    )


def learnable_fourier_pos_embed_1d(freqs, grid):
    """1-D variant used by ViT1D (reference nn/vit.py:275-279): (T, 2*|freqs|)."""
    w = freqs * (2.0 * math.pi)
    pos = grid[:, None] * w[None, :]
    return jnp.concatenate((jnp.sin(pos), jnp.cos(pos)), axis=1)


# ---------------------------------------------------------------------------
# fixed sin-cos embeddings — reference nn/vit.py:461-540
# ---------------------------------------------------------------------------
def get_sincos_pos_embed(pos_embedding_coords, num_patches, hidden_dim, dim, temperature=10000):
    if pos_embedding_coords == "cylindrical" and dim == 3:
        return get_3d_cylindrical_sincos_pos_embed(num_patches, hidden_dim, temperature)
    if pos_embedding_coords == "cartesian" and dim == 3:
        return get_3d_cartesian_sincos_pos_embed(num_patches, hidden_dim, temperature)
    if dim == 1:
        return get_1d_sincos_pos_embed(num_patches, hidden_dim, temperature)
    raise ValueError(f"No sincos embedding for coords={pos_embedding_coords}, dim={dim}")


def get_1d_sincos_pos_embed(num_patches, dim, temperature=10000):
    # NB the reference halves the token count here (nn/vit.py:478) — kept as-is.
    prod_patches = int(math.prod(np.asarray(num_patches).ravel()) / 2)
    x = np.arange(prod_patches) / prod_patches

    fourier_dim = dim // 2
    if fourier_dim < 2:
        # omega's normalization divides by fourier_dim - 1; the reference
        # would emit NaN embeddings here — fail loudly instead
        raise ValueError(f"hidden_dim {dim} too small for a 1-D sincos embedding")
    omega = np.arange(fourier_dim) / (fourier_dim - 1)
    omega = 1.0 / (temperature**omega)
    args = x[:, None] * omega[None, :]
    return np.concatenate((np.sin(args), np.cos(args)), axis=1).astype(np.float32)


def get_3d_cylindrical_sincos_pos_embed(num_patches, dim, temperature=10000):
    L, A, R = num_patches
    z, y, x = np.meshgrid(
        np.arange(L) / L, np.arange(A) / A, np.arange(R) / R, indexing="ij"
    )
    return _sincos_3d(z, y, x, dim, temperature)


def get_3d_cartesian_sincos_pos_embed(num_patches, dim, temperature=10000):
    """Polar (depth, angle, radius) -> cartesian (depth, y, x) before embedding."""
    L, A, R = num_patches
    z, alpha, r = np.meshgrid(
        np.arange(L) / L, np.arange(A) * (2 * math.pi / A), np.arange(R) / R, indexing="ij"
    )
    x = r * np.cos(alpha)
    y = r * np.sin(alpha)
    return _sincos_3d(z, y, x, dim, temperature)


def _sincos_3d(z, y, x, dim, temperature):
    fourier_dim = dim // 6
    if fourier_dim < 2:
        raise ValueError(f"hidden_dim {dim} too small for a 3-D sincos embedding")
    omega = np.arange(fourier_dim) / (fourier_dim - 1)
    omega = 1.0 / (temperature**omega)
    z = z.ravel()[:, None] * omega[None, :]
    y = y.ravel()[:, None] * omega[None, :]
    x = x.ravel()[:, None] * omega[None, :]
    return np.concatenate(
        (np.sin(x), np.cos(x), np.sin(y), np.cos(y), np.sin(z), np.cos(z)), axis=1
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# timestep embeddings
# ---------------------------------------------------------------------------
def timestep_embedding(t, dim, max_period=10000):
    """Sinusoidal timestep embedding, cos-first ordering as in the reference
    (nn/vit.py:368-389). t: (B,) or (B,1) -> (B, dim)."""
    t = t.reshape(t.shape[0], -1)[:, :1]
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def gaussian_fourier_projection(t, weights):
    """Fixed random-feature time encoding (nn/cfm/transformer_cfm.py:154-165).

    t: (B, 1), weights: (embed_dim // 2,) -> (B, embed_dim), sin-first ordering.
    """
    x_proj = t * weights[None, :] * (2.0 * math.pi)
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def layer_causal_mask(num_patches: tuple[int, int, int]) -> np.ndarray:
    """Boolean (T, T) mask: token q may attend to token k iff k's calorimeter
    layer index <= q's (reference nn/vit.py:105-113)."""
    L, A, R = num_patches
    idx = np.arange(L * A * R)
    return (idx[:, None] // (A * R)) >= (idx[None, :] // (A * R))
