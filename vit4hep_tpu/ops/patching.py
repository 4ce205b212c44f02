"""Voxel-grid <-> patch-token conversions.

All layouts produced by the reference patching models are supported:
- single-section 3-D grids (reference experiments/calochallenge/calochallenge_cfm/
  model.py:40-60),
- multi-section grids with a shared patch shape (ds1,
  model.py:97-173; CaloHadronic experiments/calohadronic/model.py),
- multi-section grids with *per-section* patch shapes (CaloGAN,
  experiments/calogan/model.py).

These are pure reshape/transpose ops; XLA compiles them to layout changes that
fuse with the surrounding matmuls, so no Pallas kernel is needed here.
"""

from __future__ import annotations

import math

from einops import rearrange


def to_patches(x, patch_shape):
    """(B, C, L, A, R) -> (B, T, patch_dim) with T=(L/p1)(A/p2)(R/p3),
    patch_dim = p1*p2*p3*C."""
    p1, p2, p3 = patch_shape
    return rearrange(x, "b c (l p1) (a p2) (r p3) -> b (l a r) (p1 p2 p3 c)", p1=p1, p2=p2, p3=p3)


def from_patches(x, num_patches, patch_shape):
    """(B, T, patch_dim) -> (B, C, L, A, R)."""
    l, a, r = num_patches
    p1, p2, p3 = patch_shape
    return rearrange(
        x,
        "b (l a r) (p1 p2 p3 c) -> b c (l p1) (a p2) (r p3)",
        l=l, a=a, r=r, p1=p1, p2=p2, p3=p3,
    )


def check_divisible(shape, patch_shape):
    for i, (s, p) in enumerate(zip(shape, patch_shape)):
        if s % p != 0:
            raise AssertionError(
                f"Input size ({s}) should be divisible by patch size ({p}) in axis {i}."
            )


# ---------------------------------------------------------------------------
# multi-section geometries
# ---------------------------------------------------------------------------
class MultiSectionPatcher:
    """Patching over a calorimeter made of several (L, A, R) sections that are
    stored concatenated along a flat voxel axis.

    Parameters
    ----------
    list_shape : per-section 3-D voxel shapes [(L, A, R), ...]
    list_edges : per-section flat voxel counts (L*A*R each) used to split the
        concatenated input
    patch_shapes : either one patch shape shared by all sections, or one per
        section (CaloGAN's ``list_patch_shape``)
    in_channels : channel count C of the voxel tensor
    """

    def __init__(self, list_shape, list_edges, patch_shapes, in_channels=1):
        self.list_shape = [tuple(s) for s in list_shape]
        self.list_edges = [int(e) for e in list_edges]
        if isinstance(patch_shapes[0], (int,)):
            patch_shapes = [tuple(patch_shapes)] * len(self.list_shape)
        self.patch_shapes = [tuple(p) for p in patch_shapes]
        self.in_channels = in_channels

        self.num_patches_per_dim = []
        self.num_patches_per_section = []
        self.patch_dims = []
        for shape, pshape in zip(self.list_shape, self.patch_shapes):
            check_divisible(shape, pshape)
            npd = tuple(s // p for s, p in zip(shape, pshape))
            self.num_patches_per_dim.append(npd)
            self.num_patches_per_section.append(math.prod(npd))
            self.patch_dims.append(math.prod(pshape) * in_channels)
        if len(set(self.patch_dims)) != 1:
            raise AssertionError(
                f"All sections must share one patch_dim, got {self.patch_dims}"
            )
        self.patch_dim = self.patch_dims[0]
        self.total_patches = sum(self.num_patches_per_section)

    def to_patches(self, x):
        """(B, C, sum(edges)) -> (B, total_patches, patch_dim)."""
        out, start = [], 0
        for shape, pshape, edge in zip(self.list_shape, self.patch_shapes, self.list_edges):
            sec = x[:, :, start : start + edge].reshape(-1, self.in_channels, *shape)
            out.append(to_patches(sec, pshape))
            start += edge
        import jax.numpy as jnp

        return jnp.concatenate(out, axis=1)

    def from_patches(self, x):
        """(B, total_patches, patch_dim) -> (B, C, sum(edges))."""
        import jax.numpy as jnp

        out, start = [], 0
        for npd, pshape, n_sec in zip(
            self.num_patches_per_dim, self.patch_shapes, self.num_patches_per_section
        ):
            sec = from_patches(x[:, start : start + n_sec], npd, pshape)
            out.append(sec.reshape(sec.shape[0], self.in_channels, -1))
            start += n_sec
        return jnp.concatenate(out, axis=2)
