"""CaloChallenge shape models: CFM over patched 3-D voxel grids.

TPU-native counterparts of the reference patching models
(`/root/reference/experiments/calochallenge/calochallenge_cfm/model.py`):
- ``CaloChallengeCFM``  — single-section (L, A, R) grid (ds2/ds3),
- ``CaloChallengeCFM_DS1`` — multi-section irregular geometry (ds1's 5 sections).

Patching is in vit4hep_tpu/ops/patching.py; loss and the scan-based sampler are
inherited from vit4hep_tpu/models/cfm.py. The cINN counterparts live in
vit4hep_tpu/models/cinn.py.
"""

from __future__ import annotations

import dataclasses
import math

from vit4hep_tpu.models.cfm import CFM
from vit4hep_tpu.ops import patching


class CaloChallengeCFM(CFM):
    """CFM over (B, C, L, A, R) voxel grids, tokenized by 3-D patches."""

    def __init__(
        self,
        net,
        patch_shape,
        shape,
        in_channels=1,
        time_distribution="uniform",
        trajectory="linear",
        odeint_kwargs=None,
        **kwargs,
    ):
        super().__init__(
            net, shape, time_distribution, trajectory, odeint_kwargs, **kwargs
        )
        self.patch_shape = tuple(int(p) for p in patch_shape)
        self.in_channels = int(in_channels)
        patching.check_divisible(self.shape, self.patch_shape)
        self.num_patches = tuple(
            s // p for s, p in zip(self.shape, self.patch_shape)
        )

    def x_shape(self, batch_size: int) -> tuple:
        return (batch_size, self.in_channels, *self.shape)

    def to_patches(self, x):
        return patching.to_patches(x, self.patch_shape)

    def from_patches(self, x):
        return patching.from_patches(x, self.num_patches, self.patch_shape)

    def _net_args(self, x, t, c):
        return (self.to_patches(x), t, c)

    def _net_out(self, z, x_shape):
        return self.from_patches(z)


class CaloChallengeCFM_DS1(CaloChallengeCFM):
    """Multi-section patching for irregular geometries (reference model.py:97-173).

    The input is (B, C, sum(list_edges)) — sections concatenated on a flat voxel
    axis; each section is reshaped to its own 3-D grid, patched with the shared
    ``patch_shape``, and the token sequences are concatenated. The net's
    positional meshgrid is rebuilt for the per-section patch grids (the reference
    sets ``net.num_patches`` after construction; Flax modules are immutable so we
    rebuild the module with an updated config).
    """

    def __init__(
        self,
        net,
        list_shape,
        list_edges,
        patch_shape,
        shape=None,
        in_channels=1,
        time_distribution="uniform",
        trajectory="linear",
        odeint_kwargs=None,
        **kwargs,
    ):
        total = sum(int(e) for e in list_edges)
        super().__init__(
            net,
            patch_shape,
            shape if shape is not None else [total],
            in_channels,
            time_distribution,
            trajectory,
            odeint_kwargs,
            **kwargs,
        )
        self.patcher = patching.MultiSectionPatcher(
            list_shape, list_edges, self.patch_shape, in_channels
        )
        sections = tuple(self.patcher.num_patches_per_dim)
        self.net = dataclasses.replace(
            net, cfg=dataclasses.replace(net.cfg, num_patches=sections)
        )
        self.flat_voxels = total

    def x_shape(self, batch_size: int) -> tuple:
        return (batch_size, self.in_channels, self.flat_voxels)

    def to_patches(self, x):
        return self.patcher.to_patches(x)

    def from_patches(self, x):
        return self.patcher.from_patches(x)
