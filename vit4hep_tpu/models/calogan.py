"""CaloGAN shape model: CFM over three calorimeter sections with per-section
patch shapes (reference `/root/reference/experiments/calogan/model.py:8-121`).

The three layers (1x96x3, 1x12x12, 1x6x12 grids stored flat as 288/144/72
voxels) are patched section-by-section into one token sequence via
MultiSectionPatcher (vit4hep_tpu/ops/patching.py); loss and the lax.scan RK4
sampler come from the CFM base.
"""

from __future__ import annotations

from vit4hep_tpu.models.cfm import CFM
from vit4hep_tpu.ops import patching


class CaloGANCFM(CFM):
    def __init__(
        self,
        net,
        list_shape,
        list_edges,
        list_patch_shape,
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
            shape if shape is not None else [total],
            time_distribution,
            trajectory,
            odeint_kwargs,
            **kwargs,
        )
        self.in_channels = int(in_channels)
        self.patcher = patching.MultiSectionPatcher(
            list_shape, list_edges, list_patch_shape, self.in_channels
        )
        self.flat_voxels = total

    def x_shape(self, batch_size: int) -> tuple:
        return (batch_size, self.in_channels, self.flat_voxels)

    def to_patches(self, x):
        return self.patcher.to_patches(x)

    def from_patches(self, x):
        return self.patcher.from_patches(x)

    def _net_args(self, x, t, c):
        return (self.to_patches(x), t, c)

    def _net_out(self, z, x_shape):
        return self.from_patches(z)

    def token_shape(self, batch_size: int) -> tuple:
        return (batch_size, self.patcher.total_patches, self.patcher.patch_dim)
