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

import jax
import jax.numpy as jnp

from vit4hep_tpu.models.cfm import CFM
from vit4hep_tpu.models.cinn import CINN
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

    def token_shape(self, batch_size: int) -> tuple:
        t = int(math.prod(self.num_patches))
        p = int(math.prod(self.patch_shape)) * self.in_channels
        return (batch_size, t, p)


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

    def token_shape(self, batch_size: int) -> tuple:
        return (batch_size, self.patcher.total_patches, self.patcher.patch_dim)

    def to_patches(self, x):
        return self.patcher.to_patches(x)

    def from_patches(self, x):
        return self.patcher.from_patches(x)


# ---------------------------------------------------------------------------
# cINN models (reference experiments/calochallenge/calochallenge_cinn/model.py)
# ---------------------------------------------------------------------------
def _build_flow(coupling_block, nblocks, block_ctor, permute_sizes_axes, seed=0,
                permutations=None):
    """Assemble [coupling, permute] x nblocks into a FlowChain (the GraphINN
    replacement; reference model.py:100-127 + freia_utils.py:31-43).

    ``permutations`` (list of per-block index lists) overrides the
    seed-derived permutations — set by the torch-checkpoint migration so a
    reference run dir reproduces its exact flow."""
    from vit4hep_tpu.models.bijectors import FlowChain, Permute

    if permutations is not None and len(permutations) != nblocks:
        raise ValueError(
            f"{len(permutations)} explicit permutations for {nblocks} blocks"
        )
    blocks = []
    for i in range(nblocks):
        blocks.append(block_ctor(i))
        size, axis = permute_sizes_axes[i]
        idx = tuple(int(j) for j in permutations[i]) if permutations is not None else None
        blocks.append(Permute(size=size, axis=axis, seed=seed + i, indices=idx))
    return FlowChain(blocks=tuple(blocks))


class CaloChallengeCINN(CINN):
    """Shape cINN over patched voxel grids (reference model.py:17-133).

    Config surface: coupling_block name, nblocks, is_spatial list,
    cinn_kwargs (spline), vit_kwargs (ViT1D subnets).
    """

    def __init__(
        self,
        shape,
        patch_shape,
        in_channels,
        coupling_block,
        nblocks,
        is_spatial,
        cinn_kwargs,
        vit_kwargs,
        permutations=None,
        **kwargs,
    ):
        super().__init__(shape, **kwargs)
        from vit4hep_tpu.models.bijectors import (
            BinnedRQSCouplingBlock,
            NFlowsRQSCouplingBlock,
        )
        from vit4hep_tpu.models.vit import ViT1D

        self.patch_shape = tuple(int(p) for p in (patch_shape[0] if isinstance(patch_shape[0], (list, tuple)) else patch_shape))
        patching.check_divisible(self.shape, self.patch_shape)
        self.num_patches = tuple(s // p for s, p in zip(self.shape, self.patch_shape))
        self.in_channels = int(in_channels)
        self.condition_dim = int(vit_kwargs.get("condition_dim", 1))

        T = int(math.prod(self.num_patches))
        P = int(math.prod(self.patch_shape))
        cinn_kwargs = dict(cinn_kwargs or {})
        vit_kwargs = dict(vit_kwargs)

        def assemble(vkw):
            def make_subnet(spatial):
                def ctor(n_params):
                    # ViT1D emits out_channels * x_out * patch_dim per token
                    # (freia_utils.py:46-86): x_out = params per scalar.
                    kw = dict(vkw)
                    kw.update(
                        x_out=n_params,
                        patch_dim=P // 2 if spatial else P,
                        num_patches=[list(self.num_patches)],
                        prod_num_patches=T if spatial else T // 2,
                    )
                    return ViT1D(kw)

                return ctor

            def block_ctor(i):
                spatial = bool(is_spatial[i]) if is_spatial is not None else False
                if coupling_block == "CaloRQSplineFrEIA":
                    kw = dict(cinn_kwargs)
                    kw.setdefault("bins", 10)
                    return BinnedRQSCouplingBlock(
                        subnet_ctor=make_subnet(spatial),
                        spatial=spatial,
                        **kw,
                    )
                if coupling_block in ("CaloRQSplineNFlows", "OneSidedCaloRQSplineNFlows"):
                    return NFlowsRQSCouplingBlock(
                        subnet_ctor=make_subnet(spatial),
                        spatial=spatial,
                        one_sided=coupling_block.startswith("OneSided"),
                        **cinn_kwargs,
                    )
                raise ValueError(f"Unknown Coupling block type {coupling_block}")

            # PermuteRandom acts on tokens (axis 1); PermuteRandomS1 on
            # features (axis 2) for spatial blocks (freia_utils.py:31-43).
            permutes = [
                ((P, 2) if (is_spatial is not None and is_spatial[i]) else (T, 1))
                for i in range(int(nblocks))
            ]
            return _build_flow(coupling_block, int(nblocks), block_ctor,
                               permutes, permutations=permutations)

        self.net = assemble(vit_kwargs)
        if vit_kwargs.get("fused_block") == "sample":
            # identical flow (same seed-derived permutations, same param
            # tree) with the DiT-block-stack megakernel enabled in the
            # subnets; used only for the inverse/sampling direction
            self.sample_net = assemble(dict(vit_kwargs, fused_block=True))

    def x_shape(self, batch_size):
        return (batch_size, self.in_channels, *self.shape)

    def to_patches(self, x):
        return patching.to_patches(x, self.patch_shape)

    def from_patches(self, x):
        return patching.from_patches(x, self.num_patches, self.patch_shape)


class CaloChallengeEnergyCINN(CINN):
    """Energy cINN over the flat u-vector (reference model.py:136-205)."""

    def __init__(self, shape, coupling_block, nblocks, cinn_kwargs, subnet_kwargs,
                 permutations=None, **kwargs):
        super().__init__(shape, **kwargs)
        from vit4hep_tpu.models.bijectors import SimpleRQSCouplingBlock

        d = self.shape[0]
        self.in_channels = 1
        self.condition_dim = 1
        cinn_kwargs = dict(cinn_kwargs or {})
        sub = dict(subnet_kwargs or {})
        subnet_kw = dict(
            hidden_channels=tuple(sub.get("hidden_channels", (128, 128))),
            n_layers=int(sub.get("n_layers", 2)),
            dropout=float(sub.get("dropout", 0.0)),
        )

        def block_ctor(i):
            if coupling_block != "RQSplineNFlows":
                raise ValueError(f"Unknown Coupling block type {coupling_block}")
            return SimpleRQSCouplingBlock(
                dims_in=d,
                num_bins=int(cinn_kwargs.get("num_bins", 10)),
                bounds_init=float(cinn_kwargs.get("bounds_init", 1.0)),
                subnet_kwargs=subnet_kw,
            )

        permutes = [(d, 1)] * int(nblocks)
        self.net = _build_flow(coupling_block, int(nblocks), block_ctor, permutes,
                               permutations=permutations)

    def x_shape(self, batch_size):
        return (batch_size, *self.shape)

