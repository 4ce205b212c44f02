"""LEMURS shape model (reference `/root/reference/experiments/lemurs/model.py:8-99`).

Identical patching to CaloChallengeCFM; the only difference is the data
layout: LEMURS batches arrive as (B, H, W, L) and are permuted to the
CaloChallenge (B, 1, L, W, H) convention inside the loss (reference :62-65).
"""

from __future__ import annotations

import jax.numpy as jnp

from vit4hep_tpu.models.calochallenge import CaloChallengeCFM


class LEMURSCFM(CaloChallengeCFM):
    def batch_loss(self, params, x, c, rng):
        # (B, H, W, L) -> (B, 1, L, W, H): layers to the leading voxel axis,
        # plus the channel axis (reference model.py:62-65)
        x = jnp.transpose(x, (0, 3, 2, 1))[:, None]
        return super().batch_loss(params, x, c, rng)
