"""CaloHadronic shape model: CFM over the joint ECal+HCal shower
(reference `/root/reference/experiments/calohadronic/model.py:8-120`).

Two sections — ECal 10x15x15 (2250 voxels) and HCal 48x30x30 (43200 voxels) —
concatenated on the flat voxel axis and patched per-section into one token
sequence (``list_edges: [2250, 43200]``), sharing the MultiSectionPatcher with
CaloGAN/ds1.
"""

from __future__ import annotations

from vit4hep_tpu.models.calogan import CaloGANCFM


class CaloHadCFM(CaloGANCFM):
    """Identical multi-section patching contract as CaloGANCFM; kept as its
    own class for config-surface parity (``_target_`` name)."""
