"""CaloHadronic fine-tuning from a LEMURS backbone (reference
experiments/calohadronic/experiment_finetuning.py:18-314): backbone-swap +
embedder surgery via FTMixin; the fixed LEMURS conditions (theta, phi, label)
are appended by the AddLEMURSConditions transform in the data pipeline and by
sample_n (gen_theta/gen_phi/gen_label config keys)."""

from __future__ import annotations

from vit4hep_tpu.experiments.calochallenge_finetuning import FTMixin
from vit4hep_tpu.experiments.calohadronic import CaloHadronic


class CaloHadronicFT(FTMixin, CaloHadronic):
    pass
