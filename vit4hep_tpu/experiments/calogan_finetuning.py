"""CaloGAN fine-tuning experiment (reference
experiments/calogan/experiment_finetuning.py:14-200): identical backbone-swap
and embedder-surgery lifecycle as the CaloChallenge variant, on the CaloGAN
data pipeline."""

from __future__ import annotations

from vit4hep_tpu.experiments.calochallenge_finetuning import FTMixin
from vit4hep_tpu.experiments.calogan import CaloGAN


class CaloGANFTCFM(FTMixin, CaloGAN):
    pass
