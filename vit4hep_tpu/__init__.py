"""vit4hep-tpu: TPU-native (JAX/XLA/Pallas/pjit) generative calorimeter-shower framework.

A from-scratch re-design of the capabilities of VisionTransformers4HEP
(luigifvr/vit4hep): Conditional Flow Matching and conditional INN generative
models for calorimeter shower simulation (CaloChallenge ds1/ds2/ds3, CaloGAN,
LEMURS, CaloHadronic), built TPU-first.
"""

__version__ = "0.1.0"
