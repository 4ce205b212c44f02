"""Launcher: compose the config, dispatch on exp_type, run the experiment.

TPU-native counterpart of the reference ``main.py``: no per-GPU process spawn
and no NCCL process-group lifecycle — XLA owns all local devices and every
jitted program is SPMD-partitioned over the mesh. For multi-host TPU slices,
set ``distributed=true`` to call ``jax.distributed.initialize()`` (same code
path; the runtime routes collectives over ICI/DCN).

Usage (same CLI surface as the reference, minus hydra internals):
    python main.py -cn calochallenge/cfm/calochallenge_ds2 exp_name=my_exp
    python main.py -cp runs/MyExp/run_00001 -cn config warm_start_idx=0
"""

from __future__ import annotations

import os
import sys

if os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin overrides JAX_PLATFORMS from the environment;
    # re-assert it so `JAX_PLATFORMS=cpu python main.py ...` really runs on
    # CPU (e.g. the synthetic-data verification drive) instead of silently
    # grabbing the TPU tunnel
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from vit4hep_tpu.utils.config import compose_from_cli
from vit4hep_tpu.utils.logger import LOGGER


def get_experiment(exp_type: str):
    # dispatch strings match the reference launcher (main.py:27-68); the
    # "cmshgcal" branch there points at a module that does not exist in the
    # reference either (SURVEY.md L1 note) and is intentionally not dispatched.
    if exp_type == "calochallenge":
        from vit4hep_tpu.experiments.calochallenge import CaloChallenge

        return CaloChallenge
    if exp_type == "calochallenge_ft_cfm":
        from vit4hep_tpu.experiments.calochallenge_finetuning import CaloChallengeFTCFM

        return CaloChallengeFTCFM
    if exp_type == "calochallenge_ft_lem_cfm":
        from vit4hep_tpu.experiments.calochallenge_finetuning import CaloChallengeFT_fromLEM

        return CaloChallengeFT_fromLEM
    if exp_type == "calogan":
        from vit4hep_tpu.experiments.calogan import CaloGAN

        return CaloGAN
    if exp_type == "calogan_ft_cfm":
        from vit4hep_tpu.experiments.calogan_finetuning import CaloGANFTCFM

        return CaloGANFTCFM
    if exp_type == "lemurs":
        from vit4hep_tpu.experiments.lemurs import LEMURS

        return LEMURS
    if exp_type == "calohadronic":
        from vit4hep_tpu.experiments.calohadronic import CaloHadronic

        return CaloHadronic
    if exp_type == "calohadronic_ft":
        from vit4hep_tpu.experiments.calohadronic_finetuning import CaloHadronicFT

        return CaloHadronicFT
    raise ValueError(f"exp_type {exp_type} not implemented")


def main(argv=None):
    cfg = compose_from_cli(sys.argv[1:] if argv is None else argv)

    if cfg.get("use_float64", False):
        import jax

        jax.config.update("jax_enable_x64", True)

    rank, world_size = 0, 1
    if cfg.get("distributed", False):
        import jax

        # coordination from explicit env — JAX names first, then the
        # torchrun/DDP names the reference's launch scripts use
        # (MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK, reference main.py:9-26);
        # with neither set, fall back to jax's cluster autodetection
        # (SLURM / TPU pod metadata)
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coord is None and os.environ.get("MASTER_ADDR"):
            coord = (f"{os.environ['MASTER_ADDR']}:"
                     f"{os.environ.get('MASTER_PORT', '1234')}")
        nproc = os.environ.get("JAX_NUM_PROCESSES", os.environ.get("WORLD_SIZE"))
        pid = os.environ.get("JAX_PROCESS_ID", os.environ.get("RANK"))
        if coord and nproc is not None and pid is not None:
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=int(nproc),
                                       process_id=int(pid))
        else:
            jax.distributed.initialize()
        rank, world_size = jax.process_index(), jax.process_count()

    exp_cls = get_experiment(cfg.exp_type)
    experiment = exp_cls(cfg, rank=rank, world_size=world_size)
    experiment()
    LOGGER.info("Run finished")


if __name__ == "__main__":
    main()
