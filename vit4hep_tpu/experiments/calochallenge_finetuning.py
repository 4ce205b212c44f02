"""Cross-dataset fine-tuning experiments (reference
experiments/calochallenge/calochallenge_cfm/experiment_finetuning.py).

``CaloChallengeFTCFM`` swaps the target config's net for the backbone's
architecture, loads the pretrained weights, performs the embedder surgery
(vit4hep_tpu/models/finetuning.py) and trains with a 3-group optimizer.
``CaloChallengeFT_fromLEM`` additionally appends the LEMURS conditions
(theta, phi, one-hot detector label) at sampling time.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from vit4hep_tpu.experiments import train_state as ts
from vit4hep_tpu.experiments.calochallenge import CaloChallenge
from vit4hep_tpu.models import finetuning as ft
from vit4hep_tpu.utils.checkpoint import load_checkpoint
from vit4hep_tpu.utils.torch_migration import maybe_convert_net_checkpoint
from vit4hep_tpu.utils.config import OmegaConf, instantiate
from vit4hep_tpu.utils.logger import LOGGER


class FTMixin:
    """Shared fine-tuning lifecycle: backbone-config swap, param transfer,
    3-group optimizer. Mixed into the per-dataset experiment classes
    (CaloChallengeFTCFM, CaloGANFTCFM, CaloHadronicFT)."""

    def __init__(self, cfg, rank=0, world_size=1):
        super().__init__(cfg, rank, world_size)
        self.backbone_cfg = OmegaConf.load(str(self.cfg.finetuning.backbone_cfg))
        # remember the TARGET geometry before swapping in the backbone net
        # (reference experiment_finetuning.py:29-34)
        self.target_param = dict(
            num_patches=self.cfg.model.net.param.num_patches,
            patch_dim=int(self.cfg.model.net.param.patch_dim),
            condition_dim=int(self.cfg.model.net.param.condition_dim),
        )

    def init_model(self):
        # instantiate the TARGET model but with the fine-tune net: backbone
        # architecture + target geometry + optional mapper layers
        from vit4hep_tpu.models.vit import ViTNet

        backbone_param = dict(self.backbone_cfg.model.net.param.to_container(resolve=True))
        net_cfg = ft.build_ft_vit_params(backbone_param, self.target_param, self.cfg.finetuning)
        self.model = instantiate(self.cfg.model, net=ViTNet(cfg=net_cfg))

        key_init, self.base_key = jax.random.split(self.base_key)
        params = self.model.init_params(key_init)

        if not self.warm_start:
            model_path = os.path.join(
                str(self.backbone_cfg.run_dir), "models",
                f"model_run{self.backbone_cfg.run_idx}",
            )
            LOGGER.info(f"Loading pretrained model from {model_path}")
            converted = maybe_convert_net_checkpoint(self.backbone_cfg.model, model_path)
            if converted is not None:
                LOGGER.info("Backbone is a reference torch checkpoint — migrated")
                backbone_params = converted  # already the net's variable dict
            else:
                try:
                    restored = load_checkpoint(model_path, target=None)
                except FileNotFoundError as err:
                    raise ValueError(f"Cannot load model from {model_path}") from err
                # orbax stores the TrainState: its "params" field is the net's
                # variable dict
                backbone_params = restored["params"] if "params" in restored else restored
            params = ft.transfer_backbone_params(params, backbone_params, self.cfg.finetuning)

        self.use_ema = bool(self.backbone_cfg.get("ema", self.cfg.get("ema", False)))
        from vit4hep_tpu.utils.misc import count_parameters

        LOGGER.info(
            f"Instantiated fine-tune model with {count_parameters(params)} parameters"
        )
        self._init_params = params

    def _init_optimizer(self):
        self.lr_schedule = ts.make_schedule(self.cfg.training)
        self.tx = ft.make_ft_optimizer(
            self.cfg.training, self.cfg.finetuning, self._init_params
        )
        state = ts.create_train_state(self._init_params, self.tx, self.use_ema)
        if self.warm_start:
            model_path = os.path.join(
                self.cfg.run_dir, "models", f"model_run{self.cfg.warm_start_idx}"
            )
            LOGGER.info(f"Loading model/optimizer/EMA state from {model_path}")
            state = self._restore_state(state, model_path)
        from vit4hep_tpu.parallel import mesh as mesh_lib

        self.state = mesh_lib.shard_state(state, self.mesh)
        del self._init_params


class CaloChallengeFTCFM(FTMixin, CaloChallenge):
    """Fine-tune a pretrained shape CFM on a different CaloChallenge dataset
    (reference experiment_finetuning.py:18-205)."""


class CaloChallengeFT_fromLEM(CaloChallengeFTCFM):
    """Fine-tuning from a LEMURS backbone: append (theta, phi, label) to the
    sampling conditions (reference experiment_finetuning.py:208-285)."""

    def sample_n(self):
        import time

        t_0 = time.time()
        if str(self.cfg.evaluation.eval_dataset) in ("2", "3"):
            Einc = 10 ** np.random.uniform(3, 6, size=int(self.cfg.n_samples))
        else:
            Einc = self.generate_Einc_ds1()
        Einc = Einc.astype(np.float32)[:, None]

        dummy, transformed_cond = None, Einc
        for fn in self.transforms:
            if hasattr(fn, "cond_transform"):
                dummy, transformed_cond = fn(dummy, transformed_cond)

        batchsize_sample = int(self.cfg.training.batchsize_sample)
        if self.cfg.sample_us:
            u_samples = self.sample_us(transformed_cond, batchsize_sample)
            transformed_cond = np.concatenate([u_samples, transformed_cond], axis=1)
            n = len(transformed_cond)
            theta = np.full((n, 1), float(self.cfg.gen_theta), np.float32)
            phi = np.full((n, 1), float(self.cfg.gen_phi), np.float32)
            label = np.tile(
                np.asarray(self.cfg.gen_label, np.float32)[None, :], (n, 1)
            )
            transformed_cond = np.concatenate(
                [transformed_cond, theta, phi, label], axis=1
            )
        else:
            from vit4hep_tpu.data.calochallenge.datasets import CaloChallengeDataset

            transformed_cond = CaloChallengeDataset(
                self.hdf5_test, self.particle_type, self.xml_filename,
                transform=self.transforms, split="full",
            ).energy

        key_sample, self.base_key = jax.random.split(self.base_key)
        sample = self._sample_in_batches(
            self.model, self.state.params,
            np.asarray(transformed_cond, np.float32), key_sample, batchsize_sample,
        )
        LOGGER.info(
            f"sample_n: Finished generating {len(sample)} samples "
            f"after {time.time() - t_0} s."
        )
        return sample, np.asarray(transformed_cond)
