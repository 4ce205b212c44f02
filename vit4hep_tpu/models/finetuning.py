"""Cross-dataset fine-tuning: backbone transfer, embedder surgery, param groups.

Functional counterpart of the reference's fine-tuning machinery
(`/root/reference/experiments/calochallenge/calochallenge_cfm/experiment_finetuning.py:75-205`):

- :func:`build_ft_vit_params` merges the backbone architecture with the target
  dataset's patching/conditioning, expressing the reference's module surgery
  (mapper layers, reinitialized embedders, rebuilt positional meshgrid, fresh
  FinalLayer) as static config — the meshgrid rebuild is free here because our
  ViT derives it from ``num_patches`` at trace time.
- :func:`transfer_backbone_params` copies the backbone weights into the
  freshly-initialized fine-tune net (params surgery instead of module
  surgery), including the linear-interpolation option for embedder kernels
  (reference :97-104, :132-139 — ``jax.image.resize`` on the kernel's input
  axis).
- :func:`param_group_labels` labels each top-level module backbone / head /
  embedder for the 3-group optimizer (reference :167-205), built with
  ``optax.multi_transform``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit4hep_tpu.models.vit import ViTParams
from vit4hep_tpu.utils.logger import LOGGER

EMBEDDER_MODULES = ("x_embedder", "x_mapper", "c_embedder", "c_mapper", "pos_embed_freqs")
HEAD_MODULES = ("final_layer",)


def build_ft_vit_params(backbone_param: dict, target_param: dict, ft_cfg) -> ViTParams:
    """ViTParams for the fine-tune net: backbone architecture, target geometry."""
    merged = dict(backbone_param)
    merged["num_patches"] = target_param["num_patches"]
    merged["out_patch_dim"] = int(target_param["patch_dim"])

    interpolate = ft_cfg.get("interpolate", False)

    if ft_cfg.get("map_x_embedding", False):
        # target patch_dim -> mapper -> backbone patch_dim -> x_embedder
        merged["in_patch_dim"] = int(target_param["patch_dim"])
        # patch_dim stays the backbone's
    elif ft_cfg.get("reinitialize_x_embedding", False) or interpolate:
        merged["patch_dim"] = int(target_param["patch_dim"])
    # else: backbone x_embedder reused verbatim -> dims must already match

    if ft_cfg.get("map_c_embedding", False):
        merged["in_condition_dim"] = int(target_param["condition_dim"])
    elif ft_cfg.get("reinitialize_c_embedding", False) or interpolate:
        merged["condition_dim"] = int(target_param["condition_dim"])
    return ViTParams.create(merged)


def _resize_kernel_in(kernel, new_in):
    """Linear interpolation of a Dense kernel along its input axis
    (reference torch F.interpolate on the weight, :97-104)."""
    return jax.image.resize(kernel, (new_in, kernel.shape[1]), method="linear")


def transfer_backbone_params(ft_params, backbone_params, ft_cfg):
    """Copy backbone weights into the fine-tune net's param tree.

    ``ft_params`` / ``backbone_params`` are the Flax variable dicts of the
    fine-tune net and backbone net. Returns the updated fine-tune variables.
    """
    ft = dict(ft_params)
    ft_p = dict(ft["params"])
    bb_p = backbone_params["params"]

    map_x = ft_cfg.get("map_x_embedding", False)
    reinit_x = ft_cfg.get("reinitialize_x_embedding", False)
    map_c = ft_cfg.get("map_c_embedding", False)
    reinit_c = ft_cfg.get("reinitialize_c_embedding", False)
    interpolate = ft_cfg.get("interpolate", False)
    reinit_pos = ft_cfg.get("reinitialize_pos_embedding", False)
    reinit_final = ft_cfg.get("reinitialize_final_layer", False)

    for name, value in bb_p.items():
        if name == "x_embedder":
            if map_x:
                ft_p[name] = value  # mapper feeds the original embedder
            elif reinit_x:
                # reinit takes precedence over interpolate: in the reference,
                # the interpolation runs on the already-reinitialized layer
                # whose input is the target size, i.e. a no-op
                # (experiment_finetuning.py:92-104; ds2tods3_ft sets both)
                LOGGER.info("FT: x_embedder reinitialized")
            elif interpolate:
                new_in = ft_p[name]["kernel"].shape[0]
                ft_p[name] = {
                    "kernel": _resize_kernel_in(value["kernel"], new_in),
                    "bias": value["bias"],
                }
                LOGGER.info(f"FT: x_embedder kernel interpolated to input dim {new_in}")
            else:
                ft_p[name] = value
        elif name == "c_embedder":
            if map_c:
                ft_p[name] = value
            elif reinit_c:
                # same precedence as x_embedder (reference :121-139)
                LOGGER.info("FT: c_embedder reinitialized")
            elif interpolate:
                sub = dict(value)
                first_key = sorted(sub.keys())[0]
                new_in = ft_p[name][first_key]["kernel"].shape[0]
                sub[first_key] = {
                    "kernel": _resize_kernel_in(sub[first_key]["kernel"], new_in),
                    "bias": sub[first_key]["bias"],
                }
                ft_p[name] = sub
                LOGGER.info(f"FT: c_embedder first kernel interpolated to input dim {new_in}")
            else:
                ft_p[name] = value
        elif name == "pos_embed_freqs":
            if not reinit_pos:
                ft_p[name] = value
        elif name == "final_layer":
            if not reinit_final:
                ft_p[name] = value
        elif name in ft_p:
            ft_p[name] = value  # t_embedder, block_i: always transferred
    ft["params"] = ft_p
    return ft


def param_group_labels(params):
    """Label each leaf backbone / head / embedder by its top-level module."""

    def label_of(top):
        if top in EMBEDDER_MODULES:
            return "embedder"
        if top in HEAD_MODULES:
            return "head"
        return "backbone"

    return {
        "params": {
            top: jax.tree_util.tree_map(lambda _: label_of(top), sub)
            for top, sub in params["params"].items()
        }
    }


def make_ft_optimizer(training_cfg, ft_cfg, params):
    """3 param groups {backbone_lr, head_lr, embedder_lr} (reference :199-205).

    Each group goes through the standard optimizer/schedule factory, so the
    configured optimizer name AND lr scheduler apply per group (the reference
    feeds its torch param groups through the base _init_optimizer/_init_
    scheduler, which anneal every group's lr from its own initial value).
    """
    import optax

    from vit4hep_tpu.experiments import train_state as ts

    def group(lr):
        schedule = ts.make_schedule(training_cfg, lr=float(lr))
        return ts.make_optimizer(training_cfg, schedule)

    tx = optax.multi_transform(
        {
            "backbone": group(ft_cfg.get("backbone_lr", training_cfg.lr)),
            "head": group(ft_cfg.get("head_lr", training_cfg.lr)),
            "embedder": group(ft_cfg.get("embedder_lr", training_cfg.lr)),
        },
        param_group_labels(params),
    )
    return tx
