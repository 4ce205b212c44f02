"""Every shipped model config must instantiate (the reference-config parity
surface: a user's `/model: ...` choice can never hit a stale `_target_` or a
bad kwarg). Fine-tuning configs are construction templates consumed by the
FT experiments, not direct `instantiate` targets — they are checked for
remap-ability only."""

from pathlib import Path

import pytest
import yaml

from vit4hep_tpu.utils.config import TARGET_REMAP, instantiate

CONFIG_ROOT = Path(__file__).resolve().parents[1] / "configs" / "model"
ALL_MODEL_CFGS = sorted(CONFIG_ROOT.rglob("*.yaml"))


def _is_ft(path: Path) -> bool:
    return path.stem.endswith("_ft")


@pytest.mark.parametrize(
    "cfg_path", [p for p in ALL_MODEL_CFGS if not _is_ft(p)],
    ids=lambda p: str(p.relative_to(CONFIG_ROOT)),
)
def test_model_config_instantiates(cfg_path):
    cfg = yaml.safe_load(cfg_path.read_text())
    model = instantiate(cfg)
    # the model API surface every experiment relies on
    for attr in ("init_params", "batch_loss", "sample_batch"):
        assert hasattr(model, attr), f"{cfg_path.name}: model lacks {attr}"


@pytest.mark.parametrize(
    "cfg_path", [p for p in ALL_MODEL_CFGS if _is_ft(p)],
    ids=lambda p: str(p.relative_to(CONFIG_ROOT)),
)
def test_ft_config_targets_resolve(cfg_path):
    cfg = yaml.safe_load(cfg_path.read_text())

    def targets(node):
        if isinstance(node, dict):
            if "_target_" in node:
                yield node["_target_"]
            for v in node.values():
                yield from targets(v)

    for t in targets(cfg):
        assert t in TARGET_REMAP or t.startswith("vit4hep_tpu."), (
            f"{cfg_path.name}: unmapped _target_ {t}"
        )


EXPERIMENT_ROOT = Path(__file__).resolve().parents[1] / "configs"
_CALO_EXP_CFGS = sorted(
    p for p in (EXPERIMENT_ROOT / "calochallenge").rglob("*.yaml")
)


@pytest.mark.parametrize(
    "cfg_path", _CALO_EXP_CFGS,
    ids=lambda p: str(p.relative_to(EXPERIMENT_ROOT)),
)
def test_pipeline_geometry_matches_model(cfg_path):
    """The transform pipeline's voxel geometry must agree with the model it
    feeds: AddFeaturesToCond.split_index == prod(Reshape voxels) ==
    prod(model shape). (The class of bug this guards: a cINN experiment
    config carrying the CFM's padded geometry, or vice versa.)"""
    import math

    from vit4hep_tpu.utils.config import compose

    name = str(cfg_path.relative_to(EXPERIMENT_ROOT).with_suffix(""))
    cfg = compose(str(EXPERIMENT_ROOT), name)
    if cfg.get("model_type") != "shape":
        pytest.skip("energy configs have no voxel pipeline")
    transforms = cfg.data.transforms
    if "AddFeaturesToCond" not in transforms or "Reshape" not in transforms:
        pytest.skip("no voxel reshape in this pipeline")
    split = int(transforms["AddFeaturesToCond"]["split_index"])
    reshape = [int(s) for s in transforms["Reshape"]["shape"]]
    n_voxels_pipeline = math.prod(reshape) // int(cfg.model.get("in_channels", 1))
    assert split == n_voxels_pipeline, (
        f"{cfg_path.name}: split_index {split} != Reshape voxels {n_voxels_pipeline}"
    )
    model_shape = [int(s) for s in cfg.model.shape]
    assert math.prod(model_shape) == n_voxels_pipeline, (
        f"{cfg_path.name}: model shape {model_shape} != pipeline voxels "
        f"{n_voxels_pipeline}"
    )
