"""Hydra/OmegaConf-compatible config system (self-contained, no external deps).

The reference framework composes its configuration with Hydra
(``/root/reference/main.py:7``, ``configs/default.yaml``) and passes an OmegaConf
object around. Neither hydra-core nor omegaconf is available in this environment,
so this module re-implements the subset of semantics the config tree actually
uses, keeping the *exact* YAML surface so that existing config files run
unchanged:

- defaults-list composition (``defaults: [- /default, - /training: cfm/shape]``),
  with the Hydra rule that a config's own content is merged last when ``_self_``
  is not listed explicitly.
- ``???`` mandatory values (raising ``MissingMandatoryValue`` on access).
- ``${a.b}`` interpolation resolved lazily against the root config.
- dotted CLI overrides (``exp_name=foo training.lr=1e-4``) parsed with YAML rules.
- ``instantiate(cfg)`` resolving ``_target_`` strings, including a remap table for
  the reference's module paths (``models.base_model.CFM`` -> ours) so reference
  configs work verbatim.
"""

from __future__ import annotations

import importlib
import os
import re
from typing import Any

import yaml

_MISSING = "???"
_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


class MissingMandatoryValue(Exception):
    pass


class ConfigAttributeError(AttributeError):
    pass


class Config:
    """Attribute-accessible nested dict with interpolation, mirroring OmegaConf.

    Values equal to ``"???"`` are mandatory: reading them raises
    ``MissingMandatoryValue`` until they are overridden.
    """

    def __init__(self, data: dict | None = None, parent: "Config | None" = None):
        object.__setattr__(self, "_data", {})
        object.__setattr__(self, "_parent", parent)
        if data:
            for k, v in data.items():
                self._data[k] = self._wrap(v)

    # -- construction helpers -------------------------------------------------
    def _wrap(self, v):
        if isinstance(v, Config):
            return Config(v.to_container(resolve=False), parent=self)
        if isinstance(v, dict):
            return Config(v, parent=self)
        if isinstance(v, list):
            return [self._wrap(x) for x in v]
        return v

    def _root(self) -> "Config":
        node = self
        while object.__getattribute__(node, "_parent") is not None:
            node = object.__getattribute__(node, "_parent")
        return node

    # -- access ---------------------------------------------------------------
    def _resolve_value(self, key, v):
        if isinstance(v, str):
            if v == _MISSING:
                raise MissingMandatoryValue(f"Missing mandatory value: {key}")
            if _INTERP_RE.search(v):
                return self._interpolate(v)
        if isinstance(v, list):
            return [self._resolve_value(key, x) for x in v]
        return v

    def _interpolate(self, s: str):
        root = self._root()

        def lookup(path: str):
            node: Any = root
            for part in path.split("."):
                if isinstance(node, Config):
                    node = node[part]
                else:
                    raise ConfigAttributeError(f"Cannot resolve interpolation ${{{path}}}")
            return node

        full = _INTERP_RE.fullmatch(s)
        if full:
            return lookup(full.group(1))
        return _INTERP_RE.sub(lambda m: str(lookup(m.group(1))), s)

    def __getattr__(self, key):
        data = object.__getattribute__(self, "_data")
        if key in data:
            return self._resolve_value(key, data[key])
        raise ConfigAttributeError(f"Key '{key}' not found in config")

    def __setattr__(self, key, value):
        self._data[key] = self._wrap(value)

    def __getitem__(self, key):
        return self.__getattr__(key)

    def __setitem__(self, key, value):
        self.__setattr__(key, value)

    def __contains__(self, key):
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def __delitem__(self, key):
        del self._data[key]

    def __deepcopy__(self, memo):
        return Config(self.to_container(resolve=False))

    def get(self, key, default=None):
        if key in self._data:
            try:
                return self._resolve_value(key, self._data[key])
            except MissingMandatoryValue:
                return default
        return default

    def keys(self):
        return self._data.keys()

    def items(self):
        return [(k, self._resolve_value(k, v)) for k, v in self._data.items()]

    def values(self):
        return [self._resolve_value(k, v) for k, v in self._data.items()]

    def setdefault(self, key, value):
        if key not in self._data:
            self[key] = value
        return self[key]

    # -- merge / export ---------------------------------------------------------
    def merge_with(self, other: "Config | dict"):
        items = other._data.items() if isinstance(other, Config) else other.items()
        for k, v in items:
            if (
                k in self._data
                and isinstance(self._data[k], Config)
                and isinstance(v, (Config, dict))
            ):
                self._data[k].merge_with(v)
            else:
                self._data[k] = self._wrap(v)

    def to_container(self, resolve: bool = False):
        out = {}
        for k, v in self._data.items():
            if isinstance(v, Config):
                out[k] = v.to_container(resolve=resolve)
            elif isinstance(v, list):
                out[k] = [
                    x.to_container(resolve=resolve) if isinstance(x, Config) else x for x in v
                ]
            elif resolve:
                try:
                    out[k] = self._resolve_value(k, v)
                except MissingMandatoryValue:
                    out[k] = None
            else:
                out[k] = v
        return out

    def to_yaml(self, resolve: bool = False) -> str:
        return yaml.safe_dump(self.to_container(resolve=resolve), sort_keys=False)

    def __repr__(self):
        return f"Config({self.to_container()})"


# ---------------------------------------------------------------------------
# OmegaConf-compatible module-level API
# ---------------------------------------------------------------------------
class OmegaConf:
    """Shim with the OmegaConf classmethods the reference codebase uses."""

    @staticmethod
    def load(path) -> Config:
        with open(path) as f:
            return Config(yaml.safe_load(f) or {})

    @staticmethod
    def create(data=None) -> Config:
        return Config(data or {})

    @staticmethod
    def to_yaml(cfg: Config, resolve: bool = False) -> str:
        return cfg.to_yaml(resolve=resolve)

    @staticmethod
    def to_container(cfg: Config, resolve: bool = False):
        return cfg.to_container(resolve=resolve)

    @staticmethod
    def merge(*cfgs) -> Config:
        out = Config({})
        for c in cfgs:
            out.merge_with(c if isinstance(c, Config) else Config(c))
        return out


def open_dict(cfg: Config):
    """Context manager kept for API parity (our Config is always writable)."""
    import contextlib

    @contextlib.contextmanager
    def _noop():
        yield cfg

    return _noop()


# ---------------------------------------------------------------------------
# Hydra-style composition
# ---------------------------------------------------------------------------
def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _compose_file(config_dir: str, rel_name: str, group_dir: str = "",
                  group_overrides: dict | None = None) -> Config:
    """Load ``<config_dir>/<group_dir>/<rel_name>.yaml`` and process its defaults list.

    Implements Hydra's defaults-list semantics (hydra 1.1+, ``version_base=None``):
    entries are merged in order; if ``_self_`` is absent it is appended at the end,
    so the config's own content overrides its defaults.

    ``group_overrides`` (primary config only) maps a defaults-group name to a
    replacement config name (CLI ``model=cfm/b``): the matching defaults entry
    composes the replacement INSTEAD, so later entries — in particular the
    primary's own ``_self_`` body tweaks — still merge on top, exactly as
    Hydra re-runs composition. Consumed keys are popped so ``compose`` can
    fall back to node assignment for flat (defaults-free) configs.
    """
    path = os.path.join(config_dir, group_dir, rel_name + ".yaml")
    raw = _load_yaml(path)
    defaults = raw.pop("defaults", None)
    self_cfg = Config(raw)
    if not defaults:
        return self_cfg

    entries = list(defaults)
    if "_self_" not in [e if isinstance(e, str) else None for e in entries]:
        entries.append("_self_")

    out = Config({})
    for entry in entries:
        if entry == "_self_":
            out.merge_with(self_cfg)
        elif isinstance(entry, str):
            # plain entry: config at root level (abs '/name' or relative to group dir)
            name = entry.lstrip("/")
            sub_group = "" if entry.startswith("/") else group_dir
            out.merge_with(_compose_file(config_dir, name, sub_group))
        elif isinstance(entry, dict):
            # group entry: {'/training': 'cfm/shape'} or {'training': 'cfm/shape'}
            for group, name in entry.items():
                if name is None:
                    continue
                grp = group.lstrip("/")
                if group_overrides and grp in group_overrides:
                    name = group_overrides.pop(grp)
                # absolute group markers resolve from the config root, like the
                # plain-string branch (hydra: '/model: x' in a nested config
                # still loads configs/model/x.yaml and packages under `model`)
                base = "" if group.startswith("/") else group_dir
                node = _compose_file(config_dir, str(name), os.path.join(base, grp))
                wrapper = Config({})
                # nested groups: 'a/b' -> {'a': {'b': node}}
                keys = grp.split("/")
                target = wrapper
                for k in keys[:-1]:
                    target[k] = {}
                    target = target[k]
                target[keys[-1]] = node
                out.merge_with(wrapper)
        else:
            raise ValueError(f"Unsupported defaults entry: {entry!r}")
    return out


_FLOAT_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _parse_override_value(v: str):
    out = yaml.safe_load(v)
    # YAML 1.1 misses scientific notation without a dot ("1e-4"); hydra parses it
    if isinstance(out, str) and _FLOAT_RE.match(out) and any(c in out for c in ".eE"):
        return float(out)
    return out


def apply_overrides(cfg: Config, overrides: list[str]):
    for ov in overrides:
        delete = ov.startswith("~")
        if "=" not in ov and not delete:
            raise ValueError(f"Override '{ov}' is not of the form key=value")
        key, _, val = ov.partition("=")
        key = key.lstrip("+~")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node:
                if delete:
                    raise ValueError(
                        f"Could not delete '{key}': '{p}' is not in the config"
                    )
                node[p] = {}
            node = node[p]
        if delete:
            # hydra "~key" / "~key=value": remove the key (hydra errors on a
            # missing key, so do we); with a value, hydra only deletes when it
            # matches the current one — a mismatch must error, not delete
            if parts[-1] not in node:
                raise ValueError(
                    f"Could not delete '{key}': '{parts[-1]}' is not in the config"
                )
            if "=" in ov:
                want = _parse_override_value(val)
                have = node[parts[-1]]
                if have != want:
                    raise ValueError(
                        f"Could not delete '{key}={val}': current value "
                        f"{have!r} does not match"
                    )
            del node[parts[-1]]
        else:
            node[parts[-1]] = _parse_override_value(val)
    return cfg


def compose(
    config_path: str = "configs",
    config_name: str = "default",
    overrides: list[str] | None = None,
) -> Config:
    """Compose a config the way ``@hydra.main`` does in the reference launcher.

    Supports Hydra config-GROUP overrides (``model=cfm/cfm_ds2_electrons_tpu``
    swaps the whole defaults-group node when ``<config_path>/<key>/<value>.yaml``
    exists) in addition to plain value overrides — the reference launcher
    relies on this to switch model configs from the CLI.
    """
    config_dir = os.path.abspath(config_path)
    group_overrides, value_overrides = {}, []
    for ov in overrides or []:
        key, eq, val = ov.partition("=")
        group_yaml = os.path.join(config_dir, key, str(val) + ".yaml")
        if eq and "." not in key and "/" not in key and os.path.isfile(group_yaml):
            group_overrides[key] = str(val)
        else:
            value_overrides.append(ov)
    cfg = _compose_file(config_dir, config_name,
                        group_overrides=group_overrides)
    # a group override with no matching defaults entry (e.g. a flat resolved
    # run-dir config) swaps the whole node — hydra would error, but node
    # assignment is what the AUC gate and sample-only runs rely on there
    for key, val in group_overrides.items():
        cfg[key] = _compose_file(config_dir, val, key)
    # drop hydra-runtime node if present (reference configs/hydra.yaml)
    if "hydra" in cfg:
        del cfg["hydra"]
    if value_overrides:
        apply_overrides(cfg, value_overrides)
    return cfg


def compose_from_cli(argv: list[str], default_config_path="configs", default_config_name=None):
    """Parse hydra-style CLI args: -cp/--config-path, -cn/--config-name, overrides."""
    config_path, config_name = default_config_path, default_config_name
    overrides = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-cp", "--config-path"):
            config_path = argv[i + 1]
            i += 2
        elif a in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        elif a.startswith("--config-path="):
            config_path = a.split("=", 1)[1]
            i += 1
        elif a.startswith("--config-name="):
            config_name = a.split("=", 1)[1]
            i += 1
        else:
            overrides.append(a)
            i += 1
    if config_name is None:
        raise ValueError("No config name given (use -cn <name>)")
    if config_name.endswith(".yaml"):
        config_name = config_name[: -len(".yaml")]
    return compose(config_path, config_name, overrides)


# ---------------------------------------------------------------------------
# instantiate() with reference-path remapping
# ---------------------------------------------------------------------------
# Map the reference's _target_ module paths onto this framework so that the
# reference's YAML files run unchanged (SURVEY.md section 5: config surface parity).
TARGET_REMAP = {
    "models.base_model.CFM": "vit4hep_tpu.models.cfm.CFM",
    "models.base_model.CINN": "vit4hep_tpu.models.cinn.CINN",
    "nn.vit.ViT": "vit4hep_tpu.models.vit.ViT",
    "nn.vit.ViT1D": "vit4hep_tpu.models.vit.ViT1D",
    "nn.cfm.transformer_cfm.ParallelTransformer": (
        "vit4hep_tpu.models.energy_transformer.ParallelTransformer"
    ),
    "nn.cfm.transformer.ARtransformer": "vit4hep_tpu.models.ar_transformer.ARtransformer",
    # stale reference config paths (modules missing in the reference itself,
    # SURVEY.md L1): alias to the nearest live equivalents
    "nn.cfm.mlp_transformer.MLPTransformer2": (
        "vit4hep_tpu.models.energy_transformer.ParallelTransformer"
    ),
    "nn.vit.ViT2": "vit4hep_tpu.models.vit.ViT",
    "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM": (
        "vit4hep_tpu.models.calochallenge.CaloChallengeCFM"
    ),
    "experiments.calochallenge.calochallenge_cfm.model.CaloChallengeCFM_DS1": (
        "vit4hep_tpu.models.calochallenge.CaloChallengeCFM_DS1"
    ),
    "experiments.calochallenge.calochallenge_cinn.model.CaloChallengeCINN": (
        "vit4hep_tpu.models.calochallenge.CaloChallengeCINN"
    ),
    "experiments.calochallenge.calochallenge_cinn.model.CaloChallengeEnergyCINN": (
        "vit4hep_tpu.models.calochallenge.CaloChallengeEnergyCINN"
    ),
    # stale path in reference configs/model/cinn/cinn_energy.yaml:1 (see SURVEY.md L1)
    "experiments.calochallenge.model.CaloChallengeEnergy": (
        "vit4hep_tpu.models.calochallenge.CaloChallengeEnergyCINN"
    ),
    # stale path in reference configs/model/cinn/cinn_nflows*.yaml:1 (module
    # experiments.calochallenge.model does not exist upstream)
    "experiments.calochallenge.model.CaloChallengeCINN": (
        "vit4hep_tpu.models.calochallenge.CaloChallengeCINN"
    ),
    "experiments.calogan.model.CaloGANCFM": "vit4hep_tpu.models.calogan.CaloGANCFM",
    "experiments.lemurs.model.LEMURSCFM": "vit4hep_tpu.models.lemurs.LEMURSCFM",
    "experiments.calohadronic.model.CaloHadCFM": (
        "vit4hep_tpu.models.calohadronic.CaloHadCFM"
    ),
}


def _locate(target: str):
    target = TARGET_REMAP.get(target, target)
    module_name, _, attr = target.rpartition(".")
    mod = importlib.import_module(module_name)
    return getattr(mod, attr)


def instantiate(cfg, **kwargs):
    """Recursively instantiate a config node with a ``_target_`` key.

    Hydra-compatible semantics: ``${...}`` interpolations are resolved (the
    resolving accessor reaches the root config through the parent chain),
    ``???`` raises :class:`MissingMandatoryValue`, and nested ``_target_``
    nodes are instantiated at ANY depth — including below plain mapping
    children and inside list elements.
    """
    if isinstance(cfg, Config):
        # resolving accessor: interpolations substituted, ??? raises
        data = {k: cfg[k] for k in cfg._data}
    elif isinstance(cfg, dict):
        data = dict(cfg)
    elif isinstance(cfg, list):
        return [_build_value(v) for v in cfg]
    else:
        return cfg
    if "_target_" not in data:
        # plain mapping: resolve + instantiate children recursively
        return {k: _build_value(v) for k, v in data.items()}
    target = data.pop("_target_")
    cls = _locate(str(target))
    call_kwargs = {k: _build_value(v) for k, v in data.items()}
    call_kwargs.update(kwargs)
    return cls(**call_kwargs)


def _build_value(v):
    """Resolve one instantiate() argument: nested targets become objects,
    Config nodes become plain (resolved) dicts, lists recurse elementwise."""
    if isinstance(v, Config):
        if _has_target(v):
            return instantiate(v)
        return {k: _build_value(v[k]) for k in v._data}
    if isinstance(v, dict):
        if "_target_" in v:
            return instantiate(v)
        return {k: _build_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_build_value(x) for x in v]
    return v


def _has_target(node) -> bool:
    if isinstance(node, Config):
        return "_target_" in node._data
    return isinstance(node, dict) and "_target_" in node
