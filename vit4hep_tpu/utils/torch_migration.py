"""Load reference (torch) ``.pt`` checkpoints into this framework's param trees.

The reference saves ``torch.save({"model": state_dict, "optimizer", "scheduler",
"ema"})`` (reference ``experiments/base_experiment.py:661-677``); model keys are
``net.<param>`` (the generative model wraps its network as ``self.net``) with
optional ``module.`` DDP prefixes (``experiments/misc.py:65-71``). This module
converts those tensors into the Flax param tree of :class:`~vit4hep_tpu.models.
vit.ViTNet` / :class:`ViT1DNet` so a user migrating from the torch framework
can carry trained weights over instead of retraining.

Key-by-key layout mapping (torch -> flax); every ``nn.Linear`` weight is
transposed (torch stores ``(out, in)``, Flax ``Dense`` stores ``(in, out)``)::

    x_embedder.{weight,bias}            x_embedder.{kernel,bias}
    c_embedder.0 / c_embedder.2         c_embedder.Dense_0 / Dense_1
    t_embedder.mlp.0 / mlp.2            t_embedder.Dense_0 / Dense_1   (ViT only)
    pos_embed_freqs                     pos_embed_freqs
    blocks.N.adaLN_modulation.1         block_N.adaLN_modulation
    blocks.N.attn.qkv / attn.proj       block_N.Attention_0.Dense_0 / Dense_1
    blocks.N.mlp.fc1 / mlp.fc2          block_N.MlpBlock_0.Dense_0 / Dense_1
    final_layer.adaLN_modulation.1      final_layer.adaLN_modulation
    final_layer.linear                  final_layer.Dense_0

Buffers (``pos_z/pos_y/pos_x``, ``grid``, ``pos_embed``, ``attn_mask``) are
deterministic functions of the config and are recomputed here, not loaded.
The QKV packing order (q, k, v along the output dim) and the per-head reshape
``(3, H, D)`` agree between the two frameworks (reference ``nn/vit.py:416,427``
vs ``models/vit.py:Attention``), so the fused QKV kernel transfers directly.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "strip_state_dict_prefixes",
    "convert_vit_state_dict",
    "convert_energy_state_dict",
    "convert_ema_state_dict",
    "net_kind_from_target",
]

# buffers recomputed from the config; reference registers them in the state dict
_BUFFER_KEYS = {"pos_z", "pos_y", "pos_x", "grid", "pos_embed", "attn_mask"}


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd, key):
    entry = {"kernel": _to_np(sd[f"{key}.weight"]).T}
    bias_key = f"{key}.bias"
    if bias_key in sd:
        entry["bias"] = _to_np(sd[bias_key])
    return entry


def strip_state_dict_prefixes(sd, prefixes=("module.", "net.")):
    """Strip DDP/model-wrapper prefixes (reference misc.py:65-71 strips only
    ``module.``; ``net.`` is the generative model's network attribute).
    Handles stacked prefixes in any order (DDP-saved models yield
    ``net.module.<param>``)."""
    out = {}
    for k, v in sd.items():
        stripped = True
        while stripped:
            stripped = False
            for p in prefixes:
                if k.startswith(p):
                    k = k[len(p):]
                    stripped = True
        out[k] = v
    return out


def load_torch_checkpoint(path, section="model"):
    """Read a reference ``model_run<i>.pt`` and return the prefix-stripped
    state dict of ``section`` ("model", "ema", "optimizer", "scheduler")."""
    import torch  # CPU torch; only needed when actually migrating

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload[section] if isinstance(payload, dict) and section in payload else payload
    if not isinstance(sd, dict):
        raise ValueError(f"Section '{section}' of {path} is not a state dict")
    return strip_state_dict_prefixes(sd)


def convert_vit_state_dict(sd, vit1d=False):
    """Convert a reference ViT/ViT1D state dict to a Flax ``{"params": ...}``
    variable dict for :class:`ViTNet` / :class:`ViT1DNet`.

    ``sd`` must already be prefix-stripped (see :func:`load_torch_checkpoint`).
    Unknown keys raise so silent weight drops cannot happen.
    """
    sd = dict(sd)
    for k in list(sd):
        if k.split(".")[-1] in _BUFFER_KEYS or k in _BUFFER_KEYS:
            del sd[k]
    if vit1d:
        # reference ViT1D inherits (and never calls) the parent's t_embedder
        for k in list(sd):
            if k.startswith("t_embedder."):
                del sd[k]

    params: dict = {}
    consumed = set()

    def take(torch_key, flax_path, entry=None):
        if entry is None:
            entry = _linear(sd, torch_key)
            consumed.update({f"{torch_key}.weight", f"{torch_key}.bias"} & set(sd))
        else:
            consumed.add(torch_key)
        node = params
        for p in flax_path[:-1]:
            node = node.setdefault(p, {})
        node[flax_path[-1]] = entry

    if "x_embedder.0.weight" in sd:
        # fine-tuned net: x_embedder = Sequential(mapper, SiLU, backbone
        # embedder) (reference experiment_finetuning.py:78-90) -> our
        # x_mapper + x_embedder pair
        take("x_embedder.0", ("x_mapper",))
        take("x_embedder.2", ("x_embedder",))
    else:
        take("x_embedder", ("x_embedder",))
    if "c_embedder.2.0.weight" in sd:
        # fine-tuned net: c_embedder = Sequential(mapper, SiLU, backbone
        # Sequential) (reference experiment_finetuning.py:106-118)
        take("c_embedder.0", ("c_mapper",))
        take("c_embedder.2.0", ("c_embedder", "Dense_0"))
        take("c_embedder.2.2", ("c_embedder", "Dense_1"))
    else:
        take("c_embedder.0", ("c_embedder", "Dense_0"))
        take("c_embedder.2", ("c_embedder", "Dense_1"))
    if not vit1d:
        take("t_embedder.mlp.0", ("t_embedder", "Dense_0"))
        take("t_embedder.mlp.2", ("t_embedder", "Dense_1"))
    if "pos_embed_freqs" in sd:
        take("pos_embed_freqs", ("pos_embed_freqs",), _to_np(sd["pos_embed_freqs"]))

    depths = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))}
    )
    for i in depths:
        b = f"blocks.{i}"
        take(f"{b}.adaLN_modulation.1", (f"block_{i}", "adaLN_modulation"))
        take(f"{b}.attn.qkv", (f"block_{i}", "Attention_0", "Dense_0"))
        take(f"{b}.attn.proj", (f"block_{i}", "Attention_0", "Dense_1"))
        take(f"{b}.mlp.fc1", (f"block_{i}", "MlpBlock_0", "Dense_0"))
        take(f"{b}.mlp.fc2", (f"block_{i}", "MlpBlock_0", "Dense_1"))

    take("final_layer.adaLN_modulation.1", ("final_layer", "adaLN_modulation"))
    take("final_layer.linear", ("final_layer", "Dense_0"))

    leftover = set(sd) - consumed
    if leftover:
        raise ValueError(
            "Unmapped reference parameters (layout mismatch?): "
            + ", ".join(sorted(leftover))
        )
    return {"params": params}


def _layer_norm(sd, key):
    return {"scale": _to_np(sd[f"{key}.weight"]), "bias": _to_np(sd[f"{key}.bias"])}


def _split_in_proj(sd, key, d_model):
    """torch MultiheadAttention packs q/k/v as rows of ``in_proj_weight``."""
    w = _to_np(sd[f"{key}.in_proj_weight"])
    b = _to_np(sd[f"{key}.in_proj_bias"])
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        sl = slice(i * d_model, (i + 1) * d_model)
        out[name] = {"kernel": w[sl].T, "bias": b[sl]}
    out["out_proj"] = _linear(sd, f"{key}.out_proj")
    return out


def convert_energy_state_dict(sd):
    """Convert a reference ``ParallelTransformer`` state dict (torch
    ``nn.Transformer``, transformer_cfm.py:12-119) to Flax variables for
    :class:`~vit4hep_tpu.models.energy_transformer.ParallelTransformerNet`.

    Returns ``(variables, config_patch)``. The reference stores its frozen
    Gaussian-Fourier time weights as a non-trainable parameter
    (``time_embed.0.W``); here they are static config, so the caller must
    merge ``config_patch`` (``{"fourier_w": [...]}``) into the net's
    ``param`` dict before instantiating.
    """
    sd = dict(sd)
    config_patch = {"fourier_w": _to_np(sd.pop("time_embed.0.W")).tolist()}
    # `self.layer` and `self.layers[0]` are the same torch module, registered
    # twice -> drop the alias entries
    for k in list(sd):
        if k.startswith("layer."):
            del sd[k]

    d_model = _to_np(sd["transformer.encoder.layers.0.self_attn.in_proj_bias"]).shape[0] // 3
    params: dict = {"time_embed": _linear(sd, "time_embed.1")}
    consumed = {"time_embed.1.weight", "time_embed.1.bias"}

    for ours, theirs in (
        ("x_embed", "x_embed"), ("c_embed", "c_embed"),
        ("head_0", "layers.0"), ("head_1", "layers.2"),
    ):
        if f"{theirs}.weight" in sd:
            params[ours] = _linear(sd, theirs)
            consumed.update({f"{theirs}.weight", f"{theirs}.bias"})
    for ours, theirs in (("pos_embed_x", "pos_embed_x"), ("pos_embed_c", "pos_embed_c")):
        if f"{theirs}.weight" in sd:
            params[ours] = {"embedding": _to_np(sd[f"{theirs}.weight"])}
            consumed.add(f"{theirs}.weight")

    def convert_stack(side, n_norms):
        i = 0
        while f"transformer.{side}.layers.{i}.self_attn.in_proj_weight" in sd:
            t = f"transformer.{side}.layers.{i}"
            layer = {"self_attn": _split_in_proj(sd, f"{t}.self_attn", d_model)}
            consumed.update({
                f"{t}.self_attn.in_proj_weight", f"{t}.self_attn.in_proj_bias",
                f"{t}.self_attn.out_proj.weight", f"{t}.self_attn.out_proj.bias",
            })
            if side == "decoder":
                layer["cross_attn"] = _split_in_proj(sd, f"{t}.multihead_attn", d_model)
                consumed.update({
                    f"{t}.multihead_attn.in_proj_weight", f"{t}.multihead_attn.in_proj_bias",
                    f"{t}.multihead_attn.out_proj.weight", f"{t}.multihead_attn.out_proj.bias",
                })
            layer["_FeedForward_0"] = {
                "Dense_0": _linear(sd, f"{t}.linear1"),
                "Dense_1": _linear(sd, f"{t}.linear2"),
            }
            consumed.update({
                f"{t}.linear1.weight", f"{t}.linear1.bias",
                f"{t}.linear2.weight", f"{t}.linear2.bias",
            })
            for j in range(n_norms):
                layer[f"LayerNorm_{j}"] = _layer_norm(sd, f"{t}.norm{j + 1}")
                consumed.update({f"{t}.norm{j + 1}.weight", f"{t}.norm{j + 1}.bias"})
            params[f"{side}_{i}"] = layer
            i += 1
        params[f"{side}_norm"] = _layer_norm(sd, f"transformer.{side}.norm")
        consumed.update({f"transformer.{side}.norm.weight", f"transformer.{side}.norm.bias"})

    convert_stack("encoder", 2)
    convert_stack("decoder", 3)

    leftover = set(sd) - consumed
    if leftover:
        raise ValueError(
            "Unmapped reference parameters (layout mismatch?): "
            + ", ".join(sorted(leftover))
        )
    return {"params": params}, config_patch


# non-trainable leaves of a FrEIA GraphINN checkpoint: permutation indices
# (nn/inn/permute.py:31-32) + BinnedSplineBase buffers (nn/inn/binned.py:194-201)
_CINN_BUFFER_LEAVES = {
    "perm", "perm_inv", "bins", "min_bin_sizes", "default_domain",
    "identity_tails", "default_width",
}


def convert_cinn_state_dict(model_sd, coupling_block):
    """Convert a FrEIA ``GraphINN`` state dict (the "model" section of a
    reference cINN run dir, reference calochallenge_cinn/model.py:100-127) to
    FlowChain Flax params + the per-block permutation index lists.

    GraphINN registers one ``module_list.{i}`` entry per graph node with a
    module; the exact indices depend on FrEIA's topological sort, so modules
    are classified by content (a ``perm`` leaf marks a PermuteRandom) and
    assigned to coupling/permute slots in index order — the graph is built
    strictly [coupling, permute] x nblocks (model.py:104-123).

    Returns ``(params, permutations)`` where ``params`` maps ``blocks_{2k}``
    (FlowChain's coupling submodule names; permutes are parameterless here)
    and ``permutations`` is a list of index lists for
    ``CaloChallengeCINN(permutations=...)``.
    """
    import re

    groups = {}
    for k, v in model_sd.items():
        m = re.match(r"module_list\.(\d+)\.(.+)", k)
        if not m:
            raise ValueError(f"unexpected non-GraphINN key '{k}' in cINN checkpoint")
        groups.setdefault(int(m.group(1)), {})[m.group(2)] = v

    permutations, couplings = [], []
    for idx in sorted(groups):
        g = groups[idx]
        if "perm" in g:
            permutations.append([int(x) for x in _to_np(g["perm"])])
        else:
            couplings.append(g)
    if len(couplings) != len(permutations):
        raise ValueError(
            f"cINN checkpoint has {len(couplings)} coupling blocks but "
            f"{len(permutations)} permutations — not a [coupling, permute] graph"
        )

    params = {
        f"blocks_{2 * k}": _convert_cinn_coupling(g, coupling_block)
        for k, g in enumerate(couplings)
    }
    return params, permutations


# subnet locations inside each reference coupling-block type -> our FlowChain
# submodule names (prefixes verified by the block-level parity tests,
# tests/test_reference_parity.py)
_CINN_SUBNET_PREFIXES = {
    "CaloRQSplineFrEIA": (("subnet1", "subnet1.vit."), ("subnet2", "subnet2.vit.")),
    "CaloRQSplineNFlows": (
        ("subnet1", "_spline1.subnet.vit."), ("subnet2", "_spline2.subnet.vit.")),
    "OneSidedCaloRQSplineNFlows": (("subnet1", "_spline.subnet.vit."),),
}


def _convert_cinn_coupling(g, coupling_block):
    if coupling_block == "RQSplineNFlows":
        # energy cINN: SubnetMLP under _spline{1,2}.subnet.mlp.{seq idx}
        out = {}
        for ours, theirs in (("subnet1", "_spline1.subnet.mlp."),
                             ("subnet2", "_spline2.subnet.mlp.")):
            sub = {k[len(theirs):]: v for k, v in g.items() if k.startswith(theirs)}
            linear_idx = sorted({int(k.split(".")[0]) for k in sub})
            out[ours] = {
                f"Dense_{j}": _linear(sub, str(i))
                for j, i in enumerate(linear_idx)
            }
        return out
    try:
        prefix_map = _CINN_SUBNET_PREFIXES[coupling_block]
    except KeyError:
        raise ValueError(
            f"no cINN checkpoint converter for coupling block '{coupling_block}'"
        ) from None
    out = {}
    for ours, theirs in prefix_map:
        sub = strip_state_dict_prefixes(
            {k: v for k, v in g.items() if k.startswith(theirs)}, prefixes=(theirs,)
        )
        out[ours] = convert_vit_state_dict(sub, vit1d=True)["params"]
    return out


def maybe_convert_net_checkpoint(model_cfg, model_path):
    """Torch fallback for net-weight loading (the two-stage samplers'
    ``load_energy_model``): when ``model_path`` (an orbax dir) is absent but
    ``model_path + ".pt"`` exists, convert the reference checkpoint's "model"
    section (what the reference itself loads there, experiment.py:338-345).

    Returns the converted Flax variables, or ``None`` when the orbax path
    should be used. Patches ``model_cfg.net.param`` in place (``fourier_w``)
    for energy nets — call BEFORE instantiating the model.
    """
    import os

    if os.path.exists(model_path) or not os.path.exists(model_path + ".pt"):
        return None
    sd = load_torch_checkpoint(model_path + ".pt", "model")
    kind = net_kind_from_target(str(model_cfg.net._target_))
    if kind == "energy":
        variables, patch = convert_energy_state_dict(sd)
        for k, v in patch.items():
            model_cfg.net.param[k] = v
        return variables
    return convert_vit_state_dict(sd, vit1d=(kind == "vit1d"))


def load_net_params(model_cfg, model_path, rng):
    """Instantiate ``model_cfg`` and restore its net params from either an
    orbax checkpoint dir or a reference torch ``.pt`` — the shared body of the
    experiments' ``load_energy_model``. Returns ``(model, params, migrated)``.
    """
    import jax
    import jax.numpy as jnp

    from vit4hep_tpu.utils.checkpoint import load_checkpoint
    from vit4hep_tpu.utils.config import instantiate

    converted = maybe_convert_net_checkpoint(model_cfg, model_path)
    model = instantiate(model_cfg)
    template = model.init_params(rng)
    if converted is not None:
        restored = {"params": converted}
    else:
        restored = load_checkpoint(model_path, target={"params": template})
    params = jax.tree.map(
        lambda t, r: jnp.asarray(r, t.dtype), template, restored["params"]
    )
    return model, params, converted is not None


def net_kind_from_target(target: str) -> str:
    """Classify a ``net._target_`` (reference- or native-style module path)
    for checkpoint conversion. Energy patterns are checked before the ViT
    ones — this package's own module prefix contains "vit"."""
    if "transformer_cfm" in target or "ParallelTransformer" in target or "MLPTransformer" in target:
        return "energy"
    if "ViT1D" in target:
        return "vit1d"
    if target.rsplit(".", 1)[-1] == "ViT" or "vit.ViT" in target:
        return "vit"
    raise ValueError(
        f"No torch-checkpoint converter for net target '{target}' "
        "(supported: ViT, ViT1D, ParallelTransformer)"
    )


def _trainable_param_names(model_sd, kind):
    """Reconstruct torch's ``[p for p in model.parameters() if p.requires_grad]``
    name order from a state dict: registration order, minus non-trainable
    parameters/buffers and shared-module duplicate paths."""
    names = []
    for k in model_sd:
        leaf = k.split(".")[-1]
        if leaf in _BUFFER_KEYS or k in _BUFFER_KEYS:
            continue  # buffers + attn_mask (requires_grad=False)
        if kind == "cinn" and leaf in _CINN_BUFFER_LEAVES:
            continue  # permutation indices + spline-base buffers
        if kind == "energy":
            if k == "time_embed.0.W":  # frozen GaussianFourier weights
                continue
            if k.startswith("layers.0."):  # alias of `layer` (same module)
                continue
        names.append(k)
    return names


def convert_ema_state_dict(ema_sd, model_sd, kind, coupling_block=None):
    """Convert a torch_ema ``ExponentialMovingAverage.state_dict()`` to Flax
    variables by pairing ``shadow_params`` (ordered over trainable parameters)
    with the model state dict's parameter names, then reusing the per-net
    converter. ``model_sd`` must be the prefix-stripped model state dict from
    the same checkpoint; ``kind`` is :func:`net_kind_from_target`'s output
    (or ``"cinn"`` with ``coupling_block`` set for GraphINN checkpoints).
    """
    shadows = ema_sd["shadow_params"]
    names = _trainable_param_names(model_sd, kind)
    if len(names) != len(shadows):
        raise ValueError(
            f"EMA shadow count {len(shadows)} != trainable-param count "
            f"{len(names)} — unknown architecture variant?"
        )
    shadow_sd = {}
    for name, tensor in zip(names, shadows):
        if tuple(_to_np(tensor).shape) != tuple(_to_np(model_sd[name]).shape):
            raise ValueError(f"EMA shadow shape mismatch at {name}")
        shadow_sd[name] = tensor
    if kind == "cinn":
        # permutation indices are structural (not EMA'd); reinstate them so
        # the GraphINN converter sees a complete [coupling, permute] graph
        for name, tensor in model_sd.items():
            if name.split(".")[-1] in ("perm", "perm_inv"):
                shadow_sd[name] = tensor
        params, _ = convert_cinn_state_dict(shadow_sd, coupling_block)
        return {"params": params}
    if kind == "energy":
        # the head's first Linear is registered as `layer` (its position in
        # parameters() order) but the converter maps it via its `layers.0`
        # Sequential alias
        for suffix in ("weight", "bias"):
            shadow_sd[f"layers.0.{suffix}"] = shadow_sd.pop(f"layer.{suffix}")
        shadow_sd["time_embed.0.W"] = model_sd["time_embed.0.W"]
        variables, _ = convert_energy_state_dict(shadow_sd)
        return variables
    return convert_vit_state_dict(shadow_sd, vit1d=(kind == "vit1d"))
