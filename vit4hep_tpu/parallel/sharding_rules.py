"""Tensor-parallel parameter sharding over the mesh's ``model`` axis.

The reference only ever does data parallelism (SURVEY.md section 2.2); the
mesh here is 2-D ``(data, model)`` from day one, and this module makes the
``model`` axis real: Megatron-style column/row sharding of the transformer
matmuls, expressed as ``NamedSharding`` placements on the parameter tree. XLA's
SPMD partitioner then derives the activation shardings and inserts the
all-reduces after the attention out-projection and the MLP down-projection —
no hand-written collectives (the "pick a mesh, annotate shardings, let XLA
insert collectives" recipe).

Rules (by trailing parameter path):
- qkv / MLP up-projection kernels (H, K*H): column-parallel  -> P(None, "model")
- attention out / MLP down kernels (K*H, H): row-parallel    -> P("model", None)
- column-parallel biases shard with their outputs            -> P("model")
- everything else (embedders, norms, adaLN, final layer)     -> replicated
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from vit4hep_tpu.parallel.mesh import MODEL_AXIS

# (module, dense, leaf) path suffixes of the tensor-parallel matmuls
_COLUMN_KERNELS = (("Attention_0", "Dense_0"), ("MlpBlock_0", "Dense_0"))
_ROW_KERNELS = (("Attention_0", "Dense_1"), ("MlpBlock_0", "Dense_1"))


def _path_names(path) -> tuple:
    names = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is not None:
            names.append(str(key))
    return tuple(names)


def spec_for_path(path_names: tuple) -> P:
    """PartitionSpec for a parameter identified by its (possibly nested) path.

    Works on raw param trees and on optimizer-state trees (adam's mu/nu mirror
    the param structure, so the same trailing names appear there).
    """
    if len(path_names) < 2:
        return P()
    suffix3 = tuple(path_names[-3:])
    leaf = path_names[-1]
    mod_dense = suffix3[:2] if len(suffix3) == 3 else ()
    if leaf == "kernel":
        if mod_dense in _COLUMN_KERNELS:
            return P(None, MODEL_AXIS)
        if mod_dense in _ROW_KERNELS:
            return P(MODEL_AXIS, None)
    if leaf == "bias" and mod_dense in _COLUMN_KERNELS:
        return P(MODEL_AXIS)
    return P()


def shard_tree(tree, mesh):
    """Place a pytree on the mesh with tensor-parallel specs where the path
    matches a transformer matmul, replicated otherwise. Leaves whose sharded
    dimension is not divisible by the model-axis size stay replicated."""
    n_model = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        spec = spec_for_path(_path_names(path)) if n_model > 1 else P()
        if spec != P():
            # all named axes must divide the corresponding dim
            for dim, axis in enumerate(spec):
                if axis is not None and leaf.shape[dim] % n_model != 0:
                    spec = P()
                    break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
