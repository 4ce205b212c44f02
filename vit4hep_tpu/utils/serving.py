"""AOT sampler export for deployment/serving (beyond reference parity).

The reference has no deployment story: serving a trained model means a full
python environment with torch + FrEIA + the repo, and the sampling loop of
``experiments/calochallenge/experiment.py:219-221`` re-dispatches per batch.
Here the one-XLA-program-per-batch design pays off: the ENTIRE sampling
program (prior draw, the RK4 ``lax.scan`` with every net eval, inverse flow,
any Pallas kernels) is a single StableHLO module, so ``jax.export`` can
serialize it — with the trained parameters baked in as constants — into one
self-contained artifact that runs from any JAX process (no model code, no
config system, no checkpoint layout) on the platform(s) it was lowered for.

Artifact layout: ``VIT4HEP1`` magic, 4-byte little-endian JSON header length,
JSON header (shapes, platforms, user metadata), then the ``jax.export``
serialization. The exported callable has the fixed signature

    sample(cond: f32[batch, cond_dim], seed: i32[]) -> samples

where ``seed`` feeds ``jax.random.PRNGKey`` inside the program, so callers
need no JAX-key plumbing.

Notes:
- The batch size is static by design (XLA compiles per shape; serving batches
  are fixed). Export one artifact per batch size you serve.
- Export lowers for the CURRENT default backend unless ``platforms`` is
  given. Cross-platform export (e.g. lowering for ``tpu`` from a CPU host)
  works for pure-XLA models, but models routing through Pallas kernels must
  be exported from a process attached to the target platform — off-TPU the
  kernels trace in interpreter mode (ops/pallas_utils.py) and the artifact
  would bake that.
"""

from __future__ import annotations

import io
import json
import struct

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"VIT4HEP1"


def export_sampler(model, params, batch: int, *, cond_dim: int | None = None,
                   platforms=None, meta: dict | None = None) -> bytes:
    """Serialize ``model.sample_batch`` closed over ``params`` as an AOT
    artifact for ``batch`` conditions.

    ``model`` is any generative model with the framework's uniform surface
    ``sample_batch(params, cond, rng)`` and a ``condition_dim`` attribute
    (CFM, cINN, and every dataset family; models/cfm.py:111).
    """
    if cond_dim is None:
        cond_dim = int(model.condition_dim)

    def sample(cond, seed):
        return model.sample_batch(params, cond, jax.random.PRNGKey(seed))

    args = (
        jax.ShapeDtypeStruct((batch, cond_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax.export.export(jax.jit(sample), **kwargs)(*args)

    header = {
        "version": 1,
        "batch": int(batch),
        "cond_dim": int(cond_dim),
        "out_shape": [int(s) for s in exported.out_avals[0].shape],
        "platforms": list(exported.platforms),
        "model": type(model).__name__,
        "meta": meta or {},
    }
    hdr = json.dumps(header).encode()
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(struct.pack("<I", len(hdr)))
    buf.write(hdr)
    buf.write(exported.serialize())
    return buf.getvalue()


def export_generator(shape_model, shape_params, energy_model, energy_params,
                     energy_transforms, shape_transforms, batch: int, *,
                     cond_dim: int | None = None, platforms=None,
                     u_position="first", energy_cond_width=None,
                     meta: dict | None = None) -> bytes:
    """Serialize the FULL two-stage generation chain — energy-model RK4,
    on-device u mapping, shape-model RK4 (experiments/fused_chain.py) — as
    one AOT artifact: ``generate(E_cond: f32[batch, cond_dim], seed) ->
    showers``. The user-facing product (reference experiments/calochallenge/
    experiment.py:170-247) as a single self-contained program, both
    parameter sets and the transform constants baked in.

    ``u_position``/``energy_cond_width`` select the per-family cond
    composition (see make_fused_generate); when ``cond_dim`` is None it is
    derived as shape_model.condition_dim minus the energy model's u width,
    so families whose shape cond carries extra columns beyond the energy
    cond (LEMURS labels, CaloHadronic FT extras) export correctly."""
    from vit4hep_tpu.experiments.fused_chain import make_fused_generate

    gen = make_fused_generate(shape_model, energy_model, energy_transforms,
                              shape_transforms, u_position=u_position,
                              energy_cond_width=energy_cond_width)
    if cond_dim is None:
        e_width = int(energy_cond_width
                      if energy_cond_width is not None
                      else energy_model.condition_dim)
        u_width = jax.eval_shape(
            energy_model.sample_batch, energy_params,
            jax.ShapeDtypeStruct((batch, e_width), jnp.float32),
            jax.random.PRNGKey(0),
        ).shape[-1]
        cond_dim = int(shape_model.condition_dim) - int(u_width)

    def generate(cond, seed):
        shower, _ = gen(shape_params, energy_params, cond,
                        jax.random.PRNGKey(seed))
        return shower

    args = (
        jax.ShapeDtypeStruct((batch, cond_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = jax.export.export(jax.jit(generate), **kwargs)(*args)

    header = {
        "version": 1,
        "kind": "generator",
        "batch": int(batch),
        "cond_dim": int(cond_dim),
        "u_position": str(u_position),
        "energy_cond_width": (None if energy_cond_width is None
                              else int(energy_cond_width)),
        "out_shape": [int(s) for s in exported.out_avals[0].shape],
        "platforms": list(exported.platforms),
        "model": f"{type(energy_model).__name__}+{type(shape_model).__name__}",
        "meta": meta or {},
    }
    hdr = json.dumps(header).encode()
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(struct.pack("<I", len(hdr)))
    buf.write(hdr)
    buf.write(exported.serialize())
    return buf.getvalue()


def save_generator(path, *args, **kwargs) -> dict:
    blob = export_generator(*args, **kwargs)
    with open(path, "wb") as f:
        f.write(blob)
    return read_header(path)


def save_sampler(path, model, params, batch: int, **kwargs) -> dict:
    blob = export_sampler(model, params, batch, **kwargs)
    with open(path, "wb") as f:
        f.write(blob)
    return read_header(path)


def read_header(path) -> dict:
    with open(path, "rb") as f:
        if f.read(8) != _MAGIC:
            raise ValueError(f"{path} is not a vit4hep sampler artifact")
        (n,) = struct.unpack("<I", f.read(4))
        return json.loads(f.read(n).decode())


class LoadedSampler:
    """A deserialized sampler artifact: ``sampler(cond, seed) -> np.ndarray``.

    The underlying program is jit-compiled on first call (per process) and
    cached after; ``header`` carries the shapes and user metadata recorded at
    export time.
    """

    def __init__(self, header: dict, exported):
        self.header = header
        self._exported = exported
        self._call = jax.jit(exported.call)

    @property
    def batch(self) -> int:
        return self.header["batch"]

    @property
    def cond_dim(self) -> int:
        return self.header["cond_dim"]

    def __call__(self, cond, seed: int = 0):
        cond = jnp.asarray(cond, jnp.float32)
        if cond.shape != (self.batch, self.cond_dim):
            raise ValueError(
                f"artifact was exported for cond shape "
                f"({self.batch}, {self.cond_dim}), got {tuple(cond.shape)}"
            )
        return np.asarray(self._call(cond, jnp.int32(seed)))


def load_sampler(path) -> LoadedSampler:
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:8] != _MAGIC:
        raise ValueError(f"{path} is not a vit4hep sampler artifact")
    (n,) = struct.unpack("<I", blob[8:12])
    header = json.loads(blob[12:12 + n].decode())
    exported = jax.export.deserialize(bytearray(blob[12 + n:]))
    return LoadedSampler(header, exported)
