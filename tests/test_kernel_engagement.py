"""Prove adopted kernel flags actually engage in the benched programs.

VERDICT r3 weak #3: the official energy capture read at composed-path level
despite the config shipping ``fused_group: 8`` — nothing proved the Pallas
kernel was in the benched HLO. These tests lower each shipped-config program
cross-platform for TPU (``jax.export`` from the CPU host, with
``pallas_utils.force_compiled()`` so kernels trace as real Mosaic custom
calls instead of interpret mode) and assert the ``tpu_custom_call`` count
responds to the flag: present under the shipped config, absent (or strictly
fewer) with the flag turned off. This is trace+lower only — nothing
executes — so it runs in the CPU quick tier.

Programs covered (the bench.py workloads):
- ds2 CFM sampler  — ``fused_block: sample`` (whole-ViT megakernel)
- ds2 CFM train    — ``attn_impl: auto`` (fused-layout attention fwd + bwd)
- cINN ds2 sampler — ``fused_spline: true`` (+ subnet attention kernels)
- energy sampler   — ``fused_block: sample`` + ``fused_group: 8`` decoder
"""

from __future__ import annotations

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit4hep_tpu.ops import pallas_utils
from vit4hep_tpu.utils.config import _load_yaml, instantiate

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(rel):
    return _load_yaml(os.path.join(_REPO, "configs", rel))


def _n_kernels(fn, *args) -> int:
    """Number of Pallas (Mosaic) custom calls in the TPU lowering of fn."""
    with pallas_utils.force_compiled():
        exported = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    return exported.mlir_module().count("tpu_custom_call")


def _sampler_counts(cfg, cond_dim, batch=4):
    model = instantiate(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    cond = jnp.asarray(np.zeros((batch, cond_dim), np.float32))
    key = jax.random.PRNGKey(1)
    return _n_kernels(lambda p, c, k: model.sample_batch(p, c, k),
                      params, cond, key)


def test_ds2_sampler_engages_fused_block():
    cfg = _cfg("model/cfm/cfm_ds2_electrons.yaml")
    assert cfg["net"]["param"]["fused_block"] == "sample"  # shipped flag
    n_shipped = _sampler_counts(cfg, cond_dim=46)
    assert n_shipped >= 1, "whole-ViT megakernel absent from ds2 sampler HLO"

    off = copy.deepcopy(cfg)
    off["net"]["param"]["fused_block"] = False
    off["net"]["param"]["attn_impl"] = "xla"
    assert _sampler_counts(off, cond_dim=46) == 0


def test_ds2_train_engages_fused_attention():
    cfg = _cfg("model/cfm/cfm_ds2_electrons.yaml")

    def counts(cfg):
        model = instantiate(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        x = jnp.zeros((4, 1, 45, 16, 9), jnp.float32)
        c = jnp.zeros((4, 46), jnp.float32)

        def loss_grad(p, x, c, key):
            return jax.grad(lambda p: model.batch_loss(p, x, c, key))(p)

        return _n_kernels(loss_grad, params, x, c, jax.random.PRNGKey(1))

    # shipped: fused_block == "sample" keeps TRAINING on the composed path,
    # whose attention is the fused-layout kernel pair (fwd + bwd custom VJP)
    n_shipped = counts(cfg)
    assert n_shipped >= 2, (
        f"expected fused-layout attention fwd+bwd kernels in the ds2 train "
        f"HLO, found {n_shipped} custom calls")

    off = copy.deepcopy(cfg)
    off["net"]["param"]["attn_impl"] = "xla"
    assert counts(off) == 0


@pytest.mark.slow  # ~4.5 min: 20 coupling blocks x Mosaic lowering x 2 configs
def test_cinn_sampler_engages_fused_spline():
    cfg = _cfg("model/cinn/cinn_ds2_electrons.yaml")
    assert cfg["cinn_kwargs"]["fused_spline"] is True  # shipped flag
    n_shipped = _sampler_counts(cfg, cond_dim=46)

    off = copy.deepcopy(cfg)
    off["cinn_kwargs"]["fused_spline"] = False
    n_off = _sampler_counts(off, cond_dim=46)

    assert n_shipped > n_off, (
        f"fused_spline did not add Pallas calls to the cINN sampler HLO "
        f"({n_shipped} vs {n_off})")
    # the subnets' attention kernels engage independently of the spline flag
    assert n_off >= 1, "subnet attention kernels absent from cINN sampler HLO"


def test_energy_sampler_engages_fused_decoder():
    cfg = _cfg("model/cfm/cfm_ds2_energy.yaml")
    assert cfg["net"]["param"]["fused_block"] == "sample"  # shipped flag
    assert cfg["net"]["param"]["fused_group"] == 8
    n_shipped = _sampler_counts(cfg, cond_dim=1)
    assert n_shipped >= 1, "energy decoder megakernel absent from sampler HLO"

    off = copy.deepcopy(cfg)
    off["net"]["param"]["fused_block"] = False
    n_off = _sampler_counts(off, cond_dim=1)
    assert n_shipped > n_off, (
        f"fused_block did not add Pallas calls to the energy sampler HLO "
        f"({n_shipped} vs {n_off})")
