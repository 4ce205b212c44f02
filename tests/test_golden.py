"""Golden-value tests: tiny fixed-seed forwards locked against stored values
(SURVEY.md section 4.2 — protects the numerics across refactors).

The expected values were produced by this implementation at the commit that
introduced this file; any change to initialization, embedding conventions, or
layer math will shift them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _mean_abs(x):
    return float(jnp.mean(jnp.abs(x)))


@pytest.fixture(scope="module")
def golden():
    # regenerate with: python -m tests.test_golden (prints current values)
    return {
        "vit_forward": 0.5000242590904236,
        "energy_net_forward": 0.17991949617862701,
        "vit1d_forward": 0.0,  # zero-init FinalLayer -> exactly zero at init
        "rqs_nflows": 1.7880690097808838,
        "rqs_binned": 3.280629873275757,
    }


def _vit_out():
    from vit4hep_tpu.models.vit import ViT

    net = ViT({
        "dim": 3, "condition_dim": 4, "hidden_dim": 48, "depth": 2,
        "num_heads": 2, "mlp_ratio": 2.0, "num_patches": [[3, 2, 2]],
        "patch_dim": 6, "learn_pos_embed": True,
    })
    k = jax.random.PRNGKey(42)
    x = jax.random.normal(jax.random.fold_in(k, 1), (2, 12, 6))
    t = jnp.full((2, 1), 0.3)
    c = jax.random.normal(jax.random.fold_in(k, 2), (2, 4))
    params = net.init(k, x, t, c)
    # FinalLayer is zero-init -> output 0 at init; perturb the final kernel to
    # expose the full path
    fl = params["params"]["final_layer"]["Dense_0"]
    fl["kernel"] = jax.random.normal(jax.random.fold_in(k, 9), fl["kernel"].shape) * 0.1
    return net.apply(params, x, t, c)


def _energy_out():
    from vit4hep_tpu.models.energy_transformer import ParallelTransformer

    net = ParallelTransformer({
        "dims_in": 5, "dims_c": 1, "dim_embedding": 16, "nhead": 2,
        "num_encoder_layers": 1, "num_decoder_layers": 1, "dim_feedforward": 32,
        "embeds": True, "encode_t_dim": 16,
    })
    k = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.fold_in(k, 1), (2, 5))
    t = jnp.full((2, 1), 0.5)
    c = jax.random.normal(jax.random.fold_in(k, 2), (2, 1))
    params = net.init(k, x, t, c)
    return net.apply(params, x, t, c)


def _vit1d_out():
    from vit4hep_tpu.models.vit import ViT1D

    net = ViT1D({
        "dim": 1, "condition_dim": 3, "hidden_dim": 32, "depth": 1,
        "num_heads": 2, "mlp_ratio": 1.0, "patch_dim": 4,
        "prod_num_patches": 6, "x_out": 2, "learn_pos_embed": True,
    })
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.fold_in(k, 1), (2, 6, 4))
    c = jax.random.normal(jax.random.fold_in(k, 2), (2, 3))
    params = net.init(k, x, c)
    return net.apply(params, x, c)


def _rqs_vals():
    from vit4hep_tpu.ops import rqs

    k = jax.random.PRNGKey(11)
    theta = jax.random.normal(jax.random.fold_in(k, 1), (4, 3, 3 * 6 - 1)) * 0.5
    x = jax.random.uniform(jax.random.fold_in(k, 2), (4, 3), minval=-3, maxval=3)
    y1, _ = rqs.nflows_rqs(x, theta, 6, 4.0)

    theta2 = jax.random.normal(jax.random.fold_in(k, 3), (4, 3, 2 * 6 + 5 + 2)) * 0.5
    params = rqs.binned_constrain(theta2, 6, (0.01, 0.01), (-8.0, 8.0, -8.0, 8.0), False, None)
    y2, _ = rqs.binned_rqs(x * 2, params)
    return y1, y2


def test_vit_golden(golden):
    assert _mean_abs(_vit_out()) == pytest.approx(golden["vit_forward"], rel=1e-4)


def test_energy_net_golden(golden):
    assert _mean_abs(_energy_out()) == pytest.approx(golden["energy_net_forward"], rel=1e-4)


def test_vit1d_zero_init(golden):
    # adaLN-Zero + zero-init output: subnet is exactly zero at init
    assert _mean_abs(_vit1d_out()) == golden["vit1d_forward"]


def test_rqs_golden(golden):
    y1, y2 = _rqs_vals()
    assert _mean_abs(y1) == pytest.approx(golden["rqs_nflows"], rel=1e-4)
    assert _mean_abs(y2) == pytest.approx(golden["rqs_binned"], rel=1e-4)


if __name__ == "__main__":
    # force CPU: the axon TPU plugin overrides JAX_PLATFORMS from the env
    jax.config.update("jax_platforms", "cpu")
    print("vit_forward:", _mean_abs(_vit_out()))
    print("energy_net_forward:", _mean_abs(_energy_out()))
    print("vit1d_forward:", _mean_abs(_vit1d_out()))
    y1, y2 = _rqs_vals()
    print("rqs_nflows:", _mean_abs(y1))
    print("rqs_binned:", _mean_abs(y2))
