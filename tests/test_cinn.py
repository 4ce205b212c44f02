"""cINN stack: RQS spline math, coupling invertibility, flow chain, models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit4hep_tpu.ops import rqs


# ---------------------------------------------------------------------------
# spline math
# ---------------------------------------------------------------------------
def test_nflows_rqs_roundtrip(rng):
    num_bins, bound = 8, 5.0
    theta = jnp.asarray(rng.normal(0, 0.5, size=(16, 6, 3 * num_bins - 1)), jnp.float32)
    x = jnp.asarray(rng.uniform(-4.5, 4.5, size=(16, 6)), jnp.float32)
    y, ld = rqs.nflows_rqs(x, theta, num_bins, bound)
    x_back, ld_inv = rqs.nflows_rqs(y, theta, num_bins, bound, rev=True)
    np.testing.assert_allclose(x_back, x, atol=2e-4)
    np.testing.assert_allclose(ld, -ld_inv, atol=2e-3)


def test_nflows_rqs_identity_outside(rng):
    num_bins, bound = 8, 2.0
    theta = jnp.asarray(rng.normal(size=(4, 3, 3 * num_bins - 1)), jnp.float32)
    x = jnp.asarray(rng.uniform(5.0, 9.0, size=(4, 3)), jnp.float32)  # all outside
    y, ld = rqs.nflows_rqs(x, theta, num_bins, bound)
    np.testing.assert_allclose(y, x)
    np.testing.assert_allclose(ld, 0.0)


def test_nflows_rqs_event_mask(rng):
    """One dim outside -> whole event is identity (reference rqs_nflows.py:359)."""
    num_bins, bound = 6, 2.0
    theta = jnp.asarray(rng.normal(size=(2, 3, 3 * num_bins - 1)), jnp.float32)
    x = jnp.asarray([[0.5, 0.5, 5.0], [0.1, -0.3, 0.7]], jnp.float32)
    y, ld = rqs.nflows_rqs(x, theta, num_bins, bound)
    np.testing.assert_allclose(y[0], x[0])  # event 0 untouched
    assert ld[0] == 0.0
    assert not np.allclose(y[1], x[1])


def test_nflows_rqs_logdet_vs_autodiff(rng):
    num_bins, bound = 5, 3.0
    theta = jnp.asarray(rng.normal(0, 0.3, size=(1, 4, 3 * num_bins - 1)), jnp.float32)
    x = jnp.asarray(rng.uniform(-2.5, 2.5, size=(1, 4)), jnp.float32)

    def f(xv):
        y, _ = rqs.nflows_rqs(xv[None], theta, num_bins, bound)
        return y[0]

    jac = jax.jacfwd(f)(x[0])
    _, ld = rqs.nflows_rqs(x, theta, num_bins, bound)
    expected = float(jnp.linalg.slogdet(jac)[1])
    assert float(ld[0]) == pytest.approx(expected, rel=1e-4)


@pytest.mark.parametrize("identity_tails", [False, True])
def test_binned_rqs_roundtrip(rng, identity_tails):
    bins = 10
    n_params = 2 * bins + (bins - 1) + (1 if identity_tails else 2)
    theta = jnp.asarray(rng.normal(0, 0.5, size=(8, 12, n_params)), jnp.float32)
    params = rqs.binned_constrain(
        theta, bins, (0.001, 0.001), (-8.0, 8.0, -8.0, 8.0), identity_tails, None
    )
    x = jnp.asarray(rng.normal(0, 4.0, size=(8, 12)), jnp.float32)  # inside + outside
    y, ld = rqs.binned_rqs(x, params)
    x_back, ld_inv = rqs.binned_rqs(y, params, rev=True)
    np.testing.assert_allclose(x_back, x, atol=3e-4)
    np.testing.assert_allclose(ld, -ld_inv, atol=3e-3)


def test_binned_rqs_affine_tails(rng):
    """Outside the domain the transform is exactly y = scale*x + shift."""
    bins = 4
    theta = jnp.asarray(rng.normal(0, 0.1, size=(2, 3, 2 * bins + bins - 1 + 2)), jnp.float32)
    params = rqs.binned_constrain(theta, bins, (0.01, 0.01), (-2.0, 2.0, -2.0, 2.0), False, None)
    x = jnp.asarray(rng.uniform(10.0, 20.0, size=(2, 3)), jnp.float32)
    y, ld = rqs.binned_rqs(x, params)
    np.testing.assert_allclose(
        y, params["scale"] * x + params["shift"], rtol=1e-5
    )
    np.testing.assert_allclose(ld, jnp.sum(jnp.log(params["scale"]), -1), rtol=1e-5)


def test_binned_rqs_logdet_vs_autodiff(rng):
    bins = 6
    theta = jnp.asarray(rng.normal(0, 0.3, size=(1, 3, 2 * bins + bins - 1 + 2)), jnp.float32)
    params = rqs.binned_constrain(theta, bins, (0.01, 0.01), (-4.0, 4.0, -4.0, 4.0), False, None)
    x = jnp.asarray(rng.uniform(-3.0, 3.0, size=(1, 3)), jnp.float32)

    def f(xv):
        y, _ = rqs.binned_rqs(xv[None], params)
        return y[0]

    jac = jax.jacfwd(f)(x[0])
    _, ld = rqs.binned_rqs(x, params)
    assert float(ld[0]) == pytest.approx(float(jnp.linalg.slogdet(jac)[1]), rel=1e-4)


@pytest.mark.parametrize(
    "identity_tails,clamp,bins", [(False, None, 10), (True, None, 10),
                                  (False, 20.0, 8), (True, 15.0, 5)]
)
def test_fused_spline_kernel_matches_composed(rng, identity_tails, clamp, bins):
    """The single-pass Pallas inverse (ops/fused_spline.py) must reproduce
    binned_constrain + binned_rqs(rev=True) elementwise (interpret mode)."""
    from vit4hep_tpu.ops.fused_spline import fused_binned_rqs_inverse

    n_params = 2 * bins + (bins - 1) + (1 if identity_tails else 2)
    b, d = 6, 52
    theta = jnp.asarray(rng.normal(size=(b, d, n_params)), jnp.float32)
    # spread y across in-domain and affine-tail regions
    y = jnp.asarray(rng.normal(size=(b, d)) * 6, jnp.float32)
    dom = (-8.0, 8.0, -8.0, 8.0)
    params = rqs.binned_constrain(theta, bins, (0.01, 0.01), dom, identity_tails, clamp)
    x_ref, ld_ref = rqs.binned_rqs(y, params, rev=True)
    x_k, ld_k = fused_binned_rqs_inverse(
        y, theta, bins, (0.01, 0.01), dom, identity_tails, clamp, group=4
    )
    np.testing.assert_allclose(x_k, x_ref, atol=5e-5)
    np.testing.assert_allclose(ld_k, ld_ref, atol=5e-4)


@pytest.mark.parametrize("b,group", [(20, 16), (10, 16), (25, 8)])
def test_fused_spline_kernel_non_8smooth_batch(rng, b, group):
    """Batch sizes that are not 8-smooth (the reference's customary 1000, a
    user's 100...) must pad up to a multiple-of-8 group instead of picking a
    divisor group that violates the Mosaic sublane constraint (regression:
    round-3 review finding — _largest_divisor(1000, 16) = 10 failed to
    compile on TPU)."""
    from vit4hep_tpu.ops.fused_spline import fused_binned_rqs_inverse

    bins = 6
    n_params = 2 * bins + (bins - 1) + 2
    d = 12
    theta = jnp.asarray(rng.normal(size=(b, d, n_params)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, d)) * 6, jnp.float32)
    dom = (-8.0, 8.0, -8.0, 8.0)
    params = rqs.binned_constrain(theta, bins, (0.01, 0.01), dom, False, None)
    x_ref, ld_ref = rqs.binned_rqs(y, params, rev=True)
    x_k, ld_k = fused_binned_rqs_inverse(
        y, theta, bins, (0.01, 0.01), dom, False, None, group=group
    )
    assert x_k.shape == (b, d)
    np.testing.assert_allclose(x_k, x_ref, atol=5e-5)
    np.testing.assert_allclose(ld_k, ld_ref, atol=5e-4)


def test_fused_spline_block_matches_composed(rng):
    """BinnedRQSCouplingBlock(fused_spline=True) inverse == composed inverse,
    and the forward (likelihood) direction is untouched by the flag."""
    import flax.linen as fnn

    from vit4hep_tpu.models.bijectors import BinnedRQSCouplingBlock

    class TinySubnet(fnn.Module):
        n_params: int

        @fnn.compact
        def __call__(self, x, c):
            b, t, p = x.shape
            h = jnp.concatenate([x.reshape(b, -1), c], axis=-1)
            h = fnn.tanh(fnn.Dense(32)(h))
            out = fnn.Dense(
                t * p * self.n_params,
                kernel_init=fnn.initializers.normal(0.1),
            )(h)
            return out.reshape(b, t, p * self.n_params)

    def ctor(n_params):
        return TinySubnet(n_params=n_params)

    kw = dict(subnet_ctor=ctor, bins=6, min_bin_sizes=(0.01, 0.01),
              default_domain=(-6.0, 6.0, -6.0, 6.0))
    composed = BinnedRQSCouplingBlock(**kw)
    fused = BinnedRQSCouplingBlock(fused_spline=True, **kw)
    x = jnp.asarray(rng.normal(size=(4, 12, 6)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    params = composed.init(jax.random.PRNGKey(0), x, c)
    y_c, ld_c = composed.apply(params, x, c, method="inverse")
    y_f, ld_f = fused.apply(params, x, c, method="inverse")
    np.testing.assert_allclose(y_f, y_c, atol=5e-5)
    np.testing.assert_allclose(ld_f, ld_c, atol=5e-4)
    f_c = composed.apply(params, x, c, method="forward")
    f_f = fused.apply(params, x, c, method="forward")
    np.testing.assert_allclose(f_f[0], f_c[0], atol=0)

    # remat_spline (round 5): bit-identical forward AND gradients — remat
    # only changes what is saved for the backward, not the math
    remat = BinnedRQSCouplingBlock(remat_spline=True, **kw)

    def loss(block, p):
        y, ld = block.apply(p, x, c, method="forward")
        return jnp.sum(y**2) + jnp.sum(ld)

    l_c, g_c = jax.value_and_grad(lambda p: loss(composed, p))(params)
    l_r, g_r = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(l_r, l_c, atol=0)
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# coupling blocks / flow
# ---------------------------------------------------------------------------
def test_simple_rqs_block_invertible(rng):
    from vit4hep_tpu.models.bijectors import SimpleRQSCouplingBlock

    block = SimpleRQSCouplingBlock(dims_in=7, num_bins=6, bounds_init=10.0)
    # standardized-data regime: trained flows see ~N(0,1) inputs; near the
    # domain edge the inverse is inherently ill-conditioned in f32 (the
    # reference needs f64 there too, rqs_nflows.py:431-478)
    x = jnp.asarray(rng.normal(0, 1, size=(8, 7)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(8, 1)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, c)
    z, ld = block.apply(params, x, c, method="forward")
    x_back, ld_inv = block.apply(params, z, c, method="inverse")
    np.testing.assert_allclose(x_back, x, atol=1e-3)
    np.testing.assert_allclose(ld, -ld_inv, atol=1e-2)


def test_permute_invertible(rng):
    from vit4hep_tpu.models.bijectors import Permute

    x = jnp.asarray(rng.normal(size=(4, 10, 6)), jnp.float32)
    for axis, size in ((1, 10), (2, 6)):
        p = Permute(size=size, axis=axis, seed=3)
        params = p.init(jax.random.PRNGKey(0), x)
        y, _ = p.apply(params, x, method="forward")
        x_back, _ = p.apply(params, y, method="inverse")
        np.testing.assert_allclose(x_back, x)
        assert not np.allclose(y, x)


def _tiny_shape_cinn():
    from vit4hep_tpu.models.calochallenge import CaloChallengeCINN

    return CaloChallengeCINN(
        shape=[4, 4, 2],
        patch_shape=[[1, 2, 1]],
        in_channels=1,
        coupling_block="CaloRQSplineFrEIA",
        nblocks=2,
        is_spatial=[False, True],
        cinn_kwargs={
            "bins": 4,
            "min_bin_sizes": [0.001, 0.001],
            "default_domain": [-8.0, 8.0, -8.0, 8.0],
            "identity_tails": False,
            "domain_clamping": None,
        },
        vit_kwargs={
            "dim": 1, "condition_dim": 5, "hidden_dim": 32, "out_channels": 1,
            "depth": 1, "num_heads": 2, "mlp_ratio": 1.0, "learn_pos_embed": True,
        },
    )


def test_shape_cinn_forward_inverse(rng):
    model = _tiny_shape_cinn()
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(0, 1, size=(3, 1, 4, 4, 2)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(3, 5)), jnp.float32)
    z, ld = model.forward(params, x, c)
    assert z.shape == x.shape
    x_back, ld_inv = model.forward(params, z, c, rev=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), atol=1e-2)


@pytest.mark.slow
def test_shape_cinn_loss_and_sampling(rng):
    model = _tiny_shape_cinn()
    params = model.init_params(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.normal(size=(4, 1, 4, 4, 2)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
    loss = model.batch_loss(params, x, c, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    sample = jax.jit(lambda p, c, k: model.sample_batch(p, c, k))(
        params, c, jax.random.PRNGKey(3)
    )
    assert sample.shape == (4, 1, 4, 4, 2)
    assert np.isfinite(np.asarray(sample)).all()


@pytest.mark.slow
def test_energy_cinn_end_to_end(rng):
    from vit4hep_tpu.models.calochallenge import CaloChallengeEnergyCINN

    model = CaloChallengeEnergyCINN(
        shape=[5],
        coupling_block="RQSplineNFlows",
        nblocks=3,
        cinn_kwargs={"num_bins": 6, "bounds_init": 10},
        subnet_kwargs={"n_layers": 2, "hidden_channels": [32, 32], "dropout": 0.0},
    )
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(6, 5)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(6, 1)), jnp.float32)
    z, ld = model.forward(params, x, c)
    x_back, _ = model.forward(params, z, c, rev=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-3)
    loss = model.batch_loss(params, x, c)
    assert np.isfinite(float(loss))
    sample = model.sample_batch(params, c, jax.random.PRNGKey(1))
    assert sample.shape == (6, 5)


def test_energy_cinn_training_reduces_loss(rng):
    """A few optimization steps on a fixed gaussian-ish dataset lower the NLL."""
    import optax

    from vit4hep_tpu.models.calochallenge import CaloChallengeEnergyCINN

    model = CaloChallengeEnergyCINN(
        shape=[4], coupling_block="RQSplineNFlows", nblocks=2,
        cinn_kwargs={"num_bins": 5, "bounds_init": 8},
        subnet_kwargs={"n_layers": 2, "hidden_channels": [32, 32], "dropout": 0.0},
    )
    params = model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(1.5, 0.5, size=(256, 4)), jnp.float32)
    c = jnp.zeros((256, 1), jnp.float32)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(lambda p: model.batch_loss(p, x, c))(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_cinn_config_instantiation():
    from vit4hep_tpu.utils.config import compose, instantiate

    cfg = compose("configs", "calochallenge/cinn/calochallenge_ds2_noise",
                  overrides=["exp_name=t"])
    model = instantiate(cfg.model)
    assert model.num_patches == (15, 2, 9)
    assert model.shape == (45, 16, 9)

    cfg_e = compose("configs", "model/cinn/cinn_energy")
    model_e = instantiate(cfg_e)
    assert model_e.shape == (45,)


@pytest.mark.parametrize("gin,soft", [(False, False), (True, True)])
def test_all_in_one_block(rng, gin, soft):
    """Legacy AllInOneBlock: affine coupling + permutation + ActNorm invert."""
    from vit4hep_tpu.models.bijectors import AllInOneBlock

    block = AllInOneBlock(dims_in=8, gin_block=gin, permute_soft=soft)
    x = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(6, 2)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, c)
    y, ld = block.apply(params, x, c, method="forward")
    x_back, ld_inv = block.apply(params, y, c, method="inverse")
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), rtol=1e-4, atol=1e-5)
    if gin:
        # volume preserving: logdet == 0
        np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-5)
    # logdet matches autodiff jacobian
    jac = jax.jacfwd(lambda xv: block.apply(params, xv[None], c[:1], method="forward")[0][0])(x[0])
    expected = float(jnp.linalg.slogdet(jac)[1])
    assert float(ld[0]) == pytest.approx(expected, rel=1e-3, abs=1e-4)


def test_elementwise_rqs_block(rng):
    from vit4hep_tpu.models.bijectors import ElementwiseRQSBlock

    block = ElementwiseRQSBlock(dims_in=6, condition_dim=2, bins=5)
    x = jnp.asarray(rng.normal(0, 2, size=(8, 6)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(8, 2)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, c)
    y, ld = block.apply(params, x, c, method="forward")
    x_back, ld_inv = block.apply(params, y, c, method="inverse")
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), atol=1e-2)

    # unconditional: free spline parameters, zero-init -> identity-like map
    block_u = ElementwiseRQSBlock(dims_in=4, condition_dim=0, bins=4,
                                  default_domain=(-4.0, 4.0, -4.0, 4.0))
    xu = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    pu = block_u.init(jax.random.PRNGKey(1), xu)
    yu, _ = block_u.apply(pu, xu, method="forward")
    np.testing.assert_allclose(np.asarray(yu), np.asarray(xu), atol=1e-4)
