"""Core ops: ODE integrators, patching round-trips, positional embeddings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit4hep_tpu.ops import ode, patching, pos_embed


# ---------------------------------------------------------------------------
# ODE integrators
# ---------------------------------------------------------------------------
def test_odeint_linear_exact():
    # dy/dt = a  ->  y(1) = y0 + a, exact for all methods
    a = 3.0
    y0 = jnp.ones((4,))
    for method in ("euler", "midpoint", "rk4", "rk4_classic"):
        y1 = ode.odeint(lambda t, y: a * jnp.ones_like(y), y0, method=method, step_size=0.05)
        np.testing.assert_allclose(np.asarray(y1), 4.0, rtol=1e-6)


def test_odeint_exponential_convergence():
    # dy/dt = y  ->  y(1) = e; rk4 at h=0.05 should be ~1e-9 accurate
    y0 = jnp.array([1.0])
    y1 = ode.odeint(lambda t, y: y, y0, method="rk4", step_size=0.05)
    assert abs(float(y1[0]) - np.e) < 1e-6
    y1c = ode.odeint(lambda t, y: y, y0, method="rk4_classic", step_size=0.05)
    assert abs(float(y1c[0]) - np.e) < 1e-6
    y1e = ode.odeint(lambda t, y: y, y0, method="euler", step_size=0.05)
    assert abs(float(y1e[0]) - np.e) > 1e-3  # euler visibly worse


def test_odeint_time_dependent():
    # dy/dt = 2t -> y(1) = y0 + 1 (rk4 exact for polynomials up to degree 4)
    y1 = ode.odeint(lambda t, y: 2 * t * jnp.ones_like(y), jnp.zeros((2,)), method="rk4")
    np.testing.assert_allclose(np.asarray(y1), 1.0, rtol=1e-5)


def test_parse_odeint_kwargs():
    kw = ode.parse_odeint_kwargs({"method": "rk4", "options": {"step_size": 0.05}})
    assert kw == {"method": "rk4", "step_size": 0.05}
    assert ode.parse_odeint_kwargs(None) == {"method": "rk4"}


def test_odeint_is_jittable():
    f = jax.jit(lambda y0: ode.odeint(lambda t, y: -y, y0, step_size=0.1))
    out = f(jnp.ones((8, 3)))
    np.testing.assert_allclose(np.asarray(out), np.exp(-1.0), rtol=1e-5)


# ---------------------------------------------------------------------------
# patching
# ---------------------------------------------------------------------------
def test_patch_roundtrip_ds2():
    # ds2 layout: shape (45,16,9), patches (3,16,1) -> 135 tokens x 48
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 45, 16, 9)))
    tok = patching.to_patches(x, (3, 16, 1))
    assert tok.shape == (2, 135, 48)
    back = patching.from_patches(tok, (15, 1, 9), (3, 16, 1))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_patch_roundtrip_multichannel():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 2, 8, 4, 6)))
    tok = patching.to_patches(x, (2, 2, 3))
    assert tok.shape == (3, 4 * 2 * 2, 2 * 2 * 3 * 2)
    back = patching.from_patches(tok, (4, 2, 2), (2, 2, 3))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_multisection_roundtrip():
    # two sections like ds1: (3,4,2)=24 voxels and (2,2,6)=24 voxels
    list_shape = [(3, 4, 2), (2, 2, 6)]
    list_edges = [24, 24]
    p = patching.MultiSectionPatcher(list_shape, list_edges, (1, 2, 2), in_channels=1)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(5, 1, 48)))
    tok = p.to_patches(x)
    assert tok.shape == (5, p.total_patches, p.patch_dim)
    back = p.from_patches(tok)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_multisection_per_section_patches():
    # CaloGAN-style per-section patch shapes with equal patch_dim
    list_shape = [(1, 4, 4), (1, 2, 8)]
    p = patching.MultiSectionPatcher(
        list_shape, [16, 16], [(1, 2, 2), (1, 1, 4)], in_channels=1
    )
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 1, 32)))
    back = p.from_patches(p.to_patches(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_multisection_rejects_mismatched_patch_dim():
    with pytest.raises(AssertionError):
        patching.MultiSectionPatcher([(2, 2, 2), (2, 2, 2)], [8, 8], [(1, 2, 2), (2, 2, 2)])


# ---------------------------------------------------------------------------
# positional embeddings
# ---------------------------------------------------------------------------
def test_meshgrid_multisection_layer_normalization():
    pos_z, pos_y, pos_x = pos_embed.create_meshgrid(((2, 2, 2), (3, 1, 1)))
    assert len(pos_z) == 8 + 3
    # depth axis spans sections continuously: 5 total layers normalized by 5
    np.testing.assert_allclose(np.unique(pos_z), np.arange(5) / 5)
    # second section alpha/r grids are their own normalization
    np.testing.assert_allclose(np.unique(pos_y[8:]), [0.0])


def test_timestep_embedding_formula():
    t = jnp.asarray([[0.3], [0.7]])
    emb = pos_embed.timestep_embedding(t, 8, max_period=10000)
    assert emb.shape == (2, 8)
    freqs = np.exp(-np.log(10000) * np.arange(4) / 4)
    np.testing.assert_allclose(np.asarray(emb[0, :4]), np.cos(0.3 * freqs), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), np.sin(0.3 * freqs), rtol=1e-5)


def test_sincos_embeddings_shapes():
    pe_cyl = pos_embed.get_3d_cylindrical_sincos_pos_embed((5, 4, 3), 36)
    assert pe_cyl.shape == (60, 36)
    assert np.all(np.abs(pe_cyl) <= 1.0)
    pe_cart = pos_embed.get_3d_cartesian_sincos_pos_embed((5, 4, 3), 36)
    assert pe_cart.shape == (60, 36)
    assert np.all(np.abs(pe_cart) <= 1.0)


def test_learnable_fourier_embed_dims():
    freqs = jnp.ones((5,))
    pos_z, pos_y, pos_x = pos_embed.create_meshgrid(((3, 2, 2),))
    pe = pos_embed.learnable_fourier_pos_embed_3d(
        freqs, jnp.asarray(pos_z), jnp.asarray(pos_y), jnp.asarray(pos_x)
    )
    assert pe.shape == (12, 30)
    pe1 = pos_embed.learnable_fourier_pos_embed_1d(jnp.ones((4,)), jnp.arange(6) / 6)
    assert pe1.shape == (6, 8)


def test_layer_causal_mask():
    mask = pos_embed.layer_causal_mask((3, 2, 2))
    assert mask.shape == (12, 12)
    # token 0 (layer 0) cannot see layer 1 tokens; token 4 (layer 1) sees layer 0
    assert not mask[0, 4]
    assert mask[4, 0]
    assert mask[4, 7] and not mask[4, 8]


def test_gaussian_fourier_projection():
    w = jnp.asarray([1.0, 2.0])
    out = pos_embed.gaussian_fourier_projection(jnp.asarray([[0.5]]), w)
    expected = np.concatenate(
        [np.sin([0.5 * 2 * np.pi, 0.5 * 2 * 2 * np.pi]), np.cos([np.pi, 2 * np.pi])]
    )
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-6)


def test_odeint_truncated_final_step():
    """Non-dividing step_size follows torchdiffeq's fixed grid: full steps of
    step_size plus one truncated final step — not n equal steps of a rounded
    size. Euler on dy/dt = t over [0,1] with step 0.4 sums t_i * dt_i over
    the grid [0, 0.4, 0.8, 1.0]: 0*0.4 + 0.4*0.4 + 0.8*0.2 = 0.32."""
    import jax.numpy as jnp

    y = ode.odeint(lambda t, y: t * jnp.ones_like(y), jnp.zeros(()),
                   method="euler", step_size=0.4)
    assert float(y) == pytest.approx(0.32, abs=1e-6)
    # dividing step sizes are untouched
    y = ode.odeint(lambda t, y: t * jnp.ones_like(y), jnp.zeros(()),
                   method="euler", step_size=0.25)
    assert float(y) == pytest.approx(0.25 * (0 + 0.25 + 0.5 + 0.75), abs=1e-6)
