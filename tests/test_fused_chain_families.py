"""Device twins for the dict-protocol families (LEMURS/CaloHadronic/CaloGAN).

The staged sample_us path of these families applies their dict-protocol
transforms to a u-only ``{"extra_dims": u}`` dict (experiments/lemurs.py
:206-213 and twins in calogan/calohadronic); the fused chain's registered
twins (experiments/fused_chain.py) must reproduce exactly that action —
forward and reverse — for every u-transform class each family ships.

Also covered: the unfitted-stats -> UnsupportedTransform guard (advisor
round-4 #2), the transform-state fingerprint used to key the jitted-chain
cache (advisor #3), and the per-family cond composition of
make_fused_generate (u last for CaloGAN, energy_cond_width for LEMURS).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit4hep_tpu.experiments.fused_chain import (
    UnsupportedTransform, chain_fingerprint, device_u_chain,
    make_fused_generate)


def _dict_apply(t, u, rev):
    d = t({"extra_dims": np.array(u)}, rev=rev)
    return np.asarray(d["extra_dims"], np.float32)


def _twin_apply(t, u, rev):
    if rev:
        fn = device_u_chain([t], [])
    else:
        fn = device_u_chain([], [t])
    return np.asarray(fn(jnp.asarray(u)))


def _assert_twin_matches(t, u):
    for rev in (False, True):
        np.testing.assert_allclose(
            _twin_apply(t, u, rev), _dict_apply(t, u, rev),
            rtol=2e-5, atol=2e-6,
            err_msg=f"{type(t).__name__} rev={rev}")


def _write_stats(d, mean, std, mean_u=None, std_u=None):
    np.save(d / "means.npy", np.float32(mean))
    np.save(d / "stds.npy", np.float32(std))
    if mean_u is not None:
        np.save(d / "means_u.npy", np.asarray(mean_u, np.float32))
        np.save(d / "stds_u.npy", np.asarray(std_u, np.float32))


@pytest.fixture
def u():
    rng = np.random.default_rng(0)
    # strictly inside (0, 1) so the logit forward is exercised off its clip
    return rng.uniform(0.05, 0.95, size=(16, 7)).astype(np.float32)


def test_lemurs_twins_match_staged(tmp_path, u):
    from vit4hep_tpu.data.lemurs import transforms as T

    _write_stats(tmp_path, 0.3, 1.7, np.linspace(-1, 1, 7),
                 np.linspace(0.5, 2.0, 7))
    for t in (
        T.LEMURSGlobalStandardizeFromFile(tmp_path),
        T.LEMURSStandardizeUsFromFile(7, tmp_path),
        T.LEMURSScaleTotalEnergy(2.5),
        T.LEMURSExclusiveLogitTransform(1e-6, rescale=True),
        T.LEMURSExclusiveLogitTransform(1e-3, rescale=False),
    ):
        _assert_twin_matches(t, u)


def test_calohadronic_twins_match_staged(tmp_path, u):
    from vit4hep_tpu.data.calohadronic import transforms as T

    _write_stats(tmp_path, -0.1, 2.2, np.linspace(-2, 2, 7),
                 np.linspace(0.1, 1.5, 7))
    for t in (
        T.CaloHadGlobalStandardizeFromFile(tmp_path),
        T.CaloHadStandardizeUsFromFile(7, tmp_path),
        T.CaloHadScaleTotalEnergy(0.8),
        T.CaloHadExclusiveLogitTransform(1e-6, rescale=True),
        T.CaloHadExclusiveLogitTransform(1e-3, rescale=False),
    ):
        _assert_twin_matches(t, u)


def test_calogan_twins_match_staged(tmp_path, u):
    from vit4hep_tpu.data.calogan import transforms as T

    _write_stats(tmp_path, 0.05, 0.9)
    for t in (
        T.GlobalStandardizeFromFileGAN(tmp_path),
        T.ExclusiveLogitTransformGAN(1e-6, rescale=True),
        T.ExclusiveLogitTransformGAN(1e-3, rescale=False),
    ):
        _assert_twin_matches(t, u)


def test_unfitted_stats_raise_unsupported(tmp_path):
    """A *FromFile transform whose stats were never fitted (written=False)
    must surface as UnsupportedTransform so sample_n falls back to the
    staged path (which fits stats on the fly) instead of crashing."""
    from vit4hep_tpu.data.lemurs import transforms as T

    t = T.LEMURSGlobalStandardizeFromFile(tmp_path / "empty")
    assert not t.written
    with pytest.raises(UnsupportedTransform, match="no fitted stats"):
        device_u_chain([], [t])


def test_chain_fingerprint_tracks_state(tmp_path):
    from vit4hep_tpu.data.lemurs import transforms as T

    _write_stats(tmp_path, 0.3, 1.7)
    t = T.LEMURSGlobalStandardizeFromFile(tmp_path)
    f0 = chain_fingerprint([t], [])
    assert f0 == chain_fingerprint([t], [])
    t.mean = t.mean + 1.0  # a refit must invalidate the cached chain
    assert chain_fingerprint([t], []) != f0
    # list placement matters (energy rev vs shape fwd)
    t2 = T.LEMURSScaleTotalEnergy(2.0)
    assert chain_fingerprint([t, t2], []) != chain_fingerprint([t], [t2])


class _StubModel:
    """sample_batch echoes a deterministic function of (params, cond)."""

    def __init__(self, out_dim, condition_dim):
        self.out_dim = out_dim
        self.condition_dim = condition_dim

    def sample_batch(self, params, cond, key):
        # record the cond width seen via the output content
        base = jnp.sum(cond, axis=1, keepdims=True) + params
        return jnp.tile(base, (1, self.out_dim))


def test_generate_cond_layouts():
    e = _StubModel(out_dim=4, condition_dim=3)
    s = _StubModel(out_dim=2, condition_dim=9)
    cond = jnp.arange(10.0, dtype=jnp.float32).reshape(2, 5)
    key = jax.random.PRNGKey(0)

    # default: full_cond = [u | cond], energy sees the full cond
    gen = make_fused_generate(s, e, [], [])
    _, full = gen(0.0, 0.0, cond, key)
    u = jnp.tile(jnp.sum(cond, axis=1, keepdims=True), (1, 4))
    np.testing.assert_allclose(full, jnp.concatenate([u, cond], axis=1))

    # CaloGAN: full_cond = [cond | u]
    gen = make_fused_generate(s, e, [], [], u_position="last")
    _, full = gen(0.0, 0.0, cond, key)
    np.testing.assert_allclose(full, jnp.concatenate([cond, u], axis=1))

    # LEMURS: the energy model conditions on only the first k columns
    gen = make_fused_generate(s, e, [], [], energy_cond_width=3)
    _, full = gen(0.0, 0.0, cond, key)
    u3 = jnp.tile(jnp.sum(cond[:, :3], axis=1, keepdims=True), (1, 4))
    np.testing.assert_allclose(full, jnp.concatenate([u3, cond], axis=1))


def test_export_generator_derives_cond_dim():
    """cond_dim defaults to shape.condition_dim - u_width so families whose
    shape cond carries extra columns (labels) export the right signature."""
    from vit4hep_tpu.utils.serving import export_generator, read_header
    import io, json, struct  # noqa: E401

    e = _StubModel(out_dim=4, condition_dim=3)
    s = _StubModel(out_dim=2, condition_dim=9)
    blob = export_generator(s, jnp.float32(0.0), e, jnp.float32(0.0),
                            [], [], batch=2, energy_cond_width=3)
    (n,) = struct.unpack("<I", blob[8:12])
    header = json.loads(blob[12:12 + n].decode())
    assert header["cond_dim"] == 5  # 9 - u_width(4)
    assert header["energy_cond_width"] == 3
