"""Transform pipeline: round-trip identities and u-space reconstruction."""

import numpy as np
import pytest

import vit4hep_tpu.data.calochallenge.transforms as T
from vit4hep_tpu.data.xml_handler import XMLHandler, layer_boundaries


@pytest.fixture
def showers(rng, geometry):
    n = 64
    e = 10 ** rng.uniform(3, 6, size=(n, 1)).astype(np.float64)
    s = rng.exponential(1.0, size=(n, geometry["n_voxels"])) * (
        rng.random((n, geometry["n_voxels"])) > 0.3
    )
    s = s / s.sum(1, keepdims=True).clip(1e-9) * e * 0.8
    return s.astype(np.float64), e.astype(np.float64)


def test_xml_handler(geometry):
    xml = XMLHandler("electron", geometry["xml"])
    assert xml.GetTotalNumberOfBins() == geometry["n_voxels"]
    lb = layer_boundaries(geometry["xml"], "electron")
    assert lb[0] == 0 and lb[-1] == geometry["n_voxels"]
    assert len(lb) == geometry["n_layers"] + 1
    etas, phis = xml.GetEtaPhiAllLayers()
    assert len(etas) == geometry["n_layers"]
    assert len(etas[0]) == geometry["n_voxels"] // geometry["n_layers"]


def test_normalize_by_elayer_roundtrip(geometry, showers):
    s, e = showers
    tr = T.NormalizeByElayer(geometry["xml"], "electron")
    out, _ = tr(s.copy(), e)
    n_layers = geometry["n_layers"]
    assert out.shape == (len(s), geometry["n_voxels"] + n_layers)
    # each layer normalized to ~unity (where layer energy > 0)
    sums = np.add.reduceat(out[:, : geometry["n_voxels"]], tr.layer_boundaries[:-1], axis=1)
    layer_E = np.add.reduceat(s, tr.layer_boundaries[:-1], axis=1)
    np.testing.assert_allclose(sums[layer_E > 1e-6], 1.0, rtol=1e-5)
    # u_0 = Etot/Einc
    np.testing.assert_allclose(out[:, geometry["n_voxels"]], s.sum(1) / e[:, 0], rtol=1e-6)
    # full inverse recovers the original shower
    back, _ = tr(out, e, rev=True)
    np.testing.assert_allclose(back, s, rtol=1e-5, atol=1e-7)


def test_logit_roundtrip():
    x = np.random.default_rng(0).uniform(0.01, 0.99, size=(10, 5))
    tr = T.ExclusiveLogitTransform(delta=1e-6, rescale=True)
    y, _ = tr(x, None)
    back, _ = tr(y, None, rev=True)
    np.testing.assert_allclose(back, x, rtol=1e-6)
    tr2 = T.ExclusiveLogitTransform(delta=1e-6, rescale=False)
    y2, _ = tr2(x, None)
    back2, _ = tr2(y2, None, rev=True)
    np.testing.assert_allclose(back2, x, rtol=1e-6)


def test_standardize_from_file_persists(tmp_path, rng):
    x = rng.normal(2.0, 3.0, size=(100, 7))
    tr = T.GlobalStandardizeFromFile(str(tmp_path), exclude_zeros=False)
    y, _ = tr(x, None)
    assert abs(y.mean()) < 1e-6 and abs(y.std(ddof=1) - 1) < 1e-6
    assert (tmp_path / "means.npy").exists() and (tmp_path / "stds.npy").exists()
    # a fresh instance loads the persisted stats (run-dir interop contract)
    tr2 = T.GlobalStandardizeFromFile(str(tmp_path), exclude_zeros=False)
    assert tr2.written
    y2, _ = tr2(x, None)
    np.testing.assert_allclose(y2, y)
    back, _ = tr2(y2, None, rev=True)
    np.testing.assert_allclose(back, x, rtol=1e-6)


def test_standardize_us_from_file(tmp_path, rng):
    x = np.concatenate([rng.normal(size=(50, 10)), rng.normal(5, 2, size=(50, 4))], axis=1)
    tr = T.StandardizeUsFromFile(n_us=4, model_dir=str(tmp_path))
    y, _ = tr(x, None)
    np.testing.assert_allclose(y[:, :10], x[:, :10])  # voxels untouched
    np.testing.assert_allclose(y[:, 10:].mean(0), 0.0, atol=1e-9)
    back, _ = tr(y, None, rev=True)
    np.testing.assert_allclose(back, x, rtol=1e-6)


def test_scale_and_log_transforms(rng):
    s = rng.random((10, 8))
    e = rng.uniform(1e3, 1e6, size=(10, 1))
    for tr in [T.ScaleVoxels(2.5), T.ScaleTotalEnergy(0.35, n_layers=3)]:
        y, _ = tr(s.copy(), e)
        back, _ = tr(y, e, rev=True)
        np.testing.assert_allclose(back, s, rtol=1e-6)
    for tr in [T.LogEnergy(), T.ScaleEnergy(6.9, 13.8)]:
        _, ye = tr(s, e.copy())
        _, back_e = tr(s, ye, rev=True)
        np.testing.assert_allclose(back_e, e, rtol=1e-6)


def test_scale_total_energy_hits_u0_column():
    s = np.ones((2, 10))
    tr = T.ScaleTotalEnergy(0.5, n_layers=4)
    y, _ = tr(s, None)
    np.testing.assert_allclose(y[:, -4], 0.5)
    np.testing.assert_allclose(y[:, -3:], 1.0)
    np.testing.assert_allclose(y[:, :-4], 1.0)


def test_add_features_to_cond_roundtrip(rng):
    x = rng.normal(size=(6, 10))
    c = rng.normal(size=(6, 1))
    tr = T.AddFeaturesToCond(split_index=7)
    x2, c2 = tr(x, c)
    assert x2.shape == (6, 7) and c2.shape == (6, 4)
    x3, c3 = tr(x2, c2, rev=True)
    np.testing.assert_allclose(x3, x)
    np.testing.assert_allclose(c3, c)


def test_reshape_roundtrip(rng):
    x = rng.normal(size=(4, 24))
    tr = T.Reshape([1, 2, 3, 4])
    y, _ = tr(x, None)
    assert y.shape == (4, 1, 2, 3, 4)
    back, _ = tr(y, None, rev=True)
    np.testing.assert_allclose(back, x)


def test_cut_values_reverse_spares_us(rng):
    x = np.abs(rng.normal(size=(5, 12))) * 1e-3
    tr = T.CutValues(cut=1e-2, n_layers=4)
    y, _ = tr(x.copy(), None)
    np.testing.assert_allclose(y, x)  # forward is a no-op
    z, _ = tr(x.copy(), None, rev=True)
    assert np.all(z[:, :8][x[:, :8] <= 1e-2] == 0.0)
    np.testing.assert_allclose(z[:, -4:], x[:, -4:])  # u's untouched


def test_selective_uniform_noise(rng):
    T.seed_transforms(7)
    x = np.zeros((20, 6))
    tr = T.SelectiveUniformNoise(0.0, 1e-3, cut=True)
    y, _ = tr(x.copy(), None)
    assert np.all(y >= 0) and np.all(y < 1e-3) and y.std() > 0
    z, _ = tr(y, None, rev=True)
    np.testing.assert_array_equal(z, 0.0)  # cut removes the noise floor


def test_select_dims_negative_range(rng):
    x = rng.normal(size=(3, 10))
    tr = T.SelectDims(start=-4, end=0)
    y, _ = tr(x, None)
    np.testing.assert_allclose(y, x[:, -4:])


def test_add_angular_bins_roundtrip(tmp_path):
    # 2 layers: layer0 has 1 alpha bin (padded to 4), layer1 already has 4
    from tests.conftest import make_binning_xml

    xml = make_binning_xml(tmp_path / "b.xml", n_layers=2, n_r=2, n_alpha=1)
    # overwrite: layer0 n_alpha=1, layer1 n_alpha=4
    xml.write_text(
        "<Bins>\n"
        '  <Particle name="electron">\n'
        '    <Layer id="0" r_edges="0,5,10" n_bin_alpha="1"/>\n'
        '    <Layer id="1" r_edges="0,5,10" n_bin_alpha="4"/>\n'
        "  </Particle>\n"
        "</Bins>"
    )
    rng = np.random.default_rng(0)
    n_vox = 2 * 1 + 2 * 4  # 10
    x = np.abs(rng.normal(size=(3, n_vox + 2)))  # + 2 u's
    tr = T.AddAngularBins(xml_filename="electron", ptype=str(xml), num_bins=[1, 4], add_bins=[4, 4])  # config kwarg convention (swapped, as in the reference)
    y, _ = tr(x.copy(), None)
    assert y.shape == (3, 2 * 4 + 2 * 4 + 2)
    back, _ = tr(y, None, rev=True)
    np.testing.assert_allclose(back, x)


def test_add_lemurs_conditions(rng):
    e = rng.normal(size=(4, 2))
    tr = T.AddLEMURSConditions(theta=0.1, phi=0.2, label=[0, 1, 0])
    _, e2 = tr(None, e.copy())
    assert e2.shape == (4, 7)
    np.testing.assert_allclose(e2[:, 2], 0.1)
    _, e3 = tr(None, e2, rev=True)
    np.testing.assert_allclose(e3, e)


def test_full_ds2_style_pipeline_roundtrip(tmp_path, geometry, showers):
    """The shipped ds2 chain (configs/calochallenge/cfm/calochallenge_ds2.yaml)
    on the synthetic geometry: forward then reverse reproduces physical showers
    up to the (intentional) noise/cut steps."""
    s, e = showers
    n_vox, n_layers = geometry["n_voxels"], geometry["n_layers"]
    chain = [
        T.NormalizeByElayer(geometry["xml"], "electron"),
        T.ScaleTotalEnergy(n_layers=n_layers, factor=0.35),
        T.CutValues(cut=1e-7, n_layers=n_layers),
        T.ExclusiveLogitTransform(delta=1e-6, rescale=True),
        T.GlobalStandardizeFromFile(model_dir=str(tmp_path), eps=1e-6),
        T.LogEnergy(),
        T.ScaleEnergy(e_min=6.907755, e_max=13.815510),
        T.AddFeaturesToCond(split_index=n_vox),
        T.Reshape(shape=[1, n_layers, 4, 3]),
    ]
    x, c = s.copy(), e.copy()
    for fn in chain:
        x, c = fn(x, c)
    assert x.shape == (len(s), 1, n_layers, 4, 3)
    assert c.shape == (len(s), n_layers + 1)
    for fn in chain[::-1]:
        x, c = fn(x, c, rev=True)
    np.testing.assert_allclose(c, e, rtol=1e-6)
    # voxels recovered up to logit regularization error on zeros
    np.testing.assert_allclose(x, s, rtol=1e-3, atol=2e-4 * float(e.max()) * 1e-3)


def test_add_angular_bins_config_convention(tmp_path):
    """Instantiation through build_pipeline with the shipped configs' swapped
    kwargs (ptype = XML path, xml_filename = particle) must work."""
    from tests.conftest import make_binning_xml
    import vit4hep_tpu.data.calochallenge.transforms as T

    xml = make_binning_xml(tmp_path / "b.xml", n_layers=2, n_r=2, n_alpha=4)
    steps = T.build_pipeline(
        {"AddAngularBins": {
            "ptype": str(xml), "xml_filename": "electron",
            "num_bins": [4, 4], "add_bins": [4, 4],
        }},
        run_dir=str(tmp_path),
    )
    sh = np.random.default_rng(0).random((3, 16 + 2)).astype(np.float32)
    out, _ = steps[0](sh.copy(), None)
    back, _ = steps[0](out, None, rev=True)
    np.testing.assert_allclose(back, sh, rtol=1e-6)


def test_u_only_application_leaves_pipeline_intact(tmp_path):
    """Regression for the sample_us flow (experiments/lemurs.py): applying the
    u_transform steps to a u-only dict (no showers) must not change how the
    pipeline later transforms showers — the dict-protocol transforms skip
    absent keys, and the experiments must NOT narrow fn.keys."""
    import vit4hep_tpu.data.lemurs.transforms as LT

    steps = [
        LT.LEMURSExclusiveLogitTransform(delta=1e-6, rescale=True),
        LT.LEMURSGlobalStandardizeFromFile(model_dir=tmp_path),
    ]
    rng = np.random.default_rng(0)
    full = {
        "showers": rng.uniform(0, 1, (4, 3, 3, 5)).astype(np.float32),
        "extra_dims": rng.uniform(0, 1, (4, 6)).astype(np.float32),
    }

    def fwd(d):
        d = {k: np.array(v) for k, v in d.items()}
        for fn in steps:
            d = fn(d)
        return d

    before = fwd(full)

    # the sample_us pattern: u-only dict through the same (shared) steps
    u_dict = {"extra_dims": np.array(full["extra_dims"])}
    for fn in steps[::-1]:
        u_dict = fn(u_dict, rev=True)
    for fn in steps:
        u_dict = fn(u_dict)

    after = fwd(full)
    np.testing.assert_array_equal(before["showers"], after["showers"])
    np.testing.assert_array_equal(before["extra_dims"], after["extra_dims"])
    # and every step still lists showers among its keys
    for fn in steps:
        if hasattr(fn, "keys"):
            assert "showers" in fn.keys, f"{type(fn).__name__} lost its shower key"
    assert any(hasattr(fn, "keys") for fn in steps)  # the guard must bite


def test_u_only_application_leaves_gan_pipeline_intact(tmp_path):
    """Same regression for the CaloGAN dict protocol (layer_keys)."""
    import vit4hep_tpu.data.calogan.transforms as GT

    steps = [
        GT.ExclusiveLogitTransformGAN(delta=1e-6, rescale=True),
        GT.GlobalStandardizeFromFileGAN(model_dir=tmp_path),
    ]
    rng = np.random.default_rng(1)
    full = {
        "layer_0": rng.uniform(0, 1, (4, 288)).astype(np.float32),
        "layer_1": rng.uniform(0, 1, (4, 144)).astype(np.float32),
        "layer_2": rng.uniform(0, 1, (4, 72)).astype(np.float32),
        "extra_dims": rng.uniform(0, 1, (4, 4)).astype(np.float32),
    }

    def fwd(d):
        d = {k: np.array(v) for k, v in d.items()}
        for fn in steps:
            d = fn(d)
        return d

    before = fwd(full)
    u_dict = {"extra_dims": np.array(full["extra_dims"])}
    for fn in steps[::-1]:
        u_dict = fn(u_dict, rev=True)
    for fn in steps:
        u_dict = fn(u_dict)
    after = fwd(full)
    for k in full:
        np.testing.assert_array_equal(before[k], after[k], err_msg=k)
    for fn in steps:
        assert "layer_0" in fn.layer_keys, f"{type(fn).__name__} lost layer keys"


def test_dataset_split_never_overlaps(shower_file, geometry):
    """Degenerate train_val_frac like (1.0, 0.0): the validation split forces
    one event from the tail, so the training slice must stop before it
    (advisor finding, round 1)."""
    from vit4hep_tpu.data.calochallenge.datasets import CaloChallengeDataset

    kw = dict(
        hdf5_file=shower_file,
        particle_type=geometry["particle"],
        xml_filename=geometry["xml"],
        train_val_frac=(1.0, 0.0),
    )
    trn = CaloChallengeDataset(split="training", **kw)
    val = CaloChallengeDataset(split="validation", **kw)
    n = len(trn) + len(val)
    assert len(val) == 1
    assert len(trn) == n - 1  # capped: no shared rows with the val tail
