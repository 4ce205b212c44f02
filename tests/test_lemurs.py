"""LEMURS family: transforms round-trip, lazy dataset + collator, model loss."""

import h5py
import jax
import numpy as np
import pytest

import vit4hep_tpu.data.lemurs.transforms as T
from vit4hep_tpu.data.lemurs.datasets import (
    CollatedBatchIterator,
    LEMURSCollator,
    LEMURSDataset,
)

H, W, L = 4, 3, 5  # tiny (height, width, layers) grid


def make_lemurs_file(path, n=64, seed=0):
    rng = np.random.default_rng(seed)
    dt = np.dtype([
        ("incident_energy", np.float32),
        ("incident_theta", np.float32),
        ("incident_phi", np.float32),
        ("showers", np.float32, (H, W, L)),
    ])
    events = np.zeros(n, dt)
    events["incident_energy"] = 10 ** rng.uniform(3, 6, n)
    events["incident_theta"] = rng.uniform(0.9, 2.2, n)
    events["incident_phi"] = rng.uniform(-3.1, 3.1, n)
    showers = rng.exponential(1.0, (n, H, W, L)) * (rng.random((n, H, W, L)) > 0.3)
    showers = showers / showers.sum((1, 2, 3), keepdims=True).clip(1e-9)
    events["showers"] = showers * events["incident_energy"][:, None, None, None] * 0.7
    with h5py.File(path, "w") as f:
        f.create_dataset("events", data=events)
    return str(path)


@pytest.fixture
def lemurs_files(tmp_path):
    return {
        "DetA": [make_lemurs_file(tmp_path / "a1.h5", seed=1),
                 make_lemurs_file(tmp_path / "a2.h5", seed=2)],
        "DetB": [make_lemurs_file(tmp_path / "b1.h5", seed=3)],
    }


def _raw_batch(rng, n=32):
    showers = rng.exponential(1.0, (n, H, W, L)).astype(np.float32)
    e = (10 ** rng.uniform(3, 6, (n, 1))).astype(np.float32)
    return {
        "showers": showers * e[:, :, None, None] * 0.5 / showers.sum((1, 2, 3), keepdims=True),
        "incident_energy": e,
        "incident_theta": rng.uniform(0.9, 2.2, (n, 1)).astype(np.float32),
        "incident_phi": rng.uniform(-3.1, 3.1, (n, 1)).astype(np.float32),
    }


def test_normalize_by_elayer_roundtrip(rng):
    tf = T.LEMURSNormalizeByElayer()
    data = _raw_batch(rng)
    original = data["showers"].copy()
    fwd = tf({k: v.copy() for k, v in data.items()})
    assert fwd["extra_dims"].shape == (32, L)
    # forward: layers normalized to unit sum
    np.testing.assert_allclose(fwd["showers"].sum(axis=(1, 2)), 1.0, atol=1e-4)
    back = tf(
        {
            "showers": fwd["showers"].copy(),
            "extra_dims": fwd["extra_dims"].copy(),
            "incident_energy": data["incident_energy"],
        },
        rev=True,
    )
    np.testing.assert_allclose(back["showers"], original, rtol=1e-3, atol=1e-5)


def test_full_pipeline_roundtrip(rng, tmp_path):
    steps = [
        T.LEMURSNormalizeByElayer(),
        T.LEMURSCutValues(cut=1e-7),
        T.LEMURSExclusiveLogitTransform(delta=1e-6, rescale=True),
        T.LEMURSGlobalStandardizeFromFile(model_dir=str(tmp_path)),
        T.LEMURSPreprocessConds(),
    ]
    data = _raw_batch(rng)
    original_sh = data["showers"].copy()
    original_e = data["incident_energy"].copy()
    d = {k: v.copy() for k, v in data.items()}
    for fn in steps:
        d = fn(d)
    for fn in steps[::-1]:
        d = fn(d, rev=True)
    np.testing.assert_allclose(d["incident_energy"], original_e, rtol=1e-4)
    np.testing.assert_allclose(d["showers"], original_sh, rtol=5e-2, atol=1e-4)
    assert (tmp_path / "means.npy").exists()


def test_dataset_index_and_read(lemurs_files):
    ds = LEMURSDataset(lemurs_files, max_files_per_worker=2)
    assert len(ds) == 64 * 3
    assert ds.num_classes == 2
    data, classes = ds.read_indices([0, 70, 140, 5])
    assert data["showers"].shape == (4, H, W, L)
    assert classes.tolist() == [0, 0, 1, 0]  # DetA spans two files (0..127)
    # reads match direct file access
    with h5py.File(lemurs_files["DetA"][0], "r") as f:
        np.testing.assert_array_equal(data["showers"][0], f["events"][0]["showers"])
        np.testing.assert_array_equal(data["showers"][3], f["events"][5]["showers"])


def test_collator_and_iterator(lemurs_files, tmp_path):
    steps = [
        T.LEMURSNormalizeByElayer(),
        T.LEMURSExclusiveLogitTransform(delta=1e-6, rescale=True),
        T.LEMURSGlobalStandardizeFromFile(model_dir=str(tmp_path)),
        T.LEMURSPreprocessConds(),
    ]
    ds = LEMURSDataset(lemurs_files)
    collator = LEMURSCollator(lemurs_files, steps, num_classes=2)
    it = CollatedBatchIterator(ds, collator, batch_size=32, seed=0)
    x, c = next(iter(it))
    assert x.shape == (32, H, W, L)
    # conds = [u's (L), E, theta, phi, one-hot (2)]
    assert c.shape == (32, L + 3 + 2)
    assert np.isfinite(x).all() and np.isfinite(c).all()
    # one-hot labels sum to 1
    np.testing.assert_allclose(c[:, -2:].sum(1), 1.0)
    # return_us mode
    collator_u = LEMURSCollator(lemurs_files, steps, num_classes=2, return_us=True)
    u, cu = collator_u(*ds.read_indices(list(range(16))))
    assert u.shape == (16, L)
    assert cu.shape == (16, 3)


@pytest.mark.slow
def test_lemurs_cfm_loss_and_patch(rng):
    from vit4hep_tpu.models.lemurs import LEMURSCFM
    from vit4hep_tpu.models.vit import ViT

    net = ViT({
        "dim": 3, "condition_dim": L + 3 + 2, "hidden_dim": 36, "depth": 1,
        "num_heads": 2, "mlp_ratio": 1.0, "num_patches": [[5, 3, 2]],
        "patch_dim": 2, "learn_pos_embed": True,
    })
    model = LEMURSCFM(net=net, patch_shape=[1, 1, 2], shape=[L, W, H], in_channels=1)
    params = model.init_params(jax.random.PRNGKey(0))
    x = rng.normal(size=(8, H, W, L)).astype(np.float32)  # LEMURS layout
    c = rng.normal(size=(8, L + 3 + 2)).astype(np.float32)
    loss = model.batch_loss(params, x, c, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    sample = model.sample_batch(params, c, jax.random.PRNGKey(2))
    assert sample.shape == (8, 1, L, W, H)


def test_native_record_cache(tmp_path, lemurs_files, rng):
    """C++ mmap cache: gathers match h5py reads exactly; works in the iterator."""
    from vit4hep_tpu.data.lemurs.datasets import enable_native_cache

    ds_ref = LEMURSDataset(lemurs_files)
    ds_fast = LEMURSDataset(lemurs_files)
    spec = {
        "incident_energy": (1,), "incident_theta": (1,), "incident_phi": (1,),
        "showers": (H, W, L),
    }
    enable_native_cache(ds_fast, tmp_path / "cache", spec)

    idx = rng.choice(len(ds_ref), size=48, replace=False)
    ref_data, ref_cls = ds_ref.read_indices(list(idx))
    fast_data, fast_cls = ds_fast.read_indices(list(idx))
    np.testing.assert_array_equal(ref_cls, fast_cls)
    for key in spec:
        np.testing.assert_allclose(fast_data[key], ref_data[key], rtol=1e-6)

    # cache reuse across instances (file already built)
    ds_again = LEMURSDataset(lemurs_files)
    enable_native_cache(ds_again, tmp_path / "cache", spec)
    again, _ = ds_again.read_indices([0, 5, 100])
    np.testing.assert_allclose(
        again["showers"], ds_ref.read_indices([0, 5, 100])[0]["showers"], rtol=1e-6
    )


def test_native_cache_spec_forms(tmp_path, lemurs_files):
    """normalize_spec: plain shapes, (shape, dtype) pairs, clear errors."""
    import pytest as _pytest

    from vit4hep_tpu.data.native_cache import normalize_spec, record_size_of
    from vit4hep_tpu.data.lemurs.datasets import enable_native_cache

    plain = {"incident_energy": (), "showers": (H, W, L)}
    pairs = {"incident_energy": ((), np.float32), "showers": ((H, W, L), np.float32)}
    assert normalize_spec(plain) == normalize_spec(pairs)
    assert record_size_of(plain) == 4 * (1 + H * W * L)

    with _pytest.raises(ValueError, match="float32"):
        normalize_spec({"showers": ((H, W, L), np.float64)})
    with _pytest.raises(ValueError, match="shape tuple"):
        normalize_spec({"showers": "huge"})

    # the (shape, dtype) form works end-to-end
    ds = LEMURSDataset(lemurs_files)
    spec = {"incident_energy": ((1,), np.float32), "incident_theta": ((1,), np.float32),
            "incident_phi": ((1,), np.float32), "showers": ((H, W, L), np.float32)}
    enable_native_cache(ds, tmp_path / "cache2", spec)
    data, _ = ds.read_indices([0, 3])
    assert data["showers"].shape == (2, H, W, L)


def test_native_cache_guards(tmp_path, rng):
    """Empty gathers return empty fields; a closed cache raises instead of
    segfaulting; a truncated file with an intact header is rejected."""
    from vit4hep_tpu.data.native_cache import NativeRecordCache, build_cache

    spec = {"b_field": (3,), "a_field": (2,)}
    path = tmp_path / "guards.v4cache"
    batches = [{"b_field": rng.normal(size=(10, 3)).astype(np.float32),
                "a_field": rng.normal(size=(10, 2)).astype(np.float32)}]
    build_cache(path, iter(batches), spec)

    cache = NativeRecordCache(path, spec)
    out = cache.gather(np.array([], np.int64))
    assert out["a_field"].shape == (0, 2) and out["b_field"].shape == (0, 3)
    # fields canonicalized to sorted key order: same data regardless of the
    # spec dict's insertion order
    cache2 = NativeRecordCache(path, {"a_field": (2,), "b_field": (3,)})
    np.testing.assert_array_equal(
        cache.gather([1, 3])["a_field"], cache2.gather([1, 3])["a_field"]
    )
    cache2.close()
    cache.close()
    with pytest.raises(ValueError, match="closed"):
        cache.gather([0])

    # truncate the data section but keep the header: open must fail loudly
    data = path.read_bytes()
    path.write_bytes(data[: len(data) - 40])
    with pytest.raises(OSError):
        NativeRecordCache(path, spec)
