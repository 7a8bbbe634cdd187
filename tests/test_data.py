"""Data pipeline tests: dataset walking/labels, packing modes, determinism,
host sharding."""

import numpy as np
import pytest

from fit_tpu.core.geometry import patchify_np
from fit_tpu.data import (
    TOKEN_BUCKETS,
    LatentFolderDataset,
    LatentLoader,
    bucket_batch,
    pad_batch,
)


@pytest.fixture(scope="module")
def latent_root(tmp_path_factory):
    """Synthetic latent folder: 3 classes x 8 variable-aspect latents."""
    root = tmp_path_factory.mktemp("latents")
    rng = np.random.default_rng(0)
    shapes = [(4, 30, 34), (4, 22, 30), (4, 32, 32), (4, 16, 48)]
    for cls in ["n01", "n02", "n03"]:
        d = root / cls
        d.mkdir()
        for i in range(8):
            c, h, w = shapes[i % len(shapes)]
            np.save(d / f"img_{i}.npy", rng.normal(size=(c, h, w)).astype(np.float16))
    return str(root)


def test_dataset_walk_and_labels(latent_root):
    ds = LatentFolderDataset(latent_root)
    assert len(ds) == 24
    assert ds.label_mapping == {"n01": 0, "n02": 1, "n03": 2}
    assert ds.max_length == 256
    ex = ds[0]
    assert ex.tokens.shape[1] == 2 * 2 * 4
    assert ex.pos.shape == (ex.tokens.shape[0], 64)
    assert ex.tokens.shape[0] == (ex.h // 2) * (ex.w // 2)


def test_tokens_match_manual_patchify(latent_root):
    ds = LatentFolderDataset(latent_root, hflip=False)
    path, _ = ds.entries[3]
    lat = np.load(path).astype(np.float32)
    ex = ds[3]
    np.testing.assert_array_equal(ex.tokens, patchify_np(lat, 2))


def test_pad_batch_shapes(latent_root):
    ds = LatentFolderDataset(latent_root)
    items = [ds[i] for i in range(4)]
    b = pad_batch(items, ds.max_length)
    assert b["tokens"].shape == (4, 256, 16)
    assert b["pos"].shape == (4, 256, 64)
    assert b["mask"].shape == (4, 256)
    # mask marks exactly the true token count, prefix-style
    for i, it in enumerate(items):
        t = it.tokens.shape[0]
        assert b["mask"][i, :t].all() and not b["mask"][i, t:].any()
        np.testing.assert_array_equal(b["tokens"][i, :t], it.tokens)
        assert (b["tokens"][i, t:] == 0).all()


def test_bucket_batch_semantics(latent_root):
    ds = LatentFolderDataset(latent_root)
    items = [ds[i] for i in range(4)]
    rng = np.random.default_rng(1)
    b = bucket_batch(items, rng)
    n = b["tokens"].shape[1]
    assert n in TOKEN_BUCKETS
    for i, it in enumerate(items):
        t = it.tokens.shape[0]
        if t > n:
            # subsampled: every kept token must exist in the original, with
            # its pos row at the same original index (consistent permutation)
            assert b["mask"][i].all()
            for j in range(n):
                hits = np.where((it.tokens == b["tokens"][i, j]).all(axis=1))[0]
                assert len(hits) >= 1
                np.testing.assert_array_equal(b["pos"][i, j], it.pos[hits[0]])
        else:
            assert b["mask"][i, :t].all() and not b["mask"][i, t:].any()


def test_loader_determinism_and_sharding(latent_root):
    ds = LatentFolderDataset(latent_root)
    l1 = LatentLoader(ds, 4, seed=7)
    l2 = LatentLoader(ds, 4, seed=7)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["tokens"], b2["tokens"])
    np.testing.assert_array_equal(b1["label"], b2["label"])

    # two shards see disjoint samples covering the epoch
    sh0 = LatentLoader(LatentFolderDataset(latent_root, hflip=False), 2, seed=3, shard_id=0, num_shards=2)
    sh1 = LatentLoader(LatentFolderDataset(latent_root, hflip=False), 2, seed=3, shard_id=1, num_shards=2)
    seen0 = {b["tokens"][i].tobytes() for b in sh0.epoch_batches(0) for i in range(2)}
    seen1 = {b["tokens"][i].tobytes() for b in sh1.epoch_batches(0) for i in range(2)}
    assert seen0.isdisjoint(seen1)
    assert len(seen0) + len(seen1) == 24


def test_loader_epoch_reshuffles(latent_root):
    ds = LatentFolderDataset(latent_root, hflip=False)
    loader = LatentLoader(ds, 8, seed=5)
    e0 = [b["label"] for b in loader.epoch_batches(0)]
    e1 = [b["label"] for b in loader.epoch_batches(1)]
    assert not all(np.array_equal(a, b) for a, b in zip(e0, e1))


def test_loads_reference_pt_samples():
    """The reference ships .pt sample latents; the loader must read them."""
    import os

    ref = "/root/reference/latent/n01440764"
    if not os.path.isdir(ref):
        pytest.skip("reference latents not available")
    ds = LatentFolderDataset("/root/reference/latent")
    assert len(ds) > 300
    ex = ds[0]
    assert ex.tokens.dtype == np.float32
    assert ex.tokens.shape[0] == (ex.h // 2) * (ex.w // 2)
