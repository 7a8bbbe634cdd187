"""Offline VAE preprocessing: images -> fp16 latent .npy files.

Capability parity with the reference preprocessing CLI
(``/root/reference/preprocess/preprocess.py`` +
``preprocess/iterators.py:16-77``): walk an image tree, resize each image so
its area is at most ``max_size^2`` while keeping aspect ratio and rounding
dims to multiples of ``vae_scale * patch_size``, VAE-encode, scale by
0.18215, save per-image fp16 ``.npy`` mirroring the class layout, write a
``path.json`` manifest, and skip already-encoded files (idempotent resume).

TPU-first deltas: encoding batches images of the same rounded shape through
a jitted flax AutoencoderKL (the reference runs torch batch-size 1), and the
VAE weights come from a converted sd-vae torch checkpoint
(``--vae-checkpoint``) since this environment has no network access.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

ALLOWED_FORMAT = {".jpeg", ".jpg", ".bmp", ".png"}

__all__ = ["resize_by_max_value", "walk_images", "preprocess_folder"]


def resize_dims(w: int, h: int, max_size: int = 256, scale: int = 16) -> Tuple[int, int]:
    """Target (w, h): area-capped, aspect-preserving, multiples of ``scale``
    (parity: reference ``iterators.py:21-37``)."""
    image_area = w * h
    max_area = max_size * max_size
    if image_area > max_area:
        ratio = max_area / image_area
        new_w = w * np.sqrt(ratio)
        new_h = h * np.sqrt(ratio)
    else:
        new_w, new_h = w, h
    round_w, round_h = (np.round(np.array([new_w, new_h]) / scale) * scale).astype(int).tolist()
    if round_w * round_h > max_area:
        round_w, round_h = (np.floor(np.array([new_w, new_h]) / scale) * scale).astype(int).tolist()
    return max(round_w, scale), max(round_h, scale)


def resize_by_max_value(img, max_size: int = 256, vae_scale: int = 8, patch_size: int = 2):
    """PIL image -> bicubic-resized PIL image with rounded dims."""
    from PIL import Image

    w, h = img.size
    rw, rh = resize_dims(w, h, max_size, vae_scale * patch_size)
    return img.resize((rw, rh), resample=Image.BICUBIC)


def walk_images(root: str) -> List[str]:
    paths = []
    for dirpath, _, filenames in os.walk(root):
        for f in filenames:
            if os.path.splitext(f)[1].lower() in ALLOWED_FORMAT:
                paths.append(os.path.join(dirpath, f))
    if not paths:
        raise RuntimeError(f"Cannot find any image under `{root}`")
    return sorted(paths)


def _image_to_array(img) -> np.ndarray:
    """PIL -> (3, H, W) float32 in [-1, 1] (diffusers VAE input convention)."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    arr = arr * 2.0 - 1.0
    return arr.transpose(2, 0, 1)


def preprocess_folder(
    dataset_path: str,
    latent_folder: str,
    vae_params,
    *,
    max_size: int = 256,
    vae_scale: int = 8,
    patch_size: int = 2,
    seed: int = 0,
    sample_posterior: bool = True,
    batch_size: int = 8,
    progress: bool = True,
    vae=None,
) -> List[str]:
    """Encode every image under ``dataset_path``; returns written paths.

    ``vae``: an ``AutoencoderKL`` instance matching ``vae_params``; defaults
    to the standard sd-vae configuration.
    """
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fit_tpu.vae import AutoencoderKL

    vae = vae if vae is not None else AutoencoderKL()
    encode = jax.jit(
        lambda p, x, k: vae.apply(p, x, k, method=AutoencoderKL.encode)
        if sample_posterior
        else vae.apply(p, x, method=AutoencoderKL.encode_mode)
    )

    paths = walk_images(dataset_path)
    written, manifest = [], []
    rng = jax.random.PRNGKey(seed)

    # group by rounded target shape so each shape compiles once and batches
    by_shape = {}
    for p in paths:
        out_path = _latent_path(p, dataset_path, latent_folder)
        manifest.append(out_path)
        if os.path.exists(out_path):
            continue
        with Image.open(p) as f:
            w, h = f.size
        shape = resize_dims(w, h, max_size, vae_scale * patch_size)
        by_shape.setdefault(shape, []).append(p)

    total = sum(len(v) for v in by_shape.values())
    done = 0
    for shape, group in sorted(by_shape.items()):
        for start in range(0, len(group), batch_size):
            chunk = group[start : start + batch_size]
            imgs = []
            for p in chunk:
                with Image.open(p) as f:
                    imgs.append(_image_to_array(resize_by_max_value(f, max_size, vae_scale, patch_size)))
            x = jnp.asarray(np.stack(imgs))
            rng, key = jax.random.split(rng)
            latents = np.asarray(jax.device_get(encode(vae_params, x, key)))
            for p, lat in zip(chunk, latents):
                out_path = _latent_path(p, dataset_path, latent_folder)
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                np.save(out_path, lat.astype(np.float16))
                written.append(out_path)
            done += len(chunk)
            if progress:
                print(f"[preprocess] {done}/{total} shape={shape}", flush=True)

    os.makedirs(latent_folder, exist_ok=True)
    with open(os.path.join(latent_folder, "path.json"), "w") as f:
        json.dump(manifest, f)
    return written


def _latent_path(img_path: str, dataset_path: str, latent_folder: str) -> str:
    rel = os.path.relpath(img_path, dataset_path)
    return os.path.join(latent_folder, os.path.splitext(rel)[0] + ".npy")
