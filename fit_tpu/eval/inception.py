"""InceptionV3 pool3 feature network (for FID) in pure JAX.

The reference's FID protocol generates 50k samples and computes FID
externally (``/root/reference/FiT/launch_sampling_FID.sbatch:13``); the
canonical external tool (pytorch-fid) embeds images with an InceptionV3
truncated at the final average pool ("pool3", 2048-d). This module is a
TPU-native inference implementation of that network:

* **functional, params-as-pytree**: inference only, so no module framework —
  a nested dict of folded conv+BN weights applied by jitted functions
  (BatchNorm is folded into a per-channel scale/bias at conversion time,
  saving the normalization arithmetic entirely);
* **NHWC** end to end (the TPU conv layout); the public API takes NCHW in
  [0, 1] to match the torch ecosystem's tensor contract;
* weight-compatible with both **torchvision** ``inception_v3`` checkpoints
  and **pytorch-fid**'s ``pt_inception-2015-12-05`` weights (same module
  names). ``variant="fid"`` reproduces pytorch-fid's pooling deviations
  (``count_include_pad=False`` average pools in the A/C/E1 blocks, max pool
  in E2) so FID numbers are comparable with published ones.

This zero-egress build environment cannot download the weights; tests verify
the network + converter against a pure-torch oracle on synthetic weights.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

__all__ = [
    "convert_torch_inception",
    "load_torch_inception",
    "pool3_features",
    "pool3_and_spatial_features",
    "inception_logits",
    "make_feature_extractor",
    "make_logits_extractor",
    "make_suite_extractor",
]

_EPS = 1e-3  # torchvision BasicConv2d BatchNorm eps


# ---------------------------------------------------------------------------
# functional ops (NHWC)
# ---------------------------------------------------------------------------


def _conv_bn(x: Array, p: Dict, stride=1, padding=0) -> Array:
    """BasicConv2d: conv (no bias) + folded BN + relu."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y * p["scale"] + p["bias"])


def _max_pool(x: Array, window=3, stride=2, padding=0) -> Array:
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pad
    )


def _avg_pool(x: Array, window=3, stride=1, padding=1, count_include_pad=True) -> Array:
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), pad
    )
    if count_include_pad:
        return summed / (window * window)
    counts = jax.lax.reduce_window(
        jnp.ones(x.shape[1:3] + (1,), x.dtype)[None],
        0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), pad,
    )
    return summed / counts


# ---------------------------------------------------------------------------
# inception blocks
# ---------------------------------------------------------------------------


def _block_a(x: Array, p: Dict, fid: bool) -> Array:
    b1 = _conv_bn(x, p["branch1x1"])
    b5 = _conv_bn(_conv_bn(x, p["branch5x5_1"]), p["branch5x5_2"], padding=2)
    b3 = _conv_bn(x, p["branch3x3dbl_1"])
    b3 = _conv_bn(b3, p["branch3x3dbl_2"], padding=1)
    b3 = _conv_bn(b3, p["branch3x3dbl_3"], padding=1)
    bp = _avg_pool(x, count_include_pad=not fid)
    bp = _conv_bn(bp, p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(x: Array, p: Dict) -> Array:
    b3 = _conv_bn(x, p["branch3x3"], stride=2)
    bd = _conv_bn(x, p["branch3x3dbl_1"])
    bd = _conv_bn(bd, p["branch3x3dbl_2"], padding=1)
    bd = _conv_bn(bd, p["branch3x3dbl_3"], stride=2)
    return jnp.concatenate([b3, bd, _max_pool(x)], axis=-1)


def _block_c(x: Array, p: Dict, fid: bool) -> Array:
    b1 = _conv_bn(x, p["branch1x1"])
    b7 = _conv_bn(x, p["branch7x7_1"])
    b7 = _conv_bn(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = _conv_bn(b7, p["branch7x7_3"], padding=(3, 0))
    bd = _conv_bn(x, p["branch7x7dbl_1"])
    bd = _conv_bn(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = _conv_bn(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = _conv_bn(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = _conv_bn(bd, p["branch7x7dbl_5"], padding=(0, 3))
    bp = _avg_pool(x, count_include_pad=not fid)
    bp = _conv_bn(bp, p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(x: Array, p: Dict) -> Array:
    b3 = _conv_bn(_conv_bn(x, p["branch3x3_1"]), p["branch3x3_2"], stride=2)
    b7 = _conv_bn(x, p["branch7x7x3_1"])
    b7 = _conv_bn(b7, p["branch7x7x3_2"], padding=(0, 3))
    b7 = _conv_bn(b7, p["branch7x7x3_3"], padding=(3, 0))
    b7 = _conv_bn(b7, p["branch7x7x3_4"], stride=2)
    return jnp.concatenate([b3, b7, _max_pool(x)], axis=-1)


def _block_e(x: Array, p: Dict, pool: str) -> Array:
    b1 = _conv_bn(x, p["branch1x1"])
    b3 = _conv_bn(x, p["branch3x3_1"])
    b3 = jnp.concatenate(
        [
            _conv_bn(b3, p["branch3x3_2a"], padding=(0, 1)),
            _conv_bn(b3, p["branch3x3_2b"], padding=(1, 0)),
        ],
        axis=-1,
    )
    bd = _conv_bn(x, p["branch3x3dbl_1"])
    bd = _conv_bn(bd, p["branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate(
        [
            _conv_bn(bd, p["branch3x3dbl_3a"], padding=(0, 1)),
            _conv_bn(bd, p["branch3x3dbl_3b"], padding=(1, 0)),
        ],
        axis=-1,
    )
    if pool == "max":  # pytorch-fid FIDInceptionE_2
        bp = _max_pool(x, window=3, stride=1, padding=1)
    elif pool == "avg_nopad":  # FIDInceptionE_1
        bp = _avg_pool(x, count_include_pad=False)
    else:
        bp = _avg_pool(x)
    bp = _conv_bn(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# ---------------------------------------------------------------------------
# full network
# ---------------------------------------------------------------------------


def _trunk(params: Dict, images: Array, variant: str, want_spatial: bool):
    """Shared trunk: (N, 3, H, W) in [0, 1] -> (pool3 (N, 2048),
    spatial (N, 2023) or None).

    ``spatial`` is the ADM evaluator's sFID embedding (guided-diffusion
    ``evaluations/evaluator.py``: TF-graph tensor ``mixed_6/conv:0``,
    first 7 channels, flattened NHWC). TF ``mixed_6`` is the fourth
    17x17 C-block = torchvision ``Mixed_6d``, and its ``conv`` scope names
    the branch1x1 relu — so the tap is ``relu(bn(conv1x1(x)))`` on
    Mixed_6d's input (XLA CSEs it with Mixed_6d's own branch1x1):
    (N, 17, 17, 7) -> 2023-d.
    """
    fid = variant == "fid"
    x = jnp.transpose(images.astype(jnp.float32), (0, 2, 3, 1))  # NHWC
    n, h, w, c = x.shape
    if (h, w) != (299, 299):
        x = jax.image.resize(x, (n, 299, 299, c), method="bilinear")
    x = 2.0 * x - 1.0

    x = _conv_bn(x, params["Conv2d_1a_3x3"], stride=2)
    x = _conv_bn(x, params["Conv2d_2a_3x3"])
    x = _conv_bn(x, params["Conv2d_2b_3x3"], padding=1)
    x = _max_pool(x)
    x = _conv_bn(x, params["Conv2d_3b_1x1"])
    x = _conv_bn(x, params["Conv2d_4a_3x3"])
    x = _max_pool(x)
    x = _block_a(x, params["Mixed_5b"], fid)
    x = _block_a(x, params["Mixed_5c"], fid)
    x = _block_a(x, params["Mixed_5d"], fid)
    x = _block_b(x, params["Mixed_6a"])
    x = _block_c(x, params["Mixed_6b"], fid)
    x = _block_c(x, params["Mixed_6c"], fid)
    spatial = None
    if want_spatial:
        sp = _conv_bn(x, params["Mixed_6d"]["branch1x1"])[..., :7]
        spatial = sp.reshape(sp.shape[0], -1)
    x = _block_c(x, params["Mixed_6d"], fid)
    x = _block_c(x, params["Mixed_6e"], fid)
    x = _block_d(x, params["Mixed_7a"])
    x = _block_e(x, params["Mixed_7b"], "avg_nopad" if fid else "avg")
    x = _block_e(x, params["Mixed_7c"], "max" if fid else "avg")
    return jnp.mean(x, axis=(1, 2)), spatial  # adaptive avg pool (N, 2048)


@functools.partial(jax.jit, static_argnames=("variant",))
def pool3_features(params: Dict, images: Array, variant: str = "fid") -> Array:
    """(N, 3, H, W) images in **[0, 1]** -> (N, 2048) pool3 features.

    Resizes to 299x299 bilinear and maps to [-1, 1] (the pytorch-fid input
    protocol with ``normalize_input=True``). ``variant``: "fid" reproduces
    pytorch-fid's FIDInception pooling; "torchvision" uses stock pooling.
    """
    return _trunk(params, images, variant, want_spatial=False)[0]


@functools.partial(jax.jit, static_argnames=("variant",))
def pool3_and_spatial_features(
    params: Dict, images: Array, variant: str = "fid"
) -> Tuple[Array, Array]:
    """One trunk pass -> (pool3 (N, 2048), spatial (N, 2023)).

    ``spatial`` drives sFID (Nash et al. 2021, the DiT/ADM suite's spatial
    Frechet distance): same Frechet formula as FID, over the mid-network
    17x17 spatial embedding (see :func:`_trunk`) — sensitive to spatial
    structure that global pooling erases.
    """
    return _trunk(params, images, variant, want_spatial=True)


@functools.partial(jax.jit, static_argnames=("variant",))
def inception_logits(params: Dict, images: Array, variant: str = "fid") -> Array:
    """(N, 3, H, W) images in [0, 1] -> (N, num_classes) classifier logits.

    pool3 features through the final ``fc`` layer (1000-way for torchvision
    checkpoints, 1008-way for pytorch-fid's TF-derived
    ``pt_inception-2015-12-05``). Softmax of these drives the Inception
    Score (``fit_tpu.eval.metrics.inception_score``). Requires the
    checkpoint's fc weights — :func:`convert_torch_inception` keeps them
    when present."""
    fc = params.get("fc")
    if fc is None:
        raise ValueError(
            "params carry no fc head (checkpoint converted without fc "
            "weights) — Inception Score needs the classifier layer"
        )
    feats = pool3_features(params, images, variant=variant)
    return feats @ fc["kernel"] + fc["bias"]


def make_feature_extractor(params: Dict, variant: str = "fid"):
    """Numpy-in/numpy-out extractor for :func:`fit_tpu.eval.fid.fid_score`."""
    params = jax.tree.map(jnp.asarray, params)

    def extract(batch: np.ndarray) -> np.ndarray:
        return np.asarray(pool3_features(params, jnp.asarray(batch), variant=variant))

    return extract


def make_logits_extractor(params: Dict, variant: str = "fid"):
    """Numpy-in/numpy-out class-probability extractor (softmaxed logits) for
    :func:`fit_tpu.eval.metrics.inception_score`."""
    params = jax.tree.map(jnp.asarray, params)

    def extract(batch: np.ndarray) -> np.ndarray:
        lg = inception_logits(params, jnp.asarray(batch), variant=variant)
        return np.asarray(jax.nn.softmax(lg, axis=-1))

    return extract


@functools.partial(
    jax.jit, static_argnames=("variant", "want_spatial", "want_probs")
)
def _suite_features(params, images, variant, want_spatial, want_probs):
    pool3, spatial = _trunk(params, images, variant, want_spatial)
    out = {"pool3": pool3}
    if want_spatial:
        out["spatial"] = spatial
    if want_probs:
        fc = params["fc"]
        out["probs"] = jax.nn.softmax(pool3 @ fc["kernel"] + fc["bias"], axis=-1)
    return out


def make_suite_extractor(
    params: Dict,
    variant: str = "fid",
    spatial: bool = False,
    probs: bool = False,
):
    """Numpy-in/dict-out extractor computing every requested embedding in
    ONE trunk pass: always ``pool3`` (FID, Precision/Recall), optionally
    ``spatial`` (sFID) and ``probs`` (Inception Score) — the whole DiT/ADM
    metric suite from a single sweep over the 50k samples instead of one
    network pass per metric."""
    if probs and params.get("fc") is None:
        raise ValueError(
            "params carry no fc head (checkpoint converted without fc "
            "weights) — Inception Score needs the classifier layer"
        )
    params = jax.tree.map(jnp.asarray, params)

    def extract(batch: np.ndarray) -> Dict[str, np.ndarray]:
        out = _suite_features(
            params, jnp.asarray(batch), variant, spatial, probs
        )
        return {k: np.asarray(v) for k, v in out.items()}

    return extract


# ---------------------------------------------------------------------------
# torch weight conversion
# ---------------------------------------------------------------------------

_BLOCK_BRANCHES = {
    "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
                 "branch7x7x3_3", "branch7x7x3_4"],
    "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool"],
}
_BLOCK_BRANCHES["Mixed_5c"] = _BLOCK_BRANCHES["Mixed_5d"] = _BLOCK_BRANCHES["Mixed_5b"]
_BLOCK_BRANCHES["Mixed_6c"] = _BLOCK_BRANCHES["Mixed_6d"] = _BLOCK_BRANCHES["Mixed_6e"] = _BLOCK_BRANCHES["Mixed_6b"]
_BLOCK_BRANCHES["Mixed_7c"] = _BLOCK_BRANCHES["Mixed_7b"]

_STEM = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1", "Conv2d_4a_3x3"]


def _fold(sd: Dict, prefix: str) -> Dict:
    """torch BasicConv2d -> {kernel HWIO, scale, bias} with BN folded in."""
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float32)  # (O,I,kH,kW)
    gamma = np.asarray(sd[f"{prefix}.bn.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float32)
    scale = gamma / np.sqrt(var + _EPS)
    return {
        "kernel": np.transpose(w, (2, 3, 1, 0)),  # HWIO
        "scale": scale,
        "bias": beta - mean * scale,
    }


def convert_torch_inception(sd: Dict) -> Dict:
    """torchvision/pytorch-fid InceptionV3 state_dict -> params pytree.

    The feature path up to pool3 plus the final ``fc`` classifier (used by
    the Inception Score; AuxLogits are dropped — no metric uses them).
    """
    params = {name: _fold(sd, name) for name in _STEM}
    for block, branches in _BLOCK_BRANCHES.items():
        params[block] = {br: _fold(sd, f"{block}.{br}") for br in branches}
    if "fc.weight" in sd:
        params["fc"] = {
            # torch Linear stores (out, in); we apply feats @ kernel + bias
            "kernel": np.transpose(np.asarray(sd["fc.weight"], np.float32)),
            "bias": np.asarray(sd["fc.bias"], np.float32),
        }
    return params


def load_torch_inception(path: str) -> Dict:
    """Load a torch .pth/.pt InceptionV3 checkpoint and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torch_inception(sd)
