"""SmoothQuant activation equalization for the int8 serving path
(fit_tpu.ops.equalize — no reference counterpart; the reference serves fp32
torch, ``FiT/sample_lightning.py:60-68``).

Pins the two contracts that make equalization safe to ship:
1. EXACTNESS: folding the per-channel scales into the producers leaves the
   full-precision model numerically unchanged (the fold is algebraically
   exact; only float rounding differs).
2. USEFULNESS: on a checkpoint with activation-outlier channels (the regime
   trained transformers exhibit), the int8 path's error strictly drops.
"""

import numpy as np

import jax
import jax.numpy as jnp

from fit_tpu.core.pos_embed import rope_freqs_2d
from fit_tpu.models import FiT
from fit_tpu.ops.equalize import (
    calibrate,
    equalize_params,
    synthetic_calib_batch,
)
from fit_tpu.ops.quant import quantize_model


def _tiny(scan_blocks=True, dtype=jnp.float32, depth=2):
    return FiT(
        patch_size=2, in_channels=4, hidden_size=64, depth=depth, num_heads=4,
        num_classes=8, class_dropout_prob=0.0, dtype=dtype,
        scan_blocks=scan_blocks,
    )


def _random_params(model, seed=7, amp=0.1):
    b, tlen = 2, 16
    head_dim = model.hidden_size // model.num_heads
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.normal(size=(b, tlen, 16)).astype(np.float32))
    pos = jnp.asarray(
        np.broadcast_to(rope_freqs_2d(head_dim, 4, 4), (b, tlen, head_dim)).copy()
    )
    mask = jnp.ones((b, tlen), bool)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        tokens, jnp.asarray([1, 2]), jnp.asarray([3, 4]), pos, mask, train=True,
    )
    # fresh init has zero adaLN gates (identity blocks): give every leaf
    # weight mass so all folds are exercised
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        td,
        [amp * jax.random.normal(k, l.shape, jnp.float32).astype(l.dtype)
         for k, l in zip(keys, leaves)],
    )


def _calib_batches(model, n=2, size=32):
    rng = np.random.default_rng(3)
    return [synthetic_calib_batch(model, rng, batch=3, size=size) for _ in range(n)]


def test_calibration_stats_shapes_scan_and_unrolled():
    for scan in (True, False):
        model = _tiny(scan_blocks=scan)
        params = _random_params(model)
        stats = calibrate(model, params, _calib_batches(model))
        hidden_ffn = int(model.hidden_size * model.mlp_ratio * 2 / 3)
        assert stats["attn_in"].shape == (model.depth, model.hidden_size)
        assert stats["proj_in"].shape == (model.depth, model.hidden_size)
        assert stats["ffn_in"].shape == (model.depth, model.hidden_size)
        assert stats["fc2_in"].shape == (model.depth, hidden_ffn)
        for v in stats.values():
            assert np.all(v > 0) and np.all(np.isfinite(v))


def test_equalize_preserves_fp32_model_exactly():
    """Contract 1: the folded model IS the same function (fp32 rounding
    tolerance) — checked on both block layouts."""
    for scan in (True, False):
        model = _tiny(scan_blocks=scan, dtype=jnp.float32)
        params = _random_params(model)
        stats = calibrate(model, params, _calib_batches(model))
        eq = equalize_params(params, stats, alpha=0.5)

        # the fold must actually change the weights (guard against a no-op)
        blk = (eq["params"]["blocks"]["block"] if scan
               else eq["params"]["blocks_0"])["attn"]["qkv"]["kernel"]
        orig = (params["params"]["blocks"]["block"] if scan
                else params["params"]["blocks_0"])["attn"]["qkv"]["kernel"]
        assert not np.allclose(np.asarray(blk), np.asarray(orig))

        args = _calib_batches(model, n=1)[0]
        want = np.asarray(model.apply(params, *args, train=False), np.float32)
        got = np.asarray(model.apply(eq, *args, train=False), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5 * np.abs(want).max())


def _inject_activation_outliers(params, scan=True):
    """Make a few channels of every int8 feed pathological, the way trained
    checkpoints do: large adaLN shift bias -> attn_in/ffn_in outlier lanes;
    large fc1_x columns -> SwiGLU hidden outlier lanes; large qkv v-columns
    -> attention-out outlier lanes."""
    p = jax.tree.map(lambda x: np.array(x, np.float32), params)
    blk = p["params"]["blocks"]["block"] if scan else None
    assert blk is not None, "outlier test uses the scan layout"
    d = blk["adaLN"]["bias"].shape[-1] // 6
    bias = blk["adaLN"]["bias"]
    for chunk in (0, 3):  # shift_msa, shift_mlp
        bias[..., chunk * d + 3] += 30.0
        bias[..., chunk * d + 11] -= 25.0
    blk["ffn"]["fc1_x"]["kernel"][..., :, 5] *= 25.0
    blk["attn"]["qkv"]["kernel"][..., 2, 7] *= 25.0
    return jax.tree.map(jnp.asarray, p)


def test_equalize_reduces_int8_error_on_outlier_checkpoint():
    """Contract 2: with activation-outlier channels present, SmoothQuant
    equalization strictly reduces the int8 path's forward error."""
    model = _tiny(scan_blocks=True, dtype=jnp.float32)
    params = _inject_activation_outliers(_random_params(model, amp=0.08))

    args = _calib_batches(model, n=1, size=32)[0]
    ref = np.asarray(model.apply(params, *args, train=False), np.float32)

    def int8_err(calib_batches):
        qmodel, qparams = quantize_model(model, params, calib_batches=calib_batches)
        got = np.asarray(qmodel.apply(qparams, *args, train=False), np.float32)
        return float(np.sqrt(np.mean((got - ref) ** 2)))

    err_plain = int8_err(None)
    err_eq = int8_err(_calib_batches(model, n=2))
    assert err_eq < err_plain, (err_eq, err_plain)
    # the improvement should be substantial in the outlier regime, not noise
    assert err_eq < 0.7 * err_plain, (err_eq, err_plain)


def test_equalized_quantization_roundtrip_artifact(tmp_path):
    """quantize -> save -> load keeps the equalized int8 params bit-exact
    (the cli.quantize --equalize deployment path)."""
    from fit_tpu.ops.quant import load_quantized, save_quantized

    model = _tiny(scan_blocks=True, dtype=jnp.float32)
    params = _random_params(model)
    qmodel, qparams = quantize_model(
        model, params, calib_batches=_calib_batches(model, n=1)
    )
    save_quantized(str(tmp_path / "art"), qparams, meta={"equalized_batches": 1})
    loaded, meta = load_quantized(str(tmp_path / "art"))
    assert meta["equalized_batches"] == 1
    key = lambda kv: str(kv[0])  # noqa: E731
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(qparams)[0], key=key),
        sorted(jax.tree_util.tree_flatten_with_path(loaded)[0], key=key),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
