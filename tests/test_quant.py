"""int8 (w8a8) sampling path: converter structure, matmul numerics, and
model-level drift vs the bf16 path (ops.quant — a serving optimization
with no reference counterpart; the reference samples in fp32 torch,
``FiT/sample_lightning.py:60-68``)."""

import numpy as np
import jax
import jax.numpy as jnp

from fit_tpu.core.pos_embed import rope_freqs_2d
from fit_tpu.models import create_fit
from fit_tpu.ops.quant import (
    Int8Dense,
    adaln_quant,
    dynamic_quant,
    int8_matmul,
    quantize_model,
    quantize_params,
    silu_mul_quant,
)


def test_int8_matmul_close_to_fp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64, 96)).astype(np.float32))
    w = rng.normal(size=(96, 128)).astype(np.float32) * 0.05
    b = rng.normal(size=(128,)).astype(np.float32) * 0.1
    scale = np.abs(w).max(axis=0) / 127.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    got = int8_matmul(
        x, jnp.asarray(wq), jnp.asarray(scale), jnp.asarray(b), out_dtype=jnp.float32
    )
    want = np.asarray(x) @ w + b
    # two int8 roundings (weight + activation): ~1% relative error budget
    err = np.abs(np.asarray(got) - want)
    assert err.max() <= 0.02 * np.abs(want).max(), err.max()


def test_quantize_params_structure_and_roundtrip():
    model = create_fit("FiT-S/2", dtype=jnp.bfloat16, scan_blocks=True)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))
    pos = jnp.asarray(np.broadcast_to(rope_freqs_2d(64, 4, 4), (2, 16, 64)).copy())
    mask = jnp.ones((2, 16), bool)
    t = jnp.asarray([1, 2])
    y = jnp.asarray([3, 4])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        tokens, t, y, pos, mask, train=True,
    )
    qparams = quantize_params(params)
    blk = qparams["params"]["blocks"]["block"]
    qkv = blk["attn"]["qkv"]
    assert qkv["kernel"].dtype == jnp.int8
    # scan-stacked grouped kernel (L, D, 3, C) -> scale (L, 3, C)
    assert qkv["kernel"].ndim == 4 and qkv["kernel_scale"].ndim == 3
    ffn = blk["ffn"]["fc1_g"]
    assert ffn["kernel"].dtype == jnp.int8
    assert ffn["kernel_scale"].shape == ffn["kernel"].shape[:1] + ffn["kernel"].shape[2:]
    # untouched leaves pass through
    assert qparams["params"]["x_embedder"]["kernel"].dtype != jnp.int8
    # dequantized weights reproduce the originals within half a quant step
    w = np.asarray(params["params"]["blocks"]["block"]["ffn"]["fc2"]["kernel"], np.float32)
    blk2 = qparams["params"]["blocks"]["block"]["ffn"]["fc2"]
    deq = np.asarray(blk2["kernel"], np.float32) * np.asarray(blk2["kernel_scale"])[:, None, :]
    step = np.asarray(blk2["kernel_scale"])[:, None, :]
    assert np.all(np.abs(deq - w) <= 0.51 * step)


def test_quant_model_forward_drift():
    """The int8 model's eps prediction stays close to the bf16 path —
    the model-level guard for the serving path (latent-level drift over a
    full sampling run is measured on hardware by bench.py --quant)."""
    kw = dict(dtype=jnp.bfloat16, scan_blocks=True, class_dropout_prob=0.0)
    model = create_fit("FiT-S/2", **kw)
    rng = np.random.default_rng(2)
    b, tlen = 2, 64
    tokens = jnp.asarray(rng.normal(size=(b, tlen, 16)).astype(np.float32))
    pos = jnp.asarray(np.broadcast_to(rope_freqs_2d(64, 8, 8), (b, tlen, 64)).copy())
    mask = jnp.ones((b, tlen), bool)
    t = jnp.asarray([100, 900])
    y = jnp.asarray([3, 4])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        tokens, t, y, pos, mask, train=True,
    )
    # fresh init has zero adaLN gates (blocks are identity) — give the
    # projections real weight mass so the quant path is actually exercised
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        td,
        [0.04 * jax.random.normal(k, l.shape, jnp.float32).astype(l.dtype)
         for k, l in zip(keys, leaves)],
    )
    want = np.asarray(
        model.apply(params, tokens, t, y, pos, mask, train=True), np.float32
    )
    qmodel, qparams = quantize_model(model, params)
    got = np.asarray(
        qmodel.apply(qparams, tokens, t, y, pos, mask, train=True), np.float32
    )
    denom = np.abs(want).max()
    rel = np.abs(got - want).max() / max(denom, 1e-6)
    assert rel < 0.15, rel  # int8 drift stays a small fraction of the signal


def test_silu_mul_quant_matches_unfused():
    """The fused silu*val + rowwise-int8 VMEM kernel agrees with the XLA
    composition within one quant step (the kernel computes the product in
    fp32, the composition in bf16 — so +-1 int step on the quantized
    values, compared dequantized)."""
    import flax.linen as nn

    rng = np.random.default_rng(5)
    gate = jnp.asarray(rng.normal(size=(3, 40, 96)).astype(np.float32)).astype(jnp.bfloat16)
    val = jnp.asarray(rng.normal(size=(3, 40, 96)).astype(np.float32)).astype(jnp.bfloat16)
    q, s = silu_mul_quant(gate, val, block_t=16)  # exercises the token grid
    ref_q, ref_s = dynamic_quant(nn.silu(gate) * val)
    got = np.asarray(q, np.float32) * np.asarray(s)
    want = np.asarray(ref_q, np.float32) * np.asarray(ref_s)
    # tolerance: one quant step of the larger scale + bf16 product rounding
    tol = np.maximum(np.asarray(s), np.asarray(ref_s)) + 0.01 * np.abs(want)
    assert np.all(np.abs(got - want) <= tol + 1e-6)
    assert q.dtype == jnp.int8 and s.shape == (3, 40, 1)


def test_adaln_quant_matches_unfused():
    from fit_tpu.models.layers import layer_norm_fp32, modulate

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 33, 64)).astype(np.float32)).astype(jnp.bfloat16)
    shift = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32)).astype(jnp.bfloat16)
    q, s = adaln_quant(x, shift, scale, block_t=16)  # 33 tokens: ragged grid
    ref_q, ref_s = dynamic_quant(modulate(layer_norm_fp32(x), shift, scale))
    got = np.asarray(q, np.float32) * np.asarray(s)
    want = np.asarray(ref_q, np.float32) * np.asarray(ref_s)
    tol = np.maximum(np.asarray(s), np.asarray(ref_s)) + 0.02 * np.abs(want)
    assert np.all(np.abs(got - want) <= tol + 1e-6)


def test_quant_model_fused_epilogues_match_xla_path(monkeypatch):
    """Forcing the Pallas quant-epilogue kernels (adaln_quant +
    silu_mul_quant, interpret mode on CPU) through the full model matches
    the XLA dynamic-quant path — both are int8, differing only by the
    producer's fp32-vs-bf16 rounding before quantization."""
    import fit_tpu.ops.quant as quant_mod

    kw = dict(dtype=jnp.bfloat16, scan_blocks=True, class_dropout_prob=0.0)
    model = create_fit("FiT-S/2", **kw)
    rng = np.random.default_rng(8)
    b, tlen = 2, 64
    tokens = jnp.asarray(rng.normal(size=(b, tlen, 16)).astype(np.float32))
    pos = jnp.asarray(np.broadcast_to(rope_freqs_2d(64, 8, 8), (b, tlen, 64)).copy())
    mask = jnp.ones((b, tlen), bool)
    t = jnp.asarray([100, 900])
    y = jnp.asarray([3, 4])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        tokens, t, y, pos, mask, train=True,
    )
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        td,
        [0.04 * jax.random.normal(k, l.shape, jnp.float32).astype(l.dtype)
         for k, l in zip(keys, leaves)],
    )
    qmodel, qparams = quantize_model(model, params)
    want = np.asarray(
        qmodel.apply(qparams, tokens, t, y, pos, mask, train=True), np.float32
    )
    monkeypatch.setattr(quant_mod, "use_fused_epilogue", lambda b_, t_: True)
    got = np.asarray(
        qmodel.apply(qparams, tokens, t, y, pos, mask, train=True), np.float32
    )
    denom = max(float(np.abs(want).max()), 1e-6)
    rel = np.abs(got - want).max() / denom
    assert rel < 0.05, rel  # same int8 path modulo producer rounding


def test_int8_matmul_accepts_prequantized():
    """int8_matmul((xq, sx), ...) == int8_matmul(x, ...) when (xq, sx) is
    the same dynamic quantization — the fused-producer contract."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    w = rng.normal(size=(32, 16)).astype(np.float32) * 0.1
    scale = np.abs(w).max(axis=0) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / scale), -127, 127).astype(np.int8))
    ks = jnp.asarray(scale)
    a = int8_matmul(x, wq, ks, out_dtype=jnp.float32)
    b = int8_matmul(dynamic_quant(x), wq, ks, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8dense_matches_converted_dense():
    """Int8Dense consuming converted params == int8_matmul on the raw
    pieces (the module/converter contract)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    mod = Int8Dense(16, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    w = rng.normal(size=(32, 16)).astype(np.float32) * 0.1
    scale = np.abs(w).max(axis=0) / 127.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    bias = rng.normal(size=(16,)).astype(np.float32)
    params = {
        "params": {
            "kernel": jnp.asarray(wq),
            "kernel_scale": jnp.asarray(scale),
            "bias": jnp.asarray(bias),
        }
    }
    got = mod.apply(params, x)
    want = int8_matmul(x, jnp.asarray(wq), jnp.asarray(scale), jnp.asarray(bias),
                       out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
