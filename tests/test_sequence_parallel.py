"""Sequence (context) parallelism tests — parallel.sequence (Ulysses).

All on the 8-device virtual CPU mesh (conftest). The reference has no
sequence-parallel capability; these tests pin the fit_tpu extension to the
unsharded math bit-for-bit: the Ulysses all-to-alls are pure data movement
and the per-shard kernel is the same fused kernel the single-chip path runs,
so forward AND gradients must match exactly (fp32, highest precision).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fit_tpu.core.pos_embed import rope_freqs_2d
from fit_tpu.models import FiT
from fit_tpu.parallel import make_mesh, shard_params, token_spec, ulysses_attention
from fit_tpu.ops.fused_attention import qkv_rope_flash_attention, split_rope_tables

RNGS = {"label_dropout": jax.random.PRNGKey(2)}


def qkv_inputs(b=4, t=64, h=8, d=16, seed=0):
    rng = np.random.default_rng(seed)
    c = h * d
    qkv = jnp.asarray(rng.normal(size=(b, t, 3, c)).astype(np.float32))
    pos = rope_freqs_2d(d, 8, t // 8, max_length=t)
    cos, sin = split_rope_tables(jnp.asarray(np.broadcast_to(pos, (b, t, d)).copy()))
    lengths = jnp.asarray(rng.integers(t // 2, t + 1, size=(b,)).astype(np.int32))
    return qkv, cos, sin, lengths, d


@pytest.mark.parametrize("inner", ["fused", "xla"])
@pytest.mark.parametrize("sp", [2, 4])
def test_ulysses_matches_single_device(inner, sp):
    qkv, cos, sin, lengths, d = qkv_inputs()
    h = qkv.shape[-1] // d
    want = qkv_rope_flash_attention(qkv, cos, sin, lengths, d**-0.5, h)

    mesh = make_mesh(sp=sp)
    got = jax.jit(
        lambda *a: ulysses_attention(*a, d**-0.5, d, mesh, inner=inner)
    )(qkv, cos, sin, lengths)
    atol = 0 if inner == "fused" else 2e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)


def test_ulysses_grads_match(sp=4):
    qkv, cos, sin, lengths, d = qkv_inputs()
    h = qkv.shape[-1] // d
    mesh = make_mesh(sp=sp)

    def loss_ref(qkv):
        return jnp.sum(qkv_rope_flash_attention(qkv, cos, sin, lengths, d**-0.5, h) ** 2)

    def loss_sp(qkv):
        return jnp.sum(ulysses_attention(qkv, cos, sin, lengths, d**-0.5, d, mesh) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(qkv)
    g_sp = jax.jit(jax.grad(loss_sp))(qkv)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref), atol=1e-5)


def sp_fixture(sp, dp, tp=1, b=4, t=64):
    kw = dict(
        patch_size=2, in_channels=4, hidden_size=128, depth=2, num_heads=8,
        num_classes=10, class_dropout_prob=0.0, attn_backend="fused",
    )
    base = FiT(**kw)
    mesh = make_mesh(dp=dp, sp=sp, tp=tp)
    sp_model = FiT(**kw, seq_mesh=mesh)
    head_dim = kw["hidden_size"] // kw["num_heads"]

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.normal(size=(b, t, 16)).astype(np.float32))
    pos = jnp.asarray(
        np.broadcast_to(rope_freqs_2d(head_dim, 8, t // 8, max_length=t), (b, t, head_dim))
        .copy().astype(np.float32)
    )
    mask = jnp.asarray(np.arange(t)[None] < rng.integers(t // 2, t + 1, size=(b, 1)))
    tvec = jnp.asarray(rng.integers(0, 100, size=(b,)).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 10, size=(b,)).astype(np.int32))
    args = (tokens, tvec, y, pos, mask)

    params = base.init({"params": jax.random.PRNGKey(0)}, *args, train=True)
    return base, sp_model, mesh, params, args


def shard_args(mesh, args):
    tokens, tvec, y, pos, mask = args
    return (
        jax.device_put(tokens, NamedSharding(mesh, token_spec(3))),
        jax.device_put(tvec, NamedSharding(mesh, P("data"))),
        jax.device_put(y, NamedSharding(mesh, P("data"))),
        jax.device_put(pos, NamedSharding(mesh, token_spec(3))),
        jax.device_put(mask, NamedSharding(mesh, token_spec(2))),
    )


@pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2), (1, 8)])
def test_full_model_forward_sp(dp, sp):
    base, sp_model, mesh, params, args = sp_fixture(sp=sp, dp=dp)
    want = np.asarray(base.apply(params, *args, train=True, rngs=RNGS))

    params_s = jax.device_put(params, NamedSharding(mesh, P()))
    got = jax.jit(lambda p, *a: sp_model.apply(p, *a, train=True, rngs=RNGS))(
        params_s, *shard_args(mesh, args)
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_full_model_grads_sp():
    base, sp_model, mesh, params, args = sp_fixture(sp=4, dp=2)

    def loss(model, p, tok):
        out = model.apply(p, tok, *args[1:], train=True, rngs=RNGS)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(lambda p: loss(base, p, args[0])))(params)
    params_s = jax.device_put(params, NamedSharding(mesh, P()))
    tok_s = shard_args(mesh, args)[0]
    g_sp = jax.jit(jax.grad(lambda p: loss(sp_model, p, tok_s)))(params_s)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)


def test_sp_composes_with_tp_and_fsdp():
    """dp=2 x sp=2 x tp=2: the 3D production layout. TP shards the qkv head
    groups; Ulysses further splits the LOCAL head count; FSDP shards the
    spare kernel dims over data."""
    base, sp_model, mesh, params, args = sp_fixture(sp=2, dp=2, tp=2)
    want = np.asarray(base.apply(params, *args, train=True, rngs=RNGS))

    with mesh:
        params_s, _ = shard_params(params, mesh, tp=True, fsdp=True)
        got = jax.jit(lambda p, *a: sp_model.apply(p, *a, train=True, rngs=RNGS))(
            params_s, *shard_args(mesh, args)
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_sp_partitioned_hlo_has_all_to_all_and_no_full_gather():
    """The compiled SP step must move activations with all-to-alls (the
    Ulysses signature), and must NOT all-gather a full-T activation
    (the pathological GSPMD fallback SP exists to avoid)."""
    _, sp_model, mesh, params, args = sp_fixture(sp=4, dp=2)
    params_s = jax.device_put(params, NamedSharding(mesh, P()))
    s_args = shard_args(mesh, args)
    lowered = jax.jit(
        lambda p, *a: sp_model.apply(p, *a, train=True, rngs=RNGS)
    ).lower(params_s, *s_args)
    hlo = lowered.compile().as_text()
    assert "all-to-all" in hlo
    b, t = args[0].shape[0], args[0].shape[1]
    d_model = sp_model.hidden_size
    # local shard of a (B, T, D) activation is (B/dp, T/sp, D); a full gather
    # would materialize (B/dp, T, D) fp32 outside the attention swap. The
    # all-to-all'd attention operands are (B/dp, T, 3C/sp) per shard — scan
    # for all-gather ops whose output is the full token axis at full width.
    bad = f"f32[{b // 2},{t},{d_model}]"
    for line in hlo.splitlines():
        if "all-gather" in line and bad in line:
            raise AssertionError(f"full-activation all-gather in SP HLO: {line}")


def test_seq_axis_requires_rope():
    mesh = make_mesh(sp=4)
    model = FiT(
        patch_size=2, in_channels=4, hidden_size=64, depth=1, num_heads=4,
        num_classes=8, pos_kind="absolute", seq_mesh=mesh,
    )
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(2, 32, 64)).astype(np.float32))
    mask = jnp.ones((2, 32), bool)
    with pytest.raises(AssertionError, match="RoPE"):
        model.init(
            {"params": jax.random.PRNGKey(0)},
            tokens, jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
            pos, mask, train=True,
        )


def test_trainer_sp_loss_matches_dp(tmp_path):
    """End-to-end Trainer with sp=2 (dp=4 x sp=2 mesh): the training loss
    stream equals the sp=1 (dp=8) run — SP is pure re-sharding, the math is
    unchanged (fp32, highest precision)."""
    import json

    rng = np.random.default_rng(5)
    root = tmp_path / "latents"
    for cls in ["a", "b"]:
        (root / cls).mkdir(parents=True)
        for i in range(8):
            np.save(root / cls / f"{i}.npy", rng.normal(size=(4, 16, 16)).astype(np.float16))

    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig

    def cfg(results, sp):
        return TrainConfig(
            feature_path=str(root), feature_val_path="",
            results_dir=str(results), model="FiT-S/2", image_size=64,
            num_classes=2, epochs=2, global_batch_size=8, grad_accum=1,
            log_every=1, compute_dtype="float32", attn_backend="fused",
            sp=sp,
        )

    def losses(results):
        out = {}
        with open(results / "FiT-S-2_metrics.jsonl") as f:
            for line in f:
                m = json.loads(line)
                if "train_loss" in m:
                    out[m["step"]] = m["train_loss"]
        return out

    Trainer(cfg(tmp_path / "dp", sp=1)).fit(max_steps=2)
    Trainer(cfg(tmp_path / "sp", sp=2)).fit(max_steps=2)
    want, got = losses(tmp_path / "dp"), losses(tmp_path / "sp")
    assert set(got) == set(want) and len(want) == 2
    for step in want:
        np.testing.assert_allclose(got[step], want[step], rtol=1e-5)
