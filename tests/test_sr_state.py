"""bf16 optimizer/EMA state with stochastic rounding (train/state.py).

Why SR and not plain bf16: the Adam nu update adds (1-b2)=1e-3 of g^2 and
the EMA adds (1-decay)=1e-4 of the params per step — both below bf16's
~2^-8 relative resolution, so round-to-nearest ABSORBS the increment and
the accumulator freezes. Stochastic rounding keeps every cast unbiased in
expectation. These tests pin: (1) the SR cast's two-neighbor + unbiasedness
contract, (2) that SR-bf16 Adam tracks fp32 AdamW, (3) that the bf16 EMA
moves where nearest-rounded bf16 provably stalls, (4) dtype plumbing through
make_optimizer / create_train_state / the jitted train step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fit_tpu.train.state import (
    create_train_state,
    ema_update,
    make_optimizer,
    scale_by_adam_sr,
    stochastic_round,
)


def _bf16_neighbors(x32: np.ndarray):
    """(lower, upper) bf16 bracketing values of each fp32 element (x >= 0)."""
    bits = x32.view(np.uint32)
    lo = (bits & 0xFFFF0000).view(np.float32)
    hi = ((bits & 0xFFFF0000) + np.where(bits & 0xFFFF, 0x10000, 0)).view(np.uint32).view(np.float32)
    return lo, hi


def test_stochastic_round_two_neighbors_and_unbiased():
    x = np.float32(1.0 + 1e-3)  # strictly between two bf16 values
    lo, hi = _bf16_neighbors(np.array([x]))
    n = 4096
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    vals = np.array(
        [float(stochastic_round(jnp.full((1,), x), k)[0]) for k in keys[:256]]
    )
    # every draw is one of the two bf16 neighbors
    assert set(np.unique(vals)) <= {float(lo[0]), float(hi[0])}
    # unbiased: the mean over many draws approaches x (batch the rest)
    big = stochastic_round(jnp.full((n,), x), jax.random.PRNGKey(1))
    mean = float(jnp.mean(big.astype(jnp.float32)))
    ulp = float(hi[0] - lo[0])
    assert abs(mean - float(x)) < 0.05 * ulp, (mean, x, ulp)


def test_stochastic_round_exact_values_pass_through():
    # values already representable in bf16 must round to themselves always
    x = jnp.asarray(np.linspace(-4, 4, 33, dtype=np.float32))  # powers/sums of 2^-3
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    for seed in range(3):
        out = stochastic_round(x, jax.random.PRNGKey(seed))
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)), np.asarray(x)
        )


def test_stochastic_round_negative_unbiased():
    x = np.float32(-3.0 - 7e-3)
    n = 8192
    big = stochastic_round(jnp.full((n,), x), jax.random.PRNGKey(2))
    mean = float(jnp.mean(big.astype(jnp.float32)))
    assert abs(mean - float(x)) < 2e-3 * abs(x)


def test_adam_sr_tracks_fp32_adamw():
    """Same grads through fp32 optax.adamw and the SR-bf16 chain: parameter
    trajectories stay close over 20 steps (SR noise is zero-mean and tiny
    relative to the update scale)."""
    lr = 1e-2
    tx32 = make_optimizer(lr)
    tx16 = make_optimizer(lr, moment_dtype=jnp.bfloat16)
    p32 = {"w": jnp.ones((64,), jnp.float32), "b": jnp.full((8,), -0.5, jnp.float32)}
    p16 = jax.tree.map(jnp.copy, p32)
    s32, s16 = tx32.init(p32), tx16.init(p16)
    # moments are stored in bf16
    mus = [l for l in jax.tree.leaves(s16) if hasattr(l, "dtype") and l.ndim > 0]
    assert any(l.dtype == jnp.bfloat16 for l in mus)

    rng = np.random.default_rng(0)
    for _ in range(20):
        g = {
            "w": jnp.asarray(rng.normal(size=64).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=8).astype(np.float32)),
        }
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)

    for k in p32:
        d = float(jnp.max(jnp.abs(p32[k] - p16[k])))
        scale = float(jnp.max(jnp.abs(p32[k] - 1.0))) + 1e-6  # total movement
        assert d < 0.05 * max(scale, lr), (k, d, scale)


def test_adam_sr_weight_decay_matches_adamw_semantics():
    """wd != 0: the SR chain uses add_decayed_weights after the moment
    transform, exactly optax.adamw's composition."""
    lr, wd = 1e-2, 0.1
    tx32 = make_optimizer(lr, wd)
    tx16 = make_optimizer(lr, wd, moment_dtype=jnp.bfloat16)
    p = {"w": jnp.full((16,), 2.0, jnp.float32)}
    s32, s16 = tx32.init(p), tx16.init(p)
    g = {"w": jnp.zeros((16,), jnp.float32)}
    u32, _ = tx32.update(g, s32, p)
    u16, _ = tx16.update(g, s16, p)
    # zero grads -> update is pure weight decay: -lr * wd * p for both
    np.testing.assert_allclose(
        np.asarray(u16["w"]), np.asarray(u32["w"]), rtol=1e-6, atol=1e-8
    )


def test_ema_bf16_sr_moves_where_nearest_rounding_stalls():
    """decay 0.9999 toward a target 1% away: each fp32 increment is ~1e-6 —
    far below bf16 resolution at magnitude ~1. Nearest-rounding returns the
    identical bf16 value every step (stall); SR makes expected progress equal
    to the fp32 trajectory."""
    decay = 0.9999
    n = 4096
    target = jnp.full((n,), 1.01, jnp.float32)
    ema32 = jnp.ones((n,), jnp.float32)
    ema16 = ema32.astype(jnp.bfloat16)
    ema16_nearest = ema32.astype(jnp.bfloat16)

    key = jax.random.PRNGKey(3)
    steps = 400
    for i in range(steps):
        ema32 = ema_update(ema32, target, decay)
        key, k = jax.random.split(key)
        ema16 = ema_update(ema16, target, decay, key=k)
        # the broken alternative: round-to-nearest cast of the same lerp
        ema16_nearest = (
            decay * ema16_nearest.astype(jnp.float32) + (1 - decay) * target
        ).astype(jnp.bfloat16)

    moved32 = float(jnp.mean(ema32)) - 1.0
    moved16 = float(jnp.mean(ema16.astype(jnp.float32))) - 1.0
    moved_nearest = float(jnp.mean(ema16_nearest.astype(jnp.float32))) - 1.0
    assert moved32 > 3e-4  # fp32 reference made real progress
    # nearest-rounding stalls completely (this is WHY SR exists)
    assert abs(moved_nearest) < 1e-5, moved_nearest
    # SR tracks fp32 in expectation (mean over 4096 lanes kills the variance)
    assert abs(moved16 - moved32) < 0.1 * moved32, (moved16, moved32)


def test_ema_low_precision_requires_key():
    ema = jnp.ones((4,), jnp.bfloat16)
    with pytest.raises(ValueError, match="stochastic rounding"):
        ema_update(ema, jnp.zeros((4,), jnp.float32), 0.9999)


def test_create_train_state_ema_dtype_and_sharding_inheritance():
    params = {"w": jnp.ones((8, 8), jnp.float32)}
    tx = make_optimizer(moment_dtype=jnp.bfloat16)
    state = create_train_state(params, tx, ema_dtype=jnp.bfloat16)
    assert state.ema_params["w"].dtype == jnp.bfloat16
    inner = state.opt_state[0]  # scale_by_adam_sr state in the chain
    assert inner.mu["w"].dtype == jnp.bfloat16
    assert inner.nu["w"].dtype == jnp.bfloat16
    assert inner.mu["w"].shape == params["w"].shape


def test_train_step_with_bf16_state_runs_and_descends():
    """Full jitted train step (grad accum 2) with the bf16-SR state: loss is
    finite, state dtypes persist through the step, and 30 steps on a fixed
    batch reduce the loss (the optimizer actually optimizes)."""
    from fit_tpu.diffusion import create_diffusion
    from fit_tpu.models import FiT
    from fit_tpu.train import make_train_step

    model = FiT(
        patch_size=2, in_channels=4, hidden_size=32, depth=2, num_heads=2,
        num_classes=4, attn_backend="xla",
    )
    head_dim = model.hidden_size // model.num_heads
    b, t = 4, 16
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng.normal(size=(b, t, 16)).astype(np.float32)),
        "pos": jnp.asarray(rng.normal(size=(b, t, head_dim)).astype(np.float32)),
        "mask": jnp.ones((b, t), bool),
        "label": jnp.asarray(rng.integers(0, 4, size=b).astype(np.int32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        batch["tokens"][:1], jnp.zeros((1,), jnp.int32), batch["label"][:1],
        batch["pos"][:1], batch["mask"][:1], train=True,
    )
    tx = make_optimizer(1e-3, moment_dtype=jnp.bfloat16)
    state = create_train_state(params, tx, ema_dtype=jnp.bfloat16)
    step_fn = make_train_step(
        model.apply, create_diffusion(None), tx, grad_accum=2, donate=False
    )
    from fit_tpu.train.step import split_for_accumulation

    batch_acc = split_for_accumulation(batch, 2)
    losses = []
    for i in range(30):
        state, m = step_fn(state, batch_acc, jax.random.PRNGKey(42))  # fixed rng
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert jax.tree.leaves(state.ema_params)[0].dtype == jnp.bfloat16
    assert state.opt_state[0].mu and jax.tree.leaves(state.opt_state[0].mu)[0].dtype == jnp.bfloat16
    assert int(state.step) == 30


def test_sr_state_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of the bf16-SR train state: dtypes, the SR PRNG
    chain, and moment values survive the roundtrip bit-exactly (resume
    continues the identical stochastic-rounding stream)."""
    from fit_tpu.utils.checkpoint import CheckpointManager

    params = {"w": jnp.linspace(-1, 1, 32, dtype=jnp.float32)}
    tx = make_optimizer(1e-3, moment_dtype=jnp.bfloat16)
    state = create_train_state(params, tx, ema_dtype=jnp.bfloat16)
    g = {"w": jnp.ones((32,), jnp.float32)}
    u, opt = tx.update(g, state.opt_state, state.params)
    state = state.replace(opt_state=opt, params=optax.apply_updates(state.params, u))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(1, state)
    mgr.wait()
    template = create_train_state(params, tx, ema_dtype=jnp.bfloat16)
    restored, _ = mgr.restore(template=template)
    mgr.close()

    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continuing from the restored state reproduces the same SR stream
    u1, o1 = tx.update(g, state.opt_state, state.params)
    u2, o2 = tx.update(g, restored.opt_state, restored.params)
    np.testing.assert_array_equal(np.asarray(o1[0].mu["w"]), np.asarray(o2[0].mu["w"]))


def test_restore_train_state_detects_layout(tmp_path):
    """The sampling/demo CLIs restore checkpoints without knowing whether
    training used --optimizer-state-dtype bfloat16: restore_train_state
    tries the fp32 AdamW template, then falls back to the SR layout."""
    from fit_tpu.utils.checkpoint import CheckpointManager, restore_train_state

    params = {"w": jnp.linspace(0, 1, 16, dtype=jnp.float32)}

    # SR-flavored checkpoint
    tx = make_optimizer(moment_dtype=jnp.bfloat16)
    state = create_train_state(params, tx, ema_dtype=jnp.bfloat16)
    mgr = CheckpointManager(str(tmp_path / "sr"), async_save=False)
    mgr.save(3, state)
    mgr.wait()
    restored, _ = restore_train_state(mgr, params)
    mgr.close()
    assert restored is not None
    assert restored.ema_params["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(params["w"])
    )

    # fp32 AdamW checkpoint
    tx32 = make_optimizer()
    state32 = create_train_state(params, tx32)
    mgr32 = CheckpointManager(str(tmp_path / "f32"), async_save=False)
    mgr32.save(5, state32)
    mgr32.wait()
    restored32, _ = restore_train_state(mgr32, params)
    mgr32.close()
    assert restored32.ema_params["w"].dtype == jnp.float32

    # no checkpoint at all -> (None, None)
    empty = CheckpointManager(str(tmp_path / "empty"), async_save=False)
    assert restore_train_state(empty, params) == (None, None)
    empty.close()


def test_restore_train_state_honors_state_dtype_marker(tmp_path):
    """The Trainer stamps ``state_dtype`` into the host-state JSON; with the
    marker present restore_train_state must build the right template in ONE
    restore call (the probe-and-fallback path costs a full failed Orbax
    restore on multi-GB checkpoints)."""
    from fit_tpu.utils.checkpoint import CheckpointManager, restore_train_state

    params = {"w": jnp.linspace(0, 1, 16, dtype=jnp.float32)}
    tx = make_optimizer(moment_dtype=jnp.bfloat16)
    state = create_train_state(params, tx, ema_dtype=jnp.bfloat16)
    mgr = CheckpointManager(str(tmp_path / "sr"), async_save=False)
    mgr.save(3, state, host_state={"state_dtype": "bfloat16"})
    mgr.wait()

    calls = []
    orig = mgr.restore
    mgr.restore = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    restored, host = restore_train_state(mgr, params)
    mgr.close()
    assert len(calls) == 1, "marker present -> exactly one restore, no probing"
    assert restored.ema_params["w"].dtype == jnp.bfloat16
    assert host["state_dtype"] == "bfloat16"


def test_eval_step_with_bf16_ema_params():
    """Validation runs on state.ema_params (train/loop.py); under
    --optimizer-state-dtype bfloat16 the shadow is stored bf16. The eval
    loss must stay finite and match the fp32-shadow eval to bf16-storage
    tolerance (flax promotes the bf16 params per the model's dtype rules)."""
    from fit_tpu.diffusion import create_diffusion
    from fit_tpu.models import FiT
    from fit_tpu.train.step import make_eval_step

    model = FiT(
        patch_size=2, in_channels=4, hidden_size=32, depth=2, num_heads=2,
        num_classes=4, attn_backend="xla",
    )
    head_dim = model.hidden_size // model.num_heads
    b, t = 4, 16
    rng = np.random.default_rng(1)
    batch = {
        "tokens": jnp.asarray(rng.normal(size=(b, t, 16)).astype(np.float32)),
        "pos": jnp.asarray(rng.normal(size=(b, t, head_dim)).astype(np.float32)),
        "mask": jnp.ones((b, t), bool),
        "label": jnp.asarray(rng.integers(0, 4, size=b).astype(np.int32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        batch["tokens"][:1], jnp.zeros((1,), jnp.int32), batch["label"][:1],
        batch["pos"][:1], batch["mask"][:1], train=True,
    )
    state32 = create_train_state(params, make_optimizer())
    state16 = create_train_state(
        params, make_optimizer(moment_dtype=jnp.bfloat16), ema_dtype=jnp.bfloat16
    )
    eval_step = make_eval_step(model.apply, create_diffusion(None))
    key = jax.random.PRNGKey(9)
    l32 = float(eval_step(state32.ema_params, batch, key))
    l16 = float(eval_step(state16.ema_params, batch, key))
    assert np.isfinite(l16)
    # same params, bf16-rounded storage: ~1e-2 relative is bf16 resolution
    np.testing.assert_allclose(l16, l32, rtol=2e-2)
