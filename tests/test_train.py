"""Training tests: loss/EMA/accumulation semantics, checkpoint round-trip,
and a short end-to-end fit on synthetic latents."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fit_tpu.diffusion import create_diffusion
from fit_tpu.models import FiT
from fit_tpu.train import (
    create_train_state,
    ema_update,
    make_optimizer,
    make_train_step,
    split_for_accumulation,
)


def tiny_model():
    return FiT(
        patch_size=2, in_channels=4, hidden_size=64, depth=2, num_heads=4,
        num_classes=5, attn_backend="xla",
    )


def make_batch(b=4, t=32, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(8, t + 1, size=b)
    tokens = rng.normal(size=(b, t, 16)).astype(np.float32)
    pos = rng.normal(size=(b, t, 16)).astype(np.float32)
    mask = (np.arange(t)[None] < lengths[:, None])
    tokens[~mask] = 0
    return {
        "tokens": jnp.asarray(tokens),
        "pos": jnp.asarray(pos),
        "mask": jnp.asarray(mask),
        "label": jnp.asarray(rng.integers(0, 5, size=b).astype(np.int32)),
    }


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    batch = make_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        batch["tokens"], jnp.zeros((4,), jnp.int32), batch["label"],
        batch["pos"], batch["mask"], train=True,
    )
    return model, params, batch


def test_ema_update_math():
    ema = {"a": jnp.ones((3,))}
    cur = {"a": jnp.zeros((3,))}
    out = ema_update(ema, cur, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.9)


def test_train_step_updates_and_loss_decreases(setup):
    model, params, batch = setup
    diffusion = create_diffusion(None)
    tx = make_optimizer(1e-3)
    step_fn = make_train_step(model.apply, diffusion, tx, grad_accum=1, donate=False)
    state = create_train_state(params, tx)
    losses = []
    rng = jax.random.PRNGKey(42)
    for i in range(30):
        rng, k = jax.random.split(rng)
        state, metrics = step_fn(state, batch, k)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    # eps-MSE starts near 1 (zero-init model predicts 0, target is N(0,1))
    assert 0.7 < losses[0] < 1.4
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # EMA trails params: not equal, but closer to params than init was
    p = jax.tree.leaves(state.params)[0]
    e = jax.tree.leaves(state.ema_params)[0]
    assert np.abs(np.asarray(p - e)).max() > 0


def test_grad_accum_matches_big_batch(setup):
    """grad_accum=2 over two microbatches == single step on the mean grads.
    We verify the resulting params are deterministic and in agreement with a
    manually averaged-gradient step."""
    model, params, _ = setup
    diffusion = create_diffusion(None)
    tx = make_optimizer(1e-3)
    from fit_tpu.train.step import diffusion_loss

    batch = make_batch(b=8, seed=3)
    split = split_for_accumulation(batch, 2)
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 2)

    # manual: average grads of the two microbatches (same per-micro rngs)
    g_fn = jax.grad(lambda p, mb, k: diffusion_loss(model.apply, p, diffusion, mb, k)[0])
    micro0 = {k: v[0] for k, v in split.items()}
    micro1 = {k: v[1] for k, v in split.items()}
    g0 = g_fn(params, micro0, keys[0])
    g1 = g_fn(params, micro1, keys[1])
    gmean = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)
    upd, _ = tx.update(gmean, tx.init(params), params)
    want = jax.tree.map(lambda p, u: p + u, params, upd)

    step_fn = make_train_step(model.apply, diffusion, tx, grad_accum=2, donate=False)
    state = create_train_state(params, tx)
    state, _m = step_fn(state, split, rng)
    got = state.params
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, setup):
    model, params, batch = setup
    from fit_tpu.utils.checkpoint import CheckpointManager

    tx = make_optimizer()
    state = create_train_state(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(5, state, host_state={"epoch": 2})
    mgr.wait()
    assert mgr.latest_step() == 5
    restored, host = mgr.restore(template=state)
    assert host == {"epoch": 2}
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_trainer_end_to_end(tmp_path):
    """Full Trainer on synthetic latents: a few steps run, metrics written,
    checkpoint saved, resume restores the step counter."""
    rng = np.random.default_rng(0)
    root = tmp_path / "latents"
    for cls in ["a", "b"]:
        (root / cls).mkdir(parents=True)
        for i in range(8):
            np.save(root / cls / f"{i}.npy", rng.normal(size=(4, 16, 16)).astype(np.float16))

    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        feature_path=str(root),
        feature_val_path="",
        results_dir=str(tmp_path / "results"),
        model="FiT-S/2",
        image_size=64,  # max_length = (64/2/8)^2 = 16 tokens
        num_classes=2,
        epochs=2,
        global_batch_size=4, allow_batch_replication=True,
        grad_accum=2,
        log_every=1,
        compute_dtype="float32",
        attn_backend="xla",
    )
    trainer = Trainer(cfg)
    state = trainer.fit(max_steps=3)
    assert int(state.step) == 3
    assert (tmp_path / "results" / "FiT-S-2_metrics.jsonl").exists()

    trainer2 = Trainer(cfg)
    state2 = trainer2._init_state()
    assert int(state2.step) == 3
    assert trainer2.start_epoch >= 0


def test_resume_fidelity_loss_and_data_stream(tmp_path):
    """train(6) == train(3) -> save -> restore -> train(3): the loss stream,
    data order, and host RNG stream all continue exactly (VERDICT round-1
    item 7; reference Lightning resume semantics, FiT/train.py:293)."""
    import json

    rng = np.random.default_rng(5)
    root = tmp_path / "latents"
    for cls in ["a", "b"]:
        (root / cls).mkdir(parents=True)
        for i in range(8):
            np.save(root / cls / f"{i}.npy", rng.normal(size=(4, 16, 16)).astype(np.float16))

    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig

    def cfg(results):
        return TrainConfig(
            feature_path=str(root), feature_val_path="",
            results_dir=str(results), model="FiT-S/2", image_size=64,
            num_classes=2, epochs=4, global_batch_size=4, allow_batch_replication=True, grad_accum=1,
            log_every=1, compute_dtype="float32", attn_backend="xla",
            scan_blocks=False,
        )

    def losses(results):
        out = {}
        with open(results / "FiT-S-2_metrics.jsonl") as f:
            for line in f:
                m = json.loads(line)
                if "train_loss" in m:
                    out[m["step"]] = m["train_loss"]
        return out

    # one-shot run: 6 steps (epoch 0 = 4 batches, epoch 1 = first 2)
    Trainer(cfg(tmp_path / "oneshot")).fit(max_steps=6)
    want = losses(tmp_path / "oneshot")

    # split run: 3 steps, crash mid-epoch, resume for 3 more
    split_dir = tmp_path / "split"
    Trainer(cfg(split_dir)).fit(max_steps=3)
    t2 = Trainer(cfg(split_dir))
    t2.fit(max_steps=6)
    got = losses(split_dir)

    assert set(want) == set(range(1, 7))
    assert set(got) == set(want)
    for step in want:
        np.testing.assert_allclose(got[step], want[step], rtol=1e-5)


def test_importance_sampled_loss_semantics(setup):
    """With host-drawn (t, weights) in the batch, the loss is the weighted
    mean of per-sample masked MSEs and the step surfaces (t, per-sample
    loss) for the resampler history (VERDICT r2 item 8: wire the sampler)."""
    from fit_tpu.diffusion.timestep_samplers import LossSecondMomentResampler
    from fit_tpu.train.step import _masked_per_sample_mse, diffusion_loss

    model, params, batch = setup
    diffusion = create_diffusion(None)
    b = batch["tokens"].shape[0]
    sampler = LossSecondMomentResampler(diffusion.original_num_steps)
    ts, ws = sampler.sample(b, np.random.default_rng(0))
    wb = dict(batch, t=jnp.asarray(ts), t_weight=jnp.asarray(ws))

    rng = jax.random.PRNGKey(5)
    loss, (t_out, per, _aux) = diffusion_loss(model.apply, params, diffusion, wb, rng)
    np.testing.assert_array_equal(np.asarray(t_out), ts)
    np.testing.assert_allclose(
        float(loss), float(np.mean(ws * np.asarray(per))), rtol=1e-6
    )
    # history update consumes exactly this stream
    sampler.update_with_local_losses(np.asarray(t_out), np.asarray(per))
    assert sampler._loss_counts.sum() == b

    # and the train step surfaces the same aux through metrics
    tx = make_optimizer(1e-3)
    step_fn = make_train_step(model.apply, diffusion, tx, grad_accum=1, donate=False)
    state = create_train_state(params, tx)
    _, metrics = step_fn(state, wb, rng)
    assert metrics["t"].shape == (b,) and metrics["t_loss"].shape == (b,)
    np.testing.assert_array_equal(np.asarray(metrics["t"]), ts)


def test_trainer_loss_second_moment_end_to_end(tmp_path):
    """Trainer with --timestep_sampler loss-second-moment: runs, feeds the
    resampler history each step, loss stays finite."""
    root = tmp_path / "feat"
    rng = np.random.default_rng(0)
    for cls in ("0", "1"):
        (root / cls).mkdir(parents=True)
        for i in range(8):
            np.save(root / cls / f"{i}.npy", rng.normal(size=(4, 16, 16)).astype(np.float16))

    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        feature_path=str(root), feature_val_path="",
        results_dir=str(tmp_path / "results"), model="FiT-S/2", image_size=64,
        num_classes=2, epochs=1, global_batch_size=4, allow_batch_replication=True,
        grad_accum=2, log_every=1, compute_dtype="float32", attn_backend="xla",
        timestep_sampler="loss-second-moment",
    )
    trainer = Trainer(cfg)
    state = trainer.fit(max_steps=3)
    assert int(state.step) == 3
    # 3 steps x 4 samples of history entered the resampler
    assert trainer.t_sampler._loss_counts.sum() == 12


def test_nondivisible_batch_raises(tmp_path):
    """A (micro)batch that doesn't divide the data axis must be a hard error
    (VERDICT r2: the silent replication fallback is a ~dp x throughput loss
    on a misconfigured real run), unless explicitly opted into."""
    import pytest as _pytest

    root = tmp_path / "feat"
    rng = np.random.default_rng(0)
    for cls in ("0",):
        (root / cls).mkdir(parents=True)
        for i in range(4):
            np.save(root / cls / f"{i}.npy", rng.normal(size=(4, 8, 8)).astype(np.float16))

    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        feature_path=str(root), feature_val_path="",
        results_dir=str(tmp_path / "results"), model="FiT-S/2", image_size=64,
        num_classes=1, epochs=1, global_batch_size=4, grad_accum=1,
        log_every=1, compute_dtype="float32", attn_backend="xla",
    )
    trainer = Trainer(cfg)  # 8-device mesh, dp=8; batch 4 doesn't divide
    batch = {
        "tokens": jnp.zeros((4, 16, 16)), "pos": jnp.zeros((4, 16, 8)),
        "mask": jnp.ones((4, 16), bool), "label": jnp.zeros((4,), jnp.int32),
    }
    with _pytest.raises(ValueError, match="does not divide the data axis"):
        trainer._device_batch(batch)


def test_loader_start_batch_resume():
    """epoch_batches(epoch, start_batch=k) reproduces the tail of the epoch
    exactly, and an explicit epoch argument no longer mutates the loader."""
    import tempfile, os
    from fit_tpu.data import LatentFolderDataset, LatentLoader

    rng = np.random.default_rng(6)
    with tempfile.TemporaryDirectory() as root:
        os.makedirs(os.path.join(root, "c"))
        for i in range(12):
            np.save(os.path.join(root, "c", f"{i}.npy"),
                    rng.normal(size=(4, 16, 16)).astype(np.float16))
        ds = LatentFolderDataset(root, sample_size=64)
        loader = LatentLoader(ds, 4, seed=3, native=False)

        full = list(loader.epoch_batches(1))
        tail = list(loader.epoch_batches(1, start_batch=2))
        assert len(tail) == len(full) - 2
        for a, b in zip(full[2:], tail):
            np.testing.assert_array_equal(a["tokens"], b["tokens"])
            np.testing.assert_array_equal(a["label"], b["label"])
        assert loader.epoch == 0  # explicit epoch leaves the counter alone

        pre = list(loader.prefetched(1, start_batch=2, num_threads=2))
        for a, b in zip(tail, pre):
            np.testing.assert_array_equal(a["tokens"], b["tokens"])


def test_trainer_validation_path(tmp_path):
    """Epoch-end validation: EMA params evaluated on the val loader, val_loss
    logged (reference train.py:71-95 semantics)."""
    import json

    rng = np.random.default_rng(2)
    for sub in ["train", "val"]:
        for cls in ["a", "b"]:
            d = tmp_path / sub / cls
            d.mkdir(parents=True)
            for i in range(4):
                np.save(d / f"{i}.npy", rng.normal(size=(4, 16, 16)).astype(np.float16))

    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        feature_path=str(tmp_path / "train"),
        feature_val_path=str(tmp_path / "val"),
        results_dir=str(tmp_path / "results"),
        model="FiT-S/2", image_size=64, num_classes=2, epochs=1,
        global_batch_size=4, allow_batch_replication=True, grad_accum=1, log_every=1,
        compute_dtype="float32", attn_backend="xla", scan_blocks=False,
    )
    trainer = Trainer(cfg)
    assert trainer.val_loader is not None
    trainer.fit()
    metrics = [
        json.loads(l)
        for l in open(tmp_path / "results" / "FiT-S-2_metrics.jsonl")
    ]
    val = [m for m in metrics if "val_loss" in m]
    assert val and np.isfinite(val[-1]["val_loss"])


def test_trainer_bucket_packing(tmp_path):
    """masked_FiT-style training: per-batch token buckets (each bucket is a
    separate compiled shape; loss must run for multiple bucket sizes)."""
    rng = np.random.default_rng(1)
    root = tmp_path / "latents"
    for cls in ["a", "b"]:
        (root / cls).mkdir(parents=True)
        for i in range(8):
            h, w = [(16, 16), (8, 24), (16, 24)][i % 3]
            np.save(root / cls / f"{i}.npy", rng.normal(size=(4, h, w)).astype(np.float16))

    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        feature_path=str(root),
        feature_val_path="",
        results_dir=str(tmp_path / "results"),
        model="FiT-S/2",
        image_size=64,  # budget 16 tokens
        num_classes=2,
        epochs=2,
        global_batch_size=4, allow_batch_replication=True,
        grad_accum=1,
        log_every=1,
        compute_dtype="float32",
        attn_backend="xla",
        packing="bucket",
        token_buckets=(8, 16),
        scan_blocks=False,
    )
    trainer = Trainer(cfg)
    state = trainer.fit(max_steps=4)
    assert int(state.step) == 4
