"""True multi-process training test: 2 JAX processes x 2 virtual CPU devices
run the full Trainer over a process-spanning data-parallel mesh, and the loss
stream must match a single-process run on the identically-assembled global
batches (VERDICT round-1 item 5).

This is the piece the in-process 8-device tests cannot validate:
``jax.distributed.initialize``, cross-process collectives, and
``Trainer._device_batch``'s ``jax.make_array_from_process_local_data``
assembly of per-host loader shards into one global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_data(root):
    rng = np.random.default_rng(11)
    for cls in ["a", "b"]:
        d = root / cls
        d.mkdir(parents=True)
        for i in range(8):
            np.save(d / f"{i}.npy", rng.normal(size=(4, 16, 16)).astype(np.float16))


def _read_losses(path):
    out = {}
    with open(path) as f:
        for line in f:
            m = json.loads(line)
            if "train_loss" in m:
                out[m["step"]] = m["train_loss"]
    return out


def _run_workers(data, out, variant=None):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "mp_worker.py")
    extra = [variant] if variant else []
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(data), str(out)]
            + extra,
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        logs.append(stdout)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-4000:]}"


def test_two_process_training_matches_single_process(tmp_path):
    data = tmp_path / "latents"
    _make_data(data)
    out = tmp_path / "results"
    _run_workers(data, out)

    # both processes observed the same (fully-replicated) global loss
    l0 = _read_losses(out / "FiT-S-2_p0_metrics.jsonl")
    l1 = _read_losses(out / "FiT-S-2_p1_metrics.jsonl")
    assert set(l0) == {1, 2} and set(l1) == {1, 2}
    for s in l0:
        np.testing.assert_allclose(l0[s], l1[s], rtol=1e-5)

    # single-process reference on the SAME global batches: concat of the two
    # host-local loader shards, in device (= process) order
    from fit_tpu.data import LatentFolderDataset, LatentLoader
    from fit_tpu.diffusion import create_diffusion
    from fit_tpu.models import create_fit
    from fit_tpu.train import create_train_state, make_optimizer, make_train_step

    model = create_fit(
        "FiT-S/2", num_classes=2, attn_backend="xla", dtype=jnp.float32,
        remat=False, scan_blocks=False,
    )
    head_dim = model.hidden_size // model.num_heads
    ds = LatentFolderDataset(str(data), patch_size=2, sample_size=64,
                             vae_scale=8, channels=4, head_dim=head_dim)
    shards = [
        LatentLoader(ds, 4, mode="pad", seed=0, shard_id=i, num_shards=2)
        for i in range(2)
    ]
    t_len = ds.max_length
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, t_len, 16)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, t_len, head_dim)),
        jnp.ones((1, t_len), bool), train=True,
    )
    tx = make_optimizer(1e-4, 0.0)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model.apply, create_diffusion(None), tx,
                              ema_decay=0.9999, grad_accum=1, donate=False)

    batches = [list(s.epoch_batches(0)) for s in shards]
    rng = jax.random.PRNGKey(0)
    for step in (1, 2):
        merged = {
            k: np.concatenate([batches[0][step - 1][k], batches[1][step - 1][k]])
            for k in ("tokens", "pos", "mask", "label")
        }
        rng, k = jax.random.split(rng)
        state, metrics = step_fn(state, jax.tree.map(jnp.asarray, merged), k)
        np.testing.assert_allclose(l0[step], float(metrics["loss"]), rtol=1e-4)


def test_two_process_fused_tp_matches_single_process(tmp_path):
    """Fused Pallas attention + tp=2 across a REAL process boundary (VERDICT
    r3 item 4): 2 processes x 2 devices form a dp=2 x tp=2 mesh; the fused
    kernel's custom_partitioning, the shape-keyed AOT barrier, and the real
    distributed client's executable rendezvous all run together. Loss stream
    must match a single-process unsharded fused run on the same global
    batches (tp is numerics-preserving up to GSPMD reassociation)."""
    data = tmp_path / "latents"
    _make_data(data)
    out = tmp_path / "results"
    _run_workers(data, out, variant="fused_tp")

    l0 = _read_losses(out / "FiT-S-2_p0_metrics.jsonl")
    l1 = _read_losses(out / "FiT-S-2_p1_metrics.jsonl")
    assert set(l0) == {1, 2} and set(l1) == {1, 2}
    for s in l0:
        np.testing.assert_allclose(l0[s], l1[s], rtol=1e-5)

    from fit_tpu.data import LatentFolderDataset, LatentLoader
    from fit_tpu.diffusion import create_diffusion
    from fit_tpu.models import create_fit
    from fit_tpu.train import create_train_state, make_optimizer, make_train_step

    model = create_fit(
        "FiT-S/2", num_classes=2, attn_backend="fused", dtype=jnp.float32,
        remat=False, scan_blocks=False,
    )
    head_dim = model.hidden_size // model.num_heads
    ds = LatentFolderDataset(str(data), patch_size=2, sample_size=64,
                             vae_scale=8, channels=4, head_dim=head_dim)
    shards = [
        LatentLoader(ds, 4, mode="pad", seed=0, shard_id=i, num_shards=2)
        for i in range(2)
    ]
    t_len = ds.max_length
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, t_len, 16)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, t_len, head_dim)),
        jnp.ones((1, t_len), bool), train=True,
    )
    tx = make_optimizer(1e-4, 0.0)
    state = create_train_state(params, tx)
    step_fn = make_train_step(model.apply, create_diffusion(None), tx,
                              ema_decay=0.9999, grad_accum=1, donate=False)

    batches = [list(s.epoch_batches(0)) for s in shards]
    rng = jax.random.PRNGKey(0)
    for step in (1, 2):
        merged = {
            k: np.concatenate([batches[0][step - 1][k], batches[1][step - 1][k]])
            for k in ("tokens", "pos", "mask", "label")
        }
        rng, k = jax.random.split(rng)
        state, metrics = step_fn(state, jax.tree.map(jnp.asarray, merged), k)
        np.testing.assert_allclose(l0[step], float(metrics["loss"]), rtol=1e-4)
