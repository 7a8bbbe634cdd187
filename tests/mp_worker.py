"""One JAX process of the true multi-process CPU training test.

Launched by ``test_multiprocess.py`` as ``python mp_worker.py <pid> <nproc>
<port> <data_root> <out_dir>``. Each process owns 2 virtual CPU devices, so
2 processes form a 4-device data-parallel mesh spanning a real process
boundary — the TPU-native analogue of the reference's Lightning-DDP
capability (``/root/reference/FiT/train.py:283``, SURVEY.md §2.2). This
exercises ``jax.distributed.initialize``, cross-process GSPMD collectives,
and the ``jax.make_array_from_process_local_data`` batch assembly in
``Trainer._device_batch`` — none of which the in-process 8-device tests can
reach.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the environment's sitecustomize force-sets jax_platforms="axon,cpu"; this
# test must stay off the (single, shared) real TPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/fit_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_root, out_dir = sys.argv[4], sys.argv[5]
    # "dp" (default): xla backend, pure data parallel. "fused_tp": Pallas
    # fused attention (interpret mode on CPU) + tp=2 — runs the kernel's
    # custom_partitioning under a REAL distributed client (VERDICT r3 item
    # 4: executable rendezvous + GSPMD partitioner across process
    # boundaries, the class of interaction the in-process tests can't reach)
    variant = sys.argv[6] if len(sys.argv) > 6 else "dp"

    from fit_tpu.parallel.distributed import maybe_initialize

    n = maybe_initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert n == nproc, f"process_count {n} != {nproc}"
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    # The FIRST cross-process collective initializes the Gloo clique under a
    # hard 30 s key-value deadline; if process start/compile skew exceeds it
    # (busy CI host) the whole run dies with DEADLINE_EXCEEDED. Align the
    # processes at the coordination-service barrier (no Gloo involved), then
    # establish the clique with a tiny warmup collective while in lockstep.
    from jax._src import distributed
    from jax.experimental import multihost_utils

    distributed.global_state.client.wait_at_barrier(
        "fit_tpu_pre_gloo", timeout_in_ms=240_000
    )
    multihost_utils.sync_global_devices("fit_tpu_gloo_warmup")

    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig

    cfg = TrainConfig(
        feature_path=data_root,
        feature_val_path="",
        results_dir=out_dir,  # shared dir; metrics JSONLs are per-process
        model="FiT-S/2",
        image_size=64,
        num_classes=2,
        epochs=1,
        global_batch_size=8,  # 4 per host, sharded dp=4 across both processes
        grad_accum=1,
        log_every=1,
        compute_dtype="float32",
        attn_backend="fused" if variant == "fused_tp" else "xla",
        tp=2 if variant == "fused_tp" else 1,
        scan_blocks=False,
        remat=False,
        ckpt_every_epochs=1,
    )
    trainer = Trainer(cfg)
    assert trainer.host_id == pid
    trainer.fit(max_steps=2)
    if variant == "fused_tp":
        print(f"worker {pid} done", flush=True)
        return

    # Timestep-resampler multi-host sync (VERDICT r2 item 8): each process
    # feeds DIFFERENT local (t, loss) pairs; update_with_local_losses
    # allgathers them, so the resulting weights must be IDENTICAL across
    # processes and reflect BOTH contributions (the reference's only
    # distributed collective, timestep_sampler.py:82-103).
    import numpy as np

    from fit_tpu.diffusion.timestep_samplers import LossSecondMomentResampler

    sampler = LossSecondMomentResampler(num_timesteps=4, history_per_term=2)
    local_t = np.asarray([pid * 2, pid * 2 + 1] * 2, np.int64)
    local_losses = np.asarray([1.0 + pid, 2.0 + pid] * 2, np.float64)
    sampler.update_with_local_losses(local_t, local_losses)
    assert sampler._warmed_up(), sampler._loss_counts  # both processes' t's arrived
    w = sampler.weights()
    gathered = multihost_utils.process_allgather(w)
    assert np.allclose(gathered[0], gathered[1]), gathered
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
