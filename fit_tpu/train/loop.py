"""The training orchestrator: epochs, validation, checkpoint/resume, metrics.

Capability parity with the reference Lightning module + Trainer
(``/root/reference/FiT/train.py:31-293``) as one explicit loop: no callback
machinery — EMA/optimizer live inside the jitted step, checkpoints are Orbax
saves of the whole state, metrics go to JSONL (+ optional W&B), and the
profiler hook is ``jax.profiler`` traces instead of cProfile.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fit_tpu.data import LatentFolderDataset, LatentLoader
from fit_tpu.diffusion import create_diffusion
from fit_tpu.models import create_fit
from fit_tpu.parallel.mesh import make_mesh, shard_params
from fit_tpu.train.state import create_train_state, make_optimizer
from fit_tpu.train.step import make_eval_step, make_train_step, split_for_accumulation
from fit_tpu.utils.checkpoint import CheckpointManager
from fit_tpu.utils.config import TrainConfig
from fit_tpu.utils.logging import MetricLogger

__all__ = ["Trainer"]


def _local_np(x) -> np.ndarray:
    """This process's rows of a (possibly multi-host sharded) 1-D jax.Array
    (np.asarray on a non-fully-addressable array raises)."""
    shards = [s for s in x.addressable_shards if s.replica_id == 0]
    if not shards:
        return np.asarray(x)
    return np.concatenate([np.asarray(s.data) for s in shards])


class Trainer:
    def __init__(self, config: TrainConfig):
        self.cfg = config
        cfg = config
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]
        remat = cfg.remat if cfg.remat is not None else (cfg.packing == "pad")
        self.mesh = make_mesh(tp=cfg.tp, sp=cfg.sp, pp=cfg.pp, ep=cfg.ep)
        if cfg.pp > 1:
            assert cfg.tp == 1 and cfg.sp == 1 and cfg.ep == 1 and not cfg.fsdp, (
                "pp composes with dp only"
            )
            assert cfg.scan_blocks, "pipeline parallelism needs scan_blocks"
            assert cfg.ffn != "moe", "moe + pipeline parallelism not wired"
        if cfg.ep > 1:
            assert cfg.ffn == "moe" and cfg.moe_experts % cfg.ep == 0, (
                "expert parallelism needs ffn='moe' with moe_experts % ep == 0"
            )
        self.model = create_fit(
            cfg.model,
            num_classes=cfg.num_classes,
            attn_backend=cfg.attn_backend,
            dtype=dtype,
            remat=remat,
            scan_blocks=cfg.scan_blocks,
            ffn=cfg.ffn,
            moe_experts=cfg.moe_experts,
            moe_capacity=cfg.moe_capacity,
            moe_router_jitter=cfg.moe_router_jitter,
            # expert parallelism: MoE pins (B, E, C, D) expert activations
            # onto the 'expert' axis (models.moe._pin)
            ep_mesh=self.mesh if cfg.ep > 1 else None,
            # sequence parallelism: the model pins token-axis shardings and
            # routes attention through the Ulysses wrapper (parallel.sequence)
            seq_mesh=self.mesh if cfg.sp > 1 else None,
        )
        self.head_dim = self.model.hidden_size // self.model.num_heads
        self.diffusion = create_diffusion(None)  # 1000-step training process
        self._state_dtype = {
            "float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16
        }[cfg.optimizer_state_dtype]
        self.tx = make_optimizer(
            cfg.learning_rate, cfg.weight_decay,
            moment_dtype=None if self._state_dtype == jnp.float32 else self._state_dtype,
        )

        n_hosts = jax.process_count()
        self.host_id = jax.process_index()

        self.dataset = LatentFolderDataset(
            cfg.feature_path,
            patch_size=cfg.patch_size,
            sample_size=cfg.image_size,
            vae_scale=cfg.vae_scale,
            channels=cfg.channels,
            head_dim=self.head_dim,
        )
        per_host_batch = cfg.global_batch_size // n_hosts
        self.loader = LatentLoader(
            self.dataset,
            per_host_batch,
            mode={"pad": "pad", "bucket": "bucket"}[cfg.packing],
            seed=cfg.global_seed,
            shard_id=self.host_id,
            num_shards=n_hosts,
            buckets=cfg.token_buckets,
        )
        self.val_loader = None
        if cfg.feature_val_path and os.path.isdir(cfg.feature_val_path):
            val_ds = LatentFolderDataset(
                cfg.feature_val_path,
                patch_size=cfg.patch_size,
                sample_size=cfg.image_size,
                vae_scale=cfg.vae_scale,
                channels=cfg.channels,
                head_dim=self.head_dim,
                hflip=False,
            )
            self.val_loader = LatentLoader(
                val_ds, per_host_batch, mode="pad", shuffle=False,
                seed=cfg.global_seed, shard_id=self.host_id, num_shards=n_hosts,
            )

        # timestep importance sampler (host-side state; see timestep_samplers)
        from fit_tpu.diffusion.timestep_samplers import create_named_schedule_sampler

        self.t_sampler = create_named_schedule_sampler(
            cfg.timestep_sampler, self.diffusion.original_num_steps
        )
        self._use_t_sampler = cfg.timestep_sampler != "uniform"
        # per-host stream: hosts draw their LOCAL batch shard's timesteps
        self._t_rng = np.random.default_rng(
            cfg.global_seed * 9973 + 17 + self.host_id
        )

        apply_fn = self.model.apply
        if cfg.pp > 1:
            # pipeline parallelism: the block stack streams over the 'pipe'
            # mesh axis (parallel.pipeline); embedders/final stay replicated
            from fit_tpu.parallel.pipeline import make_pipelined_apply

            apply_fn = make_pipelined_apply(
                self.model, self.mesh, microbatches=cfg.pp_microbatches or cfg.pp
            )
        self.train_step = make_train_step(
            apply_fn, self.diffusion, self.tx,
            ema_decay=cfg.ema_decay, grad_accum=cfg.grad_accum,
            moe_aux_weight=cfg.moe_aux_weight if cfg.ffn == "moe" else 0.0,
        )
        self.eval_step = make_eval_step(apply_fn, self.diffusion)
        self.ckpt = CheckpointManager(os.path.join(cfg.results_dir, "checkpoints"))
        # persist the full config alongside checkpoints (the reference's
        # Lightning save_hyperparameters equivalent, train.py:40): sampling
        # can rebuild the exact model without re-specifying flags
        if self.host_id == 0:
            os.makedirs(cfg.results_dir, exist_ok=True)
            with open(os.path.join(cfg.results_dir, "config.json"), "w") as f:
                import dataclasses as _dc
                import json as _json

                _json.dump(_dc.asdict(cfg), f, indent=2)
        run_name = cfg.model.replace("/", "-")
        if n_hosts > 1:
            run_name = f"{run_name}_p{self.host_id}"  # one JSONL per host
        self.logger = MetricLogger(
            cfg.results_dir, run_name=run_name,
            use_wandb=cfg.use_wandb and self.host_id == 0,
            wandb_run_id=cfg.wandb_run_id,
        )
        self.start_epoch = 0
        self.start_batch = 0  # mid-epoch resume position (loader batches consumed)
        self._rng = None  # host PRNG state restored from a checkpoint
        self.state = None
        # multi-process: shape-keyed AOT executables (see _run_aligned)
        self._compiled_train: dict = {}
        self._compiled_eval: dict = {}

    def _run_aligned(self, fn, cache: dict, tag: str, *args):
        """Execute ``fn(*args)`` via a shape-keyed AOT-compiled executable,
        aligning processes at a barrier before each new executable's first run.

        Multi-process only. Every compiled executable initializes its own
        Gloo/collectives context at FIRST execution, under a hard ~30 s
        key-value-store deadline, and jit's lazy compilation happens at
        different times on different processes (cache state, host load): so
        for each NEW batch shape we lower + compile ahead-of-time, align all
        processes at a named coordination-service barrier, then execute — the
        context rendezvous happens in lockstep. ``.lower().compile()`` does
        NOT populate the jit dispatch cache, so later steps must reuse the
        executable from ``cache`` (advisor r2: the original fix covered only
        the literal first step, leaving step 2's lazy jit compile and every
        mid-training bucket shape exposed to the same DEADLINE_EXCEEDED race).

        Relies on all processes seeing the same batch-shape SEQUENCE — which
        global-batch assembly already requires (the bucket order is drawn
        from the shared ``global_seed``, identical on every host).
        """
        batch = args[1]
        key = tuple((k, tuple(v.shape), str(v.dtype)) for k, v in sorted(batch.items()))
        exe = cache.get(key)
        if exe is None:
            exe = fn.lower(*args).compile()
            from jax._src import distributed

            client = distributed.global_state.client
            if client is not None:
                client.wait_at_barrier(
                    f"fit_tpu_{tag}_{len(cache)}", timeout_in_ms=600_000
                )
            cache[key] = exe
        return exe(*args)

    def _init_state(self):
        cfg = self.cfg
        t_len = self.dataset.max_length
        dummy = {
            "tokens": jnp.zeros((1, t_len, cfg.patch_size**2 * cfg.channels)),
            "pos": jnp.zeros((1, t_len, self.head_dim)),
            "mask": jnp.ones((1, t_len), bool),
            "label": jnp.zeros((1,), jnp.int32),
        }
        params = self.model.init(
            {
                "params": jax.random.PRNGKey(cfg.global_seed),
                "label_dropout": jax.random.PRNGKey(cfg.global_seed + 1),
            },
            dummy["tokens"], jnp.zeros((1,), jnp.int32), dummy["label"],
            dummy["pos"], dummy["mask"], train=True,
        )
        params, _specs = shard_params(
            params, self.mesh, tp=cfg.tp > 1, fsdp=cfg.fsdp, ep=cfg.ep > 1
        )
        state = create_train_state(params, self.tx, ema_dtype=self._state_dtype)
        # every leaf must live on the mesh: scalar leaves (step, optimizer
        # count) are otherwise single-device, and an Orbax restore then mixes
        # device sets inside one jitted step ("incompatible devices")
        from jax.sharding import NamedSharding, PartitionSpec as P

        replicated = NamedSharding(self.mesh, P())
        state = jax.tree.map(
            lambda x: x
            if isinstance(getattr(x, "sharding", None), NamedSharding)
            else jax.device_put(x, replicated),
            state,
        )

        restored, host_state = self.ckpt.restore(template=state) if cfg.resume_from_checkpoint != "none" else (None, None)
        if restored is not None:
            state = restored
            if host_state:
                self.start_epoch = int(host_state.get("epoch", 0))
                self.start_batch = int(host_state.get("batch_index", 0))
                if "rng" in host_state:
                    self._rng = jnp.asarray(host_state["rng"], jnp.uint32)
            print(
                f"[fit_tpu] resumed at step {int(state.step)}, epoch "
                f"{self.start_epoch}, batch {self.start_batch}"
            )
        return state

    def _device_batch(
        self, batch: dict, grad_accum: Optional[int] = None, train: bool = True
    ) -> dict:
        cfg = self.cfg
        accum = cfg.grad_accum if grad_accum is None else grad_accum
        dev = {k: v for k, v in batch.items() if k in ("tokens", "pos", "mask", "label")}
        if train and self._use_t_sampler:
            # importance-sampled timesteps + reweighting enter the jitted
            # step as ordinary batch arrays. NOTE: with device prefetch the
            # draw uses sampler weights that lag the loss history by the
            # prefetch depth (2 steps) — the resampler's 10-deep history
            # makes that immaterial.
            ts, ws = self.t_sampler.sample(dev["tokens"].shape[0], self._t_rng)
            dev["t"] = jnp.asarray(ts)
            dev["t_weight"] = jnp.asarray(ws)
        if accum > 1:
            dev = split_for_accumulation(dev, accum)
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = self.mesh.shape["data"]
        batch_axis = 1 if accum > 1 else 0
        b = next(iter(dev.values())).shape[batch_axis]

        def spec_for(name: str, ndim: int) -> P:
            axes: list = [None] * ndim
            axes[batch_axis] = "data"
            # sequence parallelism: token-axis arrays additionally shard
            # over 'seq' (tokens (..., B, T, D), pos (..., B, T, d),
            # mask (..., B, T)); per-sample arrays (label, t, t_weight)
            # replicate over it
            if cfg.sp > 1 and name in ("tokens", "pos", "mask"):
                axes[batch_axis + 1] = "seq"
            return P(*axes)

        if jax.process_count() > 1:
            # multi-host: each process holds a DIFFERENT host-local shard of
            # the global batch (the loader shards per host, see __init__), so
            # assemble a global jax.Array from the per-process pieces —
            # device_put would wrongly treat the local array as the global
            # value (the Lightning-DDP capability, reference train.py:283)
            return {
                k: jax.make_array_from_process_local_data(
                    NamedSharding(self.mesh, spec_for(k, x.ndim)), x
                )
                for k, x in dev.items()
            }

        # single host: shard the (micro)batch axis over data
        if b % dp == 0:
            return {
                k: jax.device_put(x, NamedSharding(self.mesh, spec_for(k, x.ndim)))
                for k, x in dev.items()
            }
        if cfg.allow_batch_replication:
            # tiny test batches, explicitly opted in
            return jax.device_put(dev, NamedSharding(self.mesh, P()))
        raise ValueError(
            f"(micro)batch {b} does not divide the data axis (dp={dp}): "
            "this would silently replicate the batch on every device "
            f"(~{dp}x throughput loss). Fix global_batch_size/grad_accum "
            "or set allow_batch_replication=True."
        )

    def _device_prefetched(self, batches, depth: int = 2):
        """Yield ``(device_batch, host_batch)`` with device transfers enqueued
        ``depth`` batches ahead: ``device_put`` is asynchronous, so the
        host->device copy of batch N+1 overlaps the step on batch N instead
        of serializing with it (measured: real-data training goes from the
        transfer-bound rate to the synthetic-bench rate)."""
        import collections

        q = collections.deque()
        for b in batches:
            q.append((self._device_batch(b), b))
            if len(q) > depth:
                yield q.popleft()
        while q:
            yield q.popleft()

    def fit(self, max_steps: Optional[int] = None):
        cfg = self.cfg
        self.state = self._init_state() if self.state is None else self.state
        state = self.state
        # host PRNG: restored from the checkpoint on resume so the noise/t
        # stream continues exactly where the crashed run left off. The key is
        # deliberately identical on every host — the train step draws noise
        # for the GLOBAL batch inside jit, so this replicated input must
        # agree across processes (per-sample noise still differs because the
        # draw covers the whole global batch shape).
        rng = (
            self._rng
            if self._rng is not None
            else jax.random.PRNGKey(cfg.global_seed)
        )
        log_every = max(1, cfg.log_every)
        t_last = time.time()
        imgs_since = 0
        done = False

        host_step = int(state.step)
        for epoch in range(self.start_epoch, cfg.epochs):
            start_batch = self.start_batch if epoch == self.start_epoch else 0
            batch_index = start_batch
            for dev_batch, batch in self._device_prefetched(
                self.loader.prefetched(
                    epoch, num_threads=cfg.num_workers, start_batch=start_batch
                )
            ):
                rng, step_rng = jax.random.split(rng)
                if cfg.profile_dir and host_step == 10:
                    jax.profiler.start_trace(cfg.profile_dir)
                if jax.process_count() > 1:
                    state, metrics = self._run_aligned(
                        self.train_step, self._compiled_train, "train",
                        state, dev_batch, step_rng,
                    )
                else:
                    state, metrics = self.train_step(state, dev_batch, step_rng)
                if self._use_t_sampler:
                    # feed this step's (t, per-sample loss) into the resampler
                    # history (multi-host sync happens inside). The fetch
                    # synchronizes with the device each step — the price of
                    # loss-aware sampling, same as the reference's allgather.
                    self.t_sampler.update_with_local_losses(
                        _local_np(metrics["t"]), _local_np(metrics["t_loss"])
                    )
                host_step += 1
                batch_index += 1
                if cfg.profile_dir and host_step == 20:
                    jax.profiler.stop_trace()
                imgs_since += batch["tokens"].shape[0]
                step = host_step
                if step % log_every == 0:
                    loss = float(metrics["loss"])
                    dt = time.time() - t_last
                    extra = (
                        {"moe_aux": float(metrics["moe_aux"])}
                        if "moe_aux" in metrics
                        else {}
                    )
                    self.logger.log(
                        step, train_loss=loss,
                        grad_norm=float(metrics["grad_norm"]),
                        images_per_sec=imgs_since / max(dt, 1e-9),
                        epoch=epoch, **extra,
                    )
                    t_last, imgs_since = time.time(), 0
                if max_steps is not None and step >= max_steps:
                    done = True
                    break

            if self.val_loader is not None:
                val_losses = []
                for vb in self.val_loader.epoch_batches(0):
                    rng, vrng = jax.random.split(rng)
                    dev = self._device_batch(vb, grad_accum=1, train=False)
                    if jax.process_count() > 1:
                        vl = self._run_aligned(
                            self.eval_step, self._compiled_eval, "eval",
                            state.ema_params, dev, vrng,
                        )
                    else:
                        vl = self.eval_step(state.ema_params, dev, vrng)
                    val_losses.append(float(vl))
                if val_losses:
                    self.logger.log(int(state.step), val_loss=float(np.mean(val_losses)), epoch=epoch)

            if (epoch + 1) % cfg.ckpt_every_epochs == 0 or done:
                # loader position + host RNG ride along so resume replays
                # neither data nor noise (reference Lightning resume
                # semantics, FiT/train.py:293)
                ended = not done or batch_index >= len(self.loader)
                self.ckpt.save(
                    int(state.step),
                    state,
                    host_state={
                        "epoch": epoch + 1 if ended else epoch,
                        "batch_index": 0 if ended else batch_index,
                        "rng": np.asarray(rng, np.uint32).tolist(),
                        # layout marker: lets restore_train_state build the
                        # right opt-state template without probing
                        "state_dtype": cfg.optimizer_state_dtype,
                    },
                )
            if done:
                break

        self.ckpt.wait()
        self.state = state
        return state
