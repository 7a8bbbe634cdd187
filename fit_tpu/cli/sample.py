"""Sampling CLI — reference-compatible flags
(``FiT/sample_lightning.py:91-100``).

Usage:
  python -m fit_tpu.cli.sample --checkpoint_path results/checkpoints \
      --num_samples 50000 --num_sampling_steps 250 --cfg_scale 1.5 \
      [--vae-checkpoint sd-vae-ft-ema.bin] [--sampler dpm]

Generates class-conditional latents batch-by-batch (batch 100, reference
``sample_lightning.py:27``) and, when VAE weights are available, decodes and
saves PNGs; otherwise saves latent .npy files.
"""

import argparse
import math
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Sample from a trained FiT")
    from fit_tpu.utils.config import SampleConfig, add_dataclass_args, from_args

    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--vae-checkpoint", type=str, default=None,
                        help="torch sd-vae checkpoint to convert for decoding")
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="sample directly from a reference (torch) FiT "
                             "checkpoint instead of an Orbax directory")
    add_dataclass_args(parser, SampleConfig)
    args = parser.parse_args()

    # hyperparameter restore (reference load_from_checkpoint semantics): the
    # Trainer writes results_dir/config.json next to checkpoints/ — reuse its
    # model/arch fields unless explicitly overridden
    config_path = args.config
    if config_path is None and args.checkpoint_path:
        for cand in (
            os.path.join(os.path.dirname(args.checkpoint_path.rstrip("/")), "config.json"),
            os.path.join(args.checkpoint_path, "config.json"),
        ):
            if os.path.exists(cand):
                config_path = cand
                break
    cfg = from_args(SampleConfig, args, config_path)

    import jax
    import jax.numpy as jnp

    from fit_tpu.models import create_fit
    from fit_tpu.sampling import FiTSampler
    from fit_tpu.train import create_train_state, make_optimizer
    from fit_tpu.utils.checkpoint import CheckpointManager

    model = create_fit(
        cfg.model, num_classes=cfg.num_classes, attn_backend=cfg.attn_backend,
        dtype=jnp.bfloat16, scan_blocks=cfg.scan_blocks,
    )

    if args.torch_checkpoint:
        # migrate a reference (torch/Lightning) checkpoint on the fly
        from fit_tpu.models.convert import load_torch_fit_checkpoint

        params = load_torch_fit_checkpoint(
            args.torch_checkpoint, depth=model.depth, scan_blocks=cfg.scan_blocks,
            prefer_ema=cfg.use_ema,
        )
        params = jax.tree.map(jnp.asarray, params)
        print(f"Converted torch checkpoint {args.torch_checkpoint}")
    else:
        # restore params (EMA by default, like the reference's EMA-swapped eval)
        head_dim = model.hidden_size // model.num_heads
        dummy_tokens = jnp.zeros((1, 8, model.patch_size**2 * model.in_channels))
        init_params = model.init(
            {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
            dummy_tokens, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 8, head_dim)), jnp.ones((1, 8), bool), train=True,
        )
        mgr = CheckpointManager(cfg.checkpoint_path)
        state, _ = mgr.restore(template=create_train_state(init_params, make_optimizer()))
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {cfg.checkpoint_path}")
        params = state.ema_params if cfg.use_ema else state.params
        print(f"Model loaded successfully (step {int(state.step)}, ema={cfg.use_ema})")

    vae = vae_params = None
    if args.vae_checkpoint:
        from fit_tpu.vae import AutoencoderKL, load_torch_checkpoint

        vae = AutoencoderKL(dtype=jnp.bfloat16)
        vae_params = load_torch_checkpoint(args.vae_checkpoint)
        decode = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))

    sampler = FiTSampler(
        model, num_sampling_steps=cfg.num_sampling_steps, cfg_scale=cfg.cfg_scale,
        sampler=cfg.sampler, num_classes=cfg.num_classes,
    )
    os.makedirs(cfg.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.global_seed)
    num_batches = math.ceil(cfg.num_samples / cfg.batch_size)

    for batch in range(num_batches):
        n = min(cfg.batch_size, cfg.num_samples - batch * cfg.batch_size)
        rng, lkey, skey = jax.random.split(rng, 3)
        labels = jax.random.randint(lkey, (n,), 0, cfg.num_classes)
        print(f"Starting sampling for batch {batch + 1}/{num_batches}")
        latents = sampler.sample(
            params, labels, skey, cfg.image_height, cfg.image_width,
        )
        labels_np = np.asarray(labels)
        if vae_params is not None:
            images = np.asarray(jax.device_get(decode(vae_params, latents)))
            images = np.clip((images + 1) / 2, 0, 1)
            from PIL import Image

            for i, img in enumerate(images):
                idx = batch * cfg.batch_size + i
                arr = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(cfg.output_dir, f"generated_image_{idx}_{labels_np[i]}.png")
                )
        else:
            lat = np.asarray(jax.device_get(latents))
            for i in range(n):
                idx = batch * cfg.batch_size + i
                np.save(
                    os.path.join(cfg.output_dir, f"latent_{idx}_{labels_np[i]}.npy"),
                    lat[i].astype(np.float16),
                )
    print("All batches processed successfully")


if __name__ == "__main__":
    main()
