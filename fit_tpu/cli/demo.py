"""Demo sampling entry — the reference's in-module ``predict_step`` path
(``/root/reference/FiT/train.py:168-213``): a fixed set of 8 class labels,
high guidance (cfg 15), one image grid saved as ``sample.png``.

Usage:
  python -m fit_tpu.cli.demo --checkpoint_path results/checkpoints \
      [--vae-checkpoint sd-vae-ft-ema.bin] [--cfg_scale 15]
"""

import argparse

import numpy as np

# the reference's demo labels (train.py:178)
DEMO_LABELS = [207, 396, 372, 396, 88, 979, 417, 279]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_path", type=str, required=True)
    ap.add_argument("--model", type=str, default="FiT-B/2")
    ap.add_argument("--num_sampling_steps", type=int, default=250)
    ap.add_argument("--cfg_scale", type=float, default=15.0)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--vae-checkpoint", type=str, default=None)
    ap.add_argument("--out", type=str, default="sample.png")
    ap.add_argument("--scan-blocks", type=lambda s: s.lower() in ("1", "true"), default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fit_tpu.models import create_fit
    from fit_tpu.sampling import FiTSampler
    from fit_tpu.train import create_train_state, make_optimizer
    from fit_tpu.utils.checkpoint import CheckpointManager, restore_train_state

    model = create_fit(args.model, dtype=jnp.bfloat16, scan_blocks=args.scan_blocks)
    head_dim = model.hidden_size // model.num_heads
    init_params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8, model.patch_size**2 * model.in_channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, head_dim)), jnp.ones((1, 8), bool), train=True,
    )
    mgr = CheckpointManager(args.checkpoint_path)
    state, _ = restore_train_state(mgr, init_params)
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {args.checkpoint_path}")

    sampler = FiTSampler(
        model, num_sampling_steps=args.num_sampling_steps, cfg_scale=args.cfg_scale
    )
    latents = sampler.sample(
        state.ema_params, DEMO_LABELS, jax.random.PRNGKey(0),
        args.image_size, args.image_size,
    )

    if args.vae_checkpoint:
        from fit_tpu.vae import AutoencoderKL, load_torch_checkpoint

        vae = AutoencoderKL(dtype=jnp.bfloat16)
        vae_params = load_torch_checkpoint(args.vae_checkpoint)
        images = np.asarray(
            jax.device_get(vae.apply(vae_params, latents, method=AutoencoderKL.decode))
        )
        images = np.clip((images + 1) / 2, 0, 1)
        # 2x4 grid like the reference's save_image(nrow=4)
        n, c, h, w = images.shape
        grid = images.reshape(2, 4, c, h, w).transpose(0, 3, 1, 4, 2).reshape(2 * h, 4 * w, c)
        from PIL import Image

        Image.fromarray((grid * 255).astype(np.uint8)).save(args.out)
        print(f"saved {args.out}")
    else:
        np.save(args.out.replace(".png", "_latents.npy"), np.asarray(latents))
        print(f"no VAE weights; saved latents to {args.out.replace('.png', '_latents.npy')}")


if __name__ == "__main__":
    main()
