"""Preprocessing CLI — reference-compatible
(``preprocess/preprocess.py:17-22``: ``--config config.json`` with
``{dataset_path, latent_folder, batch_size}``), plus flag overrides.

Usage:
  python -m fit_tpu.cli.preprocess --config config.json \
      --vae-checkpoint sd-vae-ft-ema/diffusion_pytorch_model.bin
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="VAE-encode an image dataset")
    from fit_tpu.utils.config import PreprocessConfig, add_dataclass_args, from_args

    parser.add_argument("--config", type=str, default=None)
    add_dataclass_args(parser, PreprocessConfig)
    args = parser.parse_args()
    cfg = from_args(PreprocessConfig, args, args.config)

    import jax

    from fit_tpu.data.preprocess import preprocess_folder
    from fit_tpu.vae import AutoencoderKL, load_torch_checkpoint

    if cfg.vae_checkpoint:
        vae_params = load_torch_checkpoint(cfg.vae_checkpoint)
    else:
        print("[preprocess] WARNING: no --vae-checkpoint given; using random "
              "VAE weights (useful only for pipeline smoke tests)")
        vae = AutoencoderKL()
        import jax.numpy as jnp

        vae_params = vae.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)), jax.random.PRNGKey(1)
        )

    written = preprocess_folder(
        cfg.dataset_path, cfg.latent_folder, vae_params,
        max_size=cfg.sample_size, patch_size=cfg.patch_size,
        batch_size=max(cfg.batch_size, 1),
    )
    print(f"[preprocess] wrote {len(written)} latents -> {cfg.latent_folder}")


if __name__ == "__main__":
    main()
