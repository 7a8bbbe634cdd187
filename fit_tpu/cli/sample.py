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


def _resolve_vae_checkpoint(path: str, kind: str) -> str:
    """``--vae-checkpoint`` may be a file, or a directory in which the
    ``vae`` config field ("ema" | "mse") selects the reference's decode model
    (``sd-vae-ft-ema``/``-mse``, sample_lightning.py:24)."""
    if not os.path.isdir(path):
        return path
    for ext in (".bin", ".safetensors", ".pt", ".pth"):
        cand = os.path.join(path, f"sd-vae-ft-{kind}{ext}")
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"no sd-vae-ft-{kind} checkpoint under {path}")


def _parse_sizes(spec: str):
    """"256x256,224x288" -> [(256, 256), (224, 288)]."""
    sizes = []
    for part in spec.replace(" ", ",").split(","):
        if not part:
            continue
        h, w = part.lower().split("x")
        sizes.append((int(h), int(w)))
    return sizes


def load_model_and_params(cfg, torch_checkpoint=None, quant="none", equalize=0):
    """Build the FiT from a SampleConfig and restore params — Orbax (EMA by
    default, like the reference's EMA-swapped eval) or a migrated reference
    torch/Lightning checkpoint — optionally converting to the int8 serving
    path. Shared by the sample and serve CLIs."""
    import jax
    import jax.numpy as jnp

    from fit_tpu.models import create_fit
    from fit_tpu.train import create_train_state, make_optimizer
    from fit_tpu.utils.checkpoint import CheckpointManager

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    model = create_fit(
        cfg.model, num_classes=cfg.num_classes, attn_backend=cfg.attn_backend,
        dtype=dtype, scan_blocks=cfg.scan_blocks,
        ffn=getattr(cfg, "ffn", "swiglu"),
        moe_experts=getattr(cfg, "moe_experts", 8),
        moe_capacity=getattr(cfg, "moe_capacity", 1.25),
    )

    from fit_tpu.ops.quant import is_quantized_artifact

    if cfg.checkpoint_path and is_quantized_artifact(cfg.checkpoint_path):
        # pre-quantized serving artifact (cli.quantize): int8 params load
        # directly, no conversion pass
        from fit_tpu.ops.quant import load_quantized

        params, meta = load_quantized(cfg.checkpoint_path)
        print(f"Loaded int8 serving artifact ({meta.get('scheme')}, "
              f"model {meta.get('model', cfg.model)})")
        return model.clone(quant="int8"), params

    if torch_checkpoint:
        from fit_tpu.models.convert import load_torch_fit_checkpoint

        params = load_torch_fit_checkpoint(
            torch_checkpoint, depth=model.depth, scan_blocks=cfg.scan_blocks,
            prefer_ema=cfg.use_ema,
        )
        params = jax.tree.map(jnp.asarray, params)
        print(f"Converted torch checkpoint {torch_checkpoint}")
    else:
        head_dim = model.hidden_size // model.num_heads
        dummy_tokens = jnp.zeros((1, 8, model.patch_size**2 * model.in_channels))
        init_params = model.init(
            {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
            dummy_tokens, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 8, head_dim)), jnp.ones((1, 8), bool), train=True,
        )
        from fit_tpu.utils.checkpoint import restore_train_state

        mgr = CheckpointManager(cfg.checkpoint_path)
        state, _ = restore_train_state(mgr, init_params)
        if state is None:
            raise FileNotFoundError(f"no checkpoint under {cfg.checkpoint_path}")
        params = state.ema_params if cfg.use_ema else state.params
        print(f"Model loaded successfully (step {int(state.step)}, ema={cfg.use_ema})")

    if quant == "int8":
        from fit_tpu.ops.quant import quantize_model

        calib = None
        if equalize:
            # SmoothQuant equalization on data-free synthetic batches at the
            # serving resolution (ops.equalize; pass real latents through
            # quantize_model directly for data-grounded stats)
            import numpy as _np

            from fit_tpu.ops.equalize import synthetic_calib_batch

            rng = _np.random.default_rng(0)
            calib = [
                synthetic_calib_batch(model, rng, batch=4, size=cfg.image_height)
                for _ in range(int(equalize))
            ]
        model, params = quantize_model(model, params, calib_batches=calib)
        print(
            "Quantized dense projections to int8 (w8a8 serving path"
            + (f", equalized on {equalize} calib batches)" if equalize else ")")
        )
    return model, params


def main():
    parser = argparse.ArgumentParser(description="Sample from a trained FiT")
    from fit_tpu.utils.config import SampleConfig, add_dataclass_args, from_args

    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--vae-checkpoint", type=str, default=None,
                        help="torch sd-vae checkpoint to convert for decoding")
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="sample directly from a reference (torch) FiT "
                             "checkpoint instead of an Orbax directory")
    parser.add_argument("--quant", choices=["none", "int8"], default="none",
                        help="int8 = w8a8 quantized serving path for the "
                             "per-block projections (2x MXU rate on v5e; "
                             "see fit_tpu.ops.quant)")
    parser.add_argument("--quant-equalize", type=int, default=0, metavar="N",
                        help="with --quant int8: run SmoothQuant activation "
                             "equalization on N data-free calibration batches "
                             "before quantizing (fit_tpu.ops.equalize)")
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

    from fit_tpu.sampling import FiTSampler

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]
    model, params = load_model_and_params(
        cfg, torch_checkpoint=args.torch_checkpoint, quant=args.quant,
        equalize=args.quant_equalize,
    )

    vae = vae_params = None
    if args.vae_checkpoint:
        from fit_tpu.vae import AutoencoderKL, load_torch_checkpoint

        vae_path = _resolve_vae_checkpoint(args.vae_checkpoint, cfg.vae)
        vae = AutoencoderKL(dtype=dtype)
        vae_params = load_torch_checkpoint(vae_path)
        decode = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))

    sampler = FiTSampler(
        model, num_sampling_steps=cfg.num_sampling_steps, cfg_scale=cfg.cfg_scale,
        sampler=cfg.sampler, num_classes=cfg.num_classes,
    )
    os.makedirs(cfg.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.global_seed)
    num_batches = math.ceil(cfg.num_samples / cfg.batch_size)
    mixed_sizes = _parse_sizes(cfg.image_sizes) if cfg.image_sizes else None

    def save_png(idx: int, label: int, img: np.ndarray):
        from PIL import Image

        img = np.clip((img.astype(np.float32) + 1) / 2, 0, 1)
        arr = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(cfg.output_dir, f"generated_image_{idx}_{label}.png")
        )

    def save_one(idx: int, label: int, latent: np.ndarray):
        if vae_params is not None:
            save_png(idx, label, np.asarray(jax.device_get(decode(vae_params, latent[None])))[0])
        else:
            np.save(
                os.path.join(cfg.output_dir, f"latent_{idx}_{label}.npy"),
                np.asarray(latent).astype(np.float16),
            )

    for batch in range(num_batches):
        n = min(cfg.batch_size, cfg.num_samples - batch * cfg.batch_size)
        rng, lkey, skey = jax.random.split(rng, 3)
        labels = jax.random.randint(lkey, (n,), 0, cfg.num_classes)
        print(f"Starting sampling for batch {batch + 1}/{num_batches}")
        labels_np = np.asarray(labels)
        if mixed_sizes is not None:
            # packed mixed-resolution batch: one denoising run, per-sample
            # RoPE tables + masks (BASELINE config 4)
            sizes = [
                mixed_sizes[(batch * cfg.batch_size + i) % len(mixed_sizes)]
                for i in range(n)
            ]
            latents = sampler.sample_mixed(params, labels, sizes, skey)
            for i, lat in enumerate(latents):
                save_one(batch * cfg.batch_size + i, labels_np[i], jax.device_get(lat))
        else:
            latents = sampler.sample(
                params, labels, skey, cfg.image_height, cfg.image_width,
            )
            if vae_params is not None:  # one batched decode
                images = np.asarray(jax.device_get(decode(vae_params, latents)))
                for i in range(n):
                    save_png(batch * cfg.batch_size + i, labels_np[i], images[i])
            else:
                lat = np.asarray(jax.device_get(latents))
                for i in range(n):
                    save_one(batch * cfg.batch_size + i, labels_np[i], lat[i])
    print("All batches processed successfully")


if __name__ == "__main__":
    main()
