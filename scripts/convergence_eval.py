#!/usr/bin/env python
"""EMA-sample distribution check for the convergence run (phase C), plus the
model-based int8 quality measurement (VERDICT r3 items 1 & 6).

Samples latents from the converged EMA checkpoint at the dataset's dominant
latent shape and compares them STATISTICALLY to the training latents — no VAE
weights needed (egress-blocked), the comparison lives entirely in latent
space:

* per-channel mean/std vs the training set;
* nearest-neighbor L2 distance from each sample to the training set, against
  the training set's own leave-one-out NN distance (an overfit model's
  samples should land near training points — same scale, not collapsed).

With --quant int8 [--equalize N] the same protocol runs on the quantized
model and reports the quality drift of the serving path on TRAINED weights
(the r3 evidence was random-weights eps-RMS only).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def load_train_latents(root, shape=(4, 28, 36)):
    import torch

    out = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".pt"):
                x = torch.load(os.path.join(dirpath, f), map_location="cpu",
                               weights_only=True).numpy()
                if x.shape == shape:
                    out.append(x.astype(np.float32))
    return np.stack(out)


def nn_dists(a, b, exclude_self=False):
    """min_j ||a_i - b_j||_2 (flattened), optionally excluding the diagonal."""
    a2 = a.reshape(len(a), -1)
    b2 = b.reshape(len(b), -1)
    d2 = (
        np.sum(a2**2, 1)[:, None]
        + np.sum(b2**2, 1)[None]
        - 2 * a2 @ b2.T
    )
    if exclude_self:
        np.fill_diagonal(d2, np.inf)
    return np.sqrt(np.maximum(d2.min(axis=1), 0.0))


def sample_latents(model, params, n, hw_px, steps, seed, batch=32):
    import jax

    from fit_tpu.sampling import FiTSampler

    sampler = FiTSampler(
        model, num_sampling_steps=steps, cfg_scale=1.0, sampler="ddim",
        num_classes=1000,
    )
    outs = []
    rng = jax.random.PRNGKey(seed)
    import jax.numpy as jnp

    for i in range(0, n, batch):
        k = min(batch, n - i)
        rng, skey = jax.random.split(rng)
        labels = jnp.zeros((k,), jnp.int32)  # the single training class
        lat = sampler.sample(params, labels, skey, hw_px[0], hw_px[1])
        outs.append(np.asarray(jax.device_get(lat), np.float32))
    return np.concatenate(outs)


def stats_vs_train(gen, train):
    train_aug = np.concatenate([train, train[..., ::-1]])  # hflip, as trained
    ch_mean_g = gen.mean(axis=(0, 2, 3))
    ch_std_g = gen.std(axis=(0, 2, 3))
    ch_mean_t = train_aug.mean(axis=(0, 2, 3))
    ch_std_t = train_aug.std(axis=(0, 2, 3))
    d_gen = nn_dists(gen, train_aug)
    d_loo = nn_dists(train_aug, train_aug, exclude_self=True)
    return {
        "channel_mean_gen": ch_mean_g.tolist(),
        "channel_mean_train": ch_mean_t.tolist(),
        "channel_std_gen": ch_std_g.tolist(),
        "channel_std_train": ch_std_t.tolist(),
        "mean_abs_err_over_std": float(
            np.mean(np.abs(ch_mean_g - ch_mean_t) / ch_std_t)
        ),
        "std_ratio": (ch_std_g / ch_std_t).tolist(),
        "nn_dist_gen_p50": float(np.median(d_gen)),
        "nn_dist_train_loo_p50": float(np.median(d_loo)),
        "nn_ratio_p50": float(np.median(d_gen) / np.median(d_loo)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="training results dir (with checkpoints/)")
    ap.add_argument("--latents", default="/root/reference/latent")
    ap.add_argument("--artifacts", default="artifacts/convergence")
    ap.add_argument("--num-samples", type=int, default=96)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--quant", choices=["none", "int8"], default="none")
    ap.add_argument("--equalize", type=int, default=0)
    ap.add_argument("--tag", default=None, help="artifact name suffix")
    # convergence-matrix cells: the moe cell's checkpoint needs the matching
    # model flavor to restore (sr/bucket cells share the dense architecture)
    ap.add_argument("--ffn", choices=["swiglu", "moe"], default="swiglu")
    ap.add_argument("--moe-experts", type=int, default=4)
    args = ap.parse_args()

    from fit_tpu.cli.sample import load_model_and_params
    from fit_tpu.utils.config import SampleConfig

    cfg = SampleConfig(
        checkpoint_path=os.path.join(args.run_dir, "checkpoints"),
        model="FiT-B/2", use_ema=True, dtype="bfloat16", scan_blocks=True,
        ffn=args.ffn, moe_experts=args.moe_experts,
    )
    model, params = load_model_and_params(
        cfg, quant=args.quant, equalize=args.equalize
    )

    train = load_train_latents(args.latents)  # (N, 4, 28, 36) dominant shape
    print(f"{len(train)} training latents at the dominant (4, 28, 36) shape")
    gen = sample_latents(
        model, params, args.num_samples, (28 * 8, 36 * 8), args.steps, seed=0
    )
    res = stats_vs_train(gen, train)
    res["num_samples"] = args.num_samples
    res["sampler_steps"] = args.steps
    res["quant"] = args.quant
    res["equalize_batches"] = args.equalize

    # learned-distribution checks (generous: 96 samples of a 311-image
    # overfit): channel means within 0.35 train-sigma, stds within 35%,
    # samples land at the training set's own NN-distance scale (not
    # collapsed onto points — ratio >> 0 — nor far off-manifold)
    ok = (
        res["mean_abs_err_over_std"] < 0.35
        and all(0.65 < r < 1.35 for r in res["std_ratio"])
        and 0.3 < res["nn_ratio_p50"] < 3.0
    )
    res["distribution_match"] = bool(ok)

    os.makedirs(args.artifacts, exist_ok=True)
    tag = args.tag or (args.quant if args.quant != "none" else "ema")
    path = os.path.join(args.artifacts, f"sample_stats_{tag}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))
    print(f"-> {path}")
    if not ok:
        raise SystemExit("distribution mismatch — see stats above")


if __name__ == "__main__":
    main()
