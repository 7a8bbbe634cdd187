#!/usr/bin/env bash
# Real-weights end-to-end validation recipe (VERDICT r2 item 9 / missing #4).
#
# The build environment has zero egress, so sd-vae / InceptionV3 / reference
# FiT checkpoints cannot be downloaded there; numerical parity is proven by
# randomized torch-oracle tests instead (tests/test_vae.py,
# tests/test_inception.py, tests/test_torch_checkpoint_convert.py). On the
# FIRST machine that has real weights, run THIS script once to close the
# loop. It degrades to oracle mode (running those tests) when no weights are
# given.
#
# Usage:
#   scripts/validate_real_weights.sh \
#     [VAE_CKPT=/path/sd-vae-ft-ema.(bin|safetensors|ckpt)] \
#     [INCEPTION_CKPT=/path/pt_inception-2015-12-05-6726825d.pth] \
#     [FIT_CKPT=/path/fit-xl-2-imagenet256.pt] \
#     [REF_STATS=/path/VIRTUAL_imagenet256_labeled.npz]   # mu/sigma npz
#
# Expected results (tolerances chosen from the oracle-test margins):
#   [1] VAE decode parity:    max |jax - torch| < 2e-2 on [-1, 1] pixels
#                             (bf16-free fp32 decode; oracle tests see ~1e-4,
#                              2e-2 allows preprocessing differences)
#   [2] Inception parity:     max |pool3_jax - pool3_torch| < 1e-3
#   [3] Migration smoke:      sampling from the migrated reference ckpt
#                             produces finite latents/images at 256x256
#   [4] 1k-sample FID smoke:  FiT-XL/2 cfg=1.5 DDPM-250 at 256x256 should
#                             land in the 15-35 range vs full-ImageNet stats
#                             (1k samples inflate the published 50k FID of
#                             ~4.2 by roughly this much; >50 indicates a real
#                             pipeline bug, not sampling noise)
#   [5] int8 serving quality: same FID protocol through --quant int8
#                             [--quant-equalize 8]; expect <1 FID point of
#                             drift vs [4] (the local stand-in — int8 on the
#                             convergence-trained checkpoint — is recorded in
#                             artifacts/convergence/sample_stats_int8*.json)
set -euo pipefail
cd "$(dirname "$0")/.."
for kv in "$@"; do export "$kv"; done

VAE_CKPT="${VAE_CKPT:-}"
INCEPTION_CKPT="${INCEPTION_CKPT:-}"
FIT_CKPT="${FIT_CKPT:-}"
REF_STATS="${REF_STATS:-}"
OUT="${OUT:-/tmp/fit_tpu_validate}"
mkdir -p "$OUT"

if [[ -z "$VAE_CKPT" && -z "$INCEPTION_CKPT" && -z "$FIT_CKPT" ]]; then
  echo "== no real weights given: running the torch-oracle parity suites =="
  python -m pytest tests/test_vae.py tests/test_inception.py \
    tests/test_torch_checkpoint_convert.py -q
  echo "oracle mode OK — rerun with VAE_CKPT=/... INCEPTION_CKPT=/... on a"
  echo "machine with real weights to close the loop."
  exit 0
fi

if [[ -n "$VAE_CKPT" ]]; then
  echo "== [1] VAE decode parity vs torch (diffusers) =="
  python - "$VAE_CKPT" "$OUT" <<'PY'
import sys

import numpy as np

vae_ckpt, out = sys.argv[1], sys.argv[2]
import jax
from fit_tpu.vae import AutoencoderKL, convert_torch_state_dict
from fit_tpu.vae.convert import load_torch_checkpoint

params = convert_torch_state_dict(load_torch_checkpoint(vae_ckpt))
vae = AutoencoderKL()  # sd-vae defaults
rng = np.random.default_rng(0)
z = jax.numpy.asarray(rng.normal(size=(2, 4, 32, 32)).astype(np.float32) / 0.18215)
img = np.asarray(jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))(params, z))

try:
    import torch
    from diffusers import AutoencoderKL as TorchVAE

    tvae = TorchVAE.from_single_file(vae_ckpt) if vae_ckpt.endswith((".ckpt", ".safetensors")) else None
    if tvae is None:
        raise RuntimeError("load the matching diffusers VAE manually for this format")
    with torch.no_grad():
        ref = tvae.decode(torch.from_numpy(z)).sample.numpy()
    err = np.abs(img - ref).max()
    print(f"decode parity max err: {err:.5f} (expect < 2e-2)")
    assert err < 2e-2
except ImportError:
    print("torch/diffusers unavailable: decoded finite pixels only;",
          "range:", img.min(), img.max())
    assert np.isfinite(img).all()
PY
fi

if [[ -n "$INCEPTION_CKPT" ]]; then
  echo "== [2] InceptionV3 pool3 parity =="
  python - "$INCEPTION_CKPT" <<'PY'
import sys

import numpy as np

ckpt = sys.argv[1]
import jax.numpy as jnp
from fit_tpu.eval.inception import load_torch_inception, pool3_features

params = load_torch_inception(ckpt)
rng = np.random.default_rng(0)
imgs = rng.uniform(0, 1, size=(4, 3, 299, 299)).astype(np.float32)
feats = np.asarray(pool3_features(params, jnp.asarray(imgs), variant="fid"))
print("pool3 features:", feats.shape, "finite:", np.isfinite(feats).all())
try:
    import torch
    from pytorch_fid.inception import InceptionV3

    m = InceptionV3([3]).eval()
    with torch.no_grad():
        ref = m(torch.from_numpy(imgs))[0].squeeze(-1).squeeze(-1).numpy()
    err = np.abs(feats - ref).max()
    print(f"pool3 parity max err: {err:.5f} (expect < 1e-3)")
    assert err < 1e-3
except ImportError:
    print("pytorch_fid unavailable: checked finiteness only")
    assert np.isfinite(feats).all()
PY
fi

if [[ -n "$FIT_CKPT" ]]; then
  echo "== [3] reference-checkpoint migration + sampling smoke =="
  python -m fit_tpu.cli.sample \
    --torch-checkpoint "$FIT_CKPT" --model FiT-XL/2 \
    --num-samples 8 --num-sampling-steps 50 --cfg-scale 1.5 \
    ${VAE_CKPT:+--vae-checkpoint "$VAE_CKPT"} \
    --output-dir "$OUT/smoke"
  echo "smoke samples in $OUT/smoke"

  if [[ -n "$INCEPTION_CKPT" && -n "$REF_STATS" && -n "$VAE_CKPT" ]]; then
    echo "== [4] 1k-sample FID smoke =="
    python -m fit_tpu.cli.sample \
      --torch-checkpoint "$FIT_CKPT" --model FiT-XL/2 \
      --num-samples 1000 --num-sampling-steps 250 --cfg-scale 1.5 \
      --vae-checkpoint "$VAE_CKPT" --batch-size 32 \
      --output-dir "$OUT/fid_samples"
    python -m fit_tpu.cli.fid \
      --samples-dir "$OUT/fid_samples" --reference "$REF_STATS" \
      --inception-weights "$INCEPTION_CKPT"
    echo "(expect FID 15-35 at 1k samples; >50 = pipeline bug)"

    echo "== [5] int8 serving-path FID delta =="
    python -m fit_tpu.cli.sample \
      --torch-checkpoint "$FIT_CKPT" --model FiT-XL/2 \
      --num-samples 1000 --num-sampling-steps 250 --cfg-scale 1.5 \
      --quant int8 --quant-equalize 8 \
      --vae-checkpoint "$VAE_CKPT" --batch-size 32 \
      --output-dir "$OUT/fid_samples_int8"
    python -m fit_tpu.cli.fid \
      --samples-dir "$OUT/fid_samples_int8" --reference "$REF_STATS" \
      --inception-weights "$INCEPTION_CKPT"
    echo "(expect <1 FID point drift vs [4] — the SmoothQuant-equalized"
    echo " w8a8 path; compare artifacts/convergence/sample_stats_int8*.json)"
  fi
fi
echo "validation complete"
