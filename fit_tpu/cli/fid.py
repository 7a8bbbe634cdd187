"""FID CLI — the in-repo completion of the reference's FID protocol.

The reference generates 50k samples and computes FID with an external tool
(``/root/reference/FiT/launch_sampling_FID.sbatch:13``); this CLI is that
tool, TPU-native: InceptionV3 pool3 features (converted torch weights,
``fit_tpu.eval.inception``) + Frechet distance (``fit_tpu.eval.fid``).

Usage:
  # FID between generated samples and a reference set (dir or stats .npz)
  python -m fit_tpu.cli.fid --samples-dir samples/ --reference ref_stats.npz \
      --inception-weights pt_inception-2015-12-05.pth

  # precompute reference statistics once
  python -m fit_tpu.cli.fid --samples-dir imagenet_val/ \
      --inception-weights ... --save-stats ref_stats.npz
"""

import argparse
import os

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _iter_images(path: str):
    """Yield (3, H, W) float32 images in [0, 1] from a directory tree."""
    from PIL import Image

    files = []
    for dirpath, _, names in os.walk(path):
        files.extend(
            os.path.join(dirpath, f)
            for f in names
            if os.path.splitext(f)[1].lower() in _IMG_EXTS
        )
    files.sort()
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        yield np.transpose(img, (2, 0, 1))


def _stats_of_dir(path: str, extractor, batch_size: int):
    from fit_tpu.eval.fid import feature_statistics

    feats, buf = [], []
    n = 0
    for img in _iter_images(path):
        buf.append(img)
        if len(buf) == batch_size:
            feats.append(extractor(np.stack(buf)))
            n += len(buf)
            buf = []
    if buf:
        feats.append(extractor(np.stack(buf)))
        n += len(buf)
    print(f"extracted features for {n} images from {path}")
    return feature_statistics(np.concatenate(feats, axis=0))


def main():
    parser = argparse.ArgumentParser(description="Compute FID (InceptionV3 pool3)")
    parser.add_argument("--samples-dir", type=str, required=True,
                        help="directory of generated images")
    parser.add_argument("--reference", type=str, default=None,
                        help="reference image directory or precomputed stats .npz "
                             "(with arrays mu, sigma)")
    parser.add_argument("--inception-weights", type=str, required=True,
                        help="torchvision or pytorch-fid InceptionV3 .pth/.pt")
    parser.add_argument("--variant", type=str, default="fid",
                        choices=("fid", "torchvision"),
                        help="pooling semantics: pytorch-fid's FIDInception "
                             "(default, comparable with published numbers) or "
                             "stock torchvision")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--save-stats", type=str, default=None,
                        help="write samples-dir statistics to this .npz and exit")
    args = parser.parse_args()

    from fit_tpu.eval.fid import frechet_distance
    from fit_tpu.eval.inception import load_torch_inception, make_feature_extractor

    extractor = make_feature_extractor(
        load_torch_inception(args.inception_weights), variant=args.variant
    )

    mu1, cov1 = _stats_of_dir(args.samples_dir, extractor, args.batch_size)
    if args.save_stats:
        np.savez(args.save_stats, mu=mu1, sigma=cov1)
        print(f"saved statistics to {args.save_stats}")
        return

    if not args.reference:
        parser.error("--reference is required unless --save-stats is given")
    if args.reference.endswith(".npz"):
        ref = np.load(args.reference)
        mu2, cov2 = ref["mu"], ref["sigma"]
    else:
        mu2, cov2 = _stats_of_dir(args.reference, extractor, args.batch_size)

    fid = frechet_distance(mu1, cov1, mu2, cov2)
    print(f"FID: {fid:.4f}")


if __name__ == "__main__":
    main()
