"""Quantize-once CLI: convert a trained checkpoint into an int8 serving
artifact (w8a8 scheme, ``ops.quant``), ~4x smaller than the fp32 training
checkpoint and loadable by the sample/serve CLIs without a conversion pass.

No reference counterpart (the reference serves fp32 torch); this is the
deployment face of the int8 serving path.

Usage:
  python -m fit_tpu.cli.quantize --checkpoint_path results/checkpoints \
      --output results/quantized [--model FiT-XL/2]
  python -m fit_tpu.cli.sample --checkpoint_path results/quantized ...
  python -m fit_tpu.cli.serve  --checkpoint_path results/quantized ...
"""

import argparse
import dataclasses
import json
import os


def main():
    from fit_tpu.utils.config import SampleConfig, add_dataclass_args, from_args

    parser = argparse.ArgumentParser(
        description="Convert a FiT checkpoint to an int8 serving artifact"
    )
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="quantize directly from a reference (torch) "
                             "checkpoint instead of an Orbax directory")
    parser.add_argument("--output", type=str, required=True,
                        help="directory for the quantized artifact")
    parser.add_argument("--equalize", type=int, default=0, metavar="N",
                        help="SmoothQuant activation equalization on N "
                             "data-free calibration batches before quantizing "
                             "(fit_tpu.ops.equalize; 0 = off)")
    add_dataclass_args(parser, SampleConfig)
    args = parser.parse_args()

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

    from fit_tpu.cli.sample import load_model_and_params
    from fit_tpu.ops.quant import save_quantized

    _, params = load_model_and_params(
        cfg, torch_checkpoint=args.torch_checkpoint, quant="int8",
        equalize=args.equalize,
    )
    os.makedirs(args.output, exist_ok=True)
    save_quantized(
        args.output, params,
        meta={"model": cfg.model, "num_classes": cfg.num_classes,
              "use_ema": cfg.use_ema, "equalized_batches": args.equalize},
    )
    # carry the sampling config next to the artifact so sample/serve restore
    # hyperparameters exactly like from a training results dir
    with open(os.path.join(args.output, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)
    print(f"Wrote int8 serving artifact to {args.output}")


if __name__ == "__main__":
    main()
