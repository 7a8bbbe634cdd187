"""Training CLI — reference-compatible flags (``FiT/train.py:296-314``).

Usage:
  python -m fit_tpu.cli.train --model FiT-B/2 --feature-path <latents> \
      --global-batch-size 128 --epochs 100 [--config cfg.json]
"""

import argparse

from fit_tpu.utils.config import TrainConfig, add_dataclass_args, from_args


def main():
    parser = argparse.ArgumentParser(description="Train a FiT model on TPU")
    parser.add_argument("--config", type=str, default=None, help="JSON config file")
    add_dataclass_args(parser, TrainConfig)
    args = parser.parse_args()
    cfg = from_args(TrainConfig, args, args.config)

    from fit_tpu.parallel.distributed import maybe_initialize
    from fit_tpu.train import Trainer

    n_hosts = maybe_initialize()
    if n_hosts > 1:
        print(f"[fit_tpu] multi-host: {n_hosts} processes")
    trainer = Trainer(cfg)
    trainer.fit(max_steps=cfg.max_steps or None)


if __name__ == "__main__":
    main()
