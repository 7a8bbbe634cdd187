"""Config system tests: dataclass->argparse bridging, JSON + CLI overrides."""

import argparse
import json

from fit_tpu.utils.config import (
    PreprocessConfig,
    SampleConfig,
    TrainConfig,
    add_dataclass_args,
    from_args,
)


def parse(cls, argv, json_path=None):
    p = argparse.ArgumentParser()
    add_dataclass_args(p, cls)
    args = p.parse_args(argv)
    return from_args(cls, args, json_path)


def test_train_defaults_match_reference():
    cfg = parse(TrainConfig, [])
    # reference flag defaults (FiT/train.py:296-314) + training practice
    assert cfg.model == "FiT-B/2"
    assert cfg.global_batch_size == 256
    assert cfg.epochs == 1400
    assert cfg.learning_rate == 1e-4 and cfg.weight_decay == 0.0
    assert cfg.ema_decay == 0.9999 and cfg.grad_accum == 2
    assert cfg.compute_dtype == "bfloat16"


def test_cli_overrides():
    cfg = parse(TrainConfig, [
        "--model", "FiT-XL/2", "--global-batch-size", "128",
        "--packing", "bucket", "--tp", "4", "--fsdp", "true",
    ])
    assert cfg.model == "FiT-XL/2"
    assert cfg.global_batch_size == 128
    assert cfg.packing == "bucket"
    assert cfg.tp == 4 and cfg.fsdp is True


def test_json_plus_cli(tmp_path):
    j = tmp_path / "cfg.json"
    j.write_text(json.dumps({"model": "FiT-L/2", "epochs": 5, "global_seed": 9}))
    p = argparse.ArgumentParser()
    add_dataclass_args(p, TrainConfig)
    args = p.parse_args(["--epochs", "7"])
    cfg = from_args(TrainConfig, args, str(j))
    assert cfg.model == "FiT-L/2"  # from json
    assert cfg.epochs == 7  # CLI wins
    assert cfg.global_seed == 9


def test_sample_config_reference_flags():
    cfg = parse(SampleConfig, [
        "--num_samples".replace("_", "-"), "50000",
        "--num-sampling-steps", "250", "--cfg-scale", "1.5",
        "--image-height", "512", "--image-width", "256",
    ])
    assert cfg.num_samples == 50000
    assert cfg.num_sampling_steps == 250
    assert cfg.cfg_scale == 1.5
    assert (cfg.image_height, cfg.image_width) == (512, 256)
    assert cfg.vae == "ema" and cfg.sampler == "ddim" and cfg.batch_size == 100


def test_preprocess_config():
    cfg = parse(PreprocessConfig, ["--sample-size", "512"])
    assert cfg.sample_size == 512
    assert cfg.batch_size == 1  # reference default (preprocess batch 1)
