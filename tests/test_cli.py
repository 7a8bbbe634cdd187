"""CLI end-to-end smoke: train a few steps through the train CLI wiring,
then sample from the saved checkpoint through the sample CLI (exercising the
config.json hyperparameter restore)."""

import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    for cls in ["a", "b"]:
        (root / "latents" / cls).mkdir(parents=True)
        for i in range(8):
            np.save(root / "latents" / cls / f"{i}.npy",
                    rng.normal(size=(4, 16, 16)).astype(np.float16))
    return root


def test_train_then_sample_cli(workdir, monkeypatch):
    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig, SampleConfig, add_dataclass_args, from_args
    import argparse

    results = str(workdir / "results")
    # train via the same config plumbing the CLI uses
    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, TrainConfig)
    args = parser.parse_args([
        "--model", "FiT-S/2", "--feature-path", str(workdir / "latents"),
        "--feature-val-path", "", "--results-dir", results,
        "--image-size", "64", "--num-classes", "2", "--epochs", "1",
        "--global-batch-size", "4", "--grad-accum", "1", "--log-every", "1",
        "--compute-dtype", "float32", "--attn-backend", "xla",
        "--scan-blocks", "false",
    ])
    cfg = from_args(TrainConfig, args)
    Trainer(cfg).fit(max_steps=2)
    assert os.path.exists(os.path.join(results, "config.json"))
    ckpt_dir = os.path.join(results, "checkpoints")

    # sample via the CLI main (argv-patched); no VAE -> latents saved as .npy
    out_dir = str(workdir / "samples")
    monkeypatch.setattr(sys, "argv", [
        "sample", "--checkpoint-path", ckpt_dir,
        "--num-samples", "2", "--num-sampling-steps", "2",
        "--image-height", "64", "--image-width", "64",
        "--batch-size", "2", "--output-dir", out_dir,
        "--attn-backend", "xla",
    ])
    from fit_tpu.cli.sample import main as sample_main

    sample_main()
    files = sorted(os.listdir(out_dir))
    assert len(files) == 2
    lat = np.load(os.path.join(out_dir, files[0]))
    assert lat.shape == (4, 8, 8)  # 64px / vae_scale 8
    assert np.isfinite(lat.astype(np.float32)).all()


def test_fid_cli_smoke(tmp_path, monkeypatch, capsys):
    """fid CLI end to end on synthetic inception weights: dir-vs-dir FID,
    --save-stats, and dir-vs-npz FID."""
    torch = pytest.importorskip("torch")
    Image = pytest.importorskip("PIL.Image")

    sys.path.insert(0, os.path.dirname(__file__))
    from test_inception import _fake_inception_sd

    weights = tmp_path / "inception.pt"
    torch.save({k: torch.tensor(v) for k, v in _fake_inception_sd().items()}, weights)

    rng = np.random.default_rng(4)
    for name in ("gen", "ref"):
        d = tmp_path / name
        d.mkdir()
        for i in range(4):
            arr = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    from fit_tpu.cli.fid import main as fid_main

    monkeypatch.setattr(sys, "argv", [
        "fid", "--samples-dir", str(tmp_path / "gen"),
        "--reference", str(tmp_path / "ref"),
        "--inception-weights", str(weights), "--batch-size", "4",
    ])
    fid_main()
    out = capsys.readouterr().out
    assert "FID:" in out
    fid_dir = float(out.strip().split("FID:")[1])
    assert np.isfinite(fid_dir)

    stats = tmp_path / "ref_stats.npz"
    monkeypatch.setattr(sys, "argv", [
        "fid", "--samples-dir", str(tmp_path / "ref"),
        "--inception-weights", str(weights), "--batch-size", "4",
        "--save-stats", str(stats),
    ])
    fid_main()
    assert stats.exists()

    monkeypatch.setattr(sys, "argv", [
        "fid", "--samples-dir", str(tmp_path / "gen"),
        "--reference", str(stats),
        "--inception-weights", str(weights), "--batch-size", "4",
    ])
    fid_main()
    out = capsys.readouterr().out
    fid_npz = float(out.strip().split("FID:")[-1])
    np.testing.assert_allclose(fid_npz, fid_dir, rtol=1e-6)
