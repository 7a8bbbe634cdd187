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


@pytest.fixture(scope="module")
def trained_ckpt(workdir):
    """Train 2 steps through the CLI config plumbing once; reused by every
    sampling-CLI smoke test."""
    from fit_tpu.train import Trainer
    from fit_tpu.utils.config import TrainConfig, add_dataclass_args, from_args
    import argparse

    results = str(workdir / "results")
    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, TrainConfig)
    args = parser.parse_args([
        "--model", "FiT-S/2", "--feature-path", str(workdir / "latents"),
        "--feature-val-path", "", "--results-dir", results,
        "--image-size", "64", "--num-classes", "2", "--epochs", "1",
        "--global-batch-size", "4", "--grad-accum", "1", "--log-every", "1",
        "--compute-dtype", "float32", "--attn-backend", "xla",
        "--scan-blocks", "false", "--allow-batch-replication", "true",
    ])
    cfg = from_args(TrainConfig, args)
    Trainer(cfg).fit(max_steps=2)
    assert os.path.exists(os.path.join(results, "config.json"))
    return os.path.join(results, "checkpoints")


def test_train_then_sample_cli(workdir, trained_ckpt, monkeypatch):
    ckpt_dir = trained_ckpt
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


def test_sample_cli_fp32_dtype(workdir, trained_ckpt, monkeypatch):
    """--dtype float32: the bit-parity contract (BASELINE 'fp32 per-step
    latents') must be runnable from the CLI (VERDICT round-1 item 8)."""
    out_dir = str(workdir / "samples_fp32")
    monkeypatch.setattr(sys, "argv", [
        "sample", "--checkpoint-path", trained_ckpt,
        "--num-samples", "1", "--num-sampling-steps", "2",
        "--image-height", "64", "--image-width", "64",
        "--batch-size", "1", "--output-dir", out_dir,
        "--attn-backend", "xla", "--dtype", "float32",
    ])
    from fit_tpu.cli.sample import main as sample_main

    sample_main()
    files = sorted(os.listdir(out_dir))
    assert len(files) == 1
    assert np.isfinite(np.load(os.path.join(out_dir, files[0])).astype(np.float32)).all()


def test_sample_cli_mixed_sizes(workdir, trained_ckpt, monkeypatch):
    """--image-sizes: mixed-resolution packed sampling from the CLI
    (BASELINE config 4) — one denoising run, two different output shapes."""
    out_dir = str(workdir / "samples_mixed")
    monkeypatch.setattr(sys, "argv", [
        "sample", "--checkpoint-path", trained_ckpt,
        "--num-samples", "2", "--num-sampling-steps", "2",
        "--image-sizes", "64x64,48x80",
        "--batch-size", "2", "--output-dir", out_dir,
        "--attn-backend", "xla",
    ])
    from fit_tpu.cli.sample import main as sample_main

    sample_main()
    files = sorted(os.listdir(out_dir))
    assert len(files) == 2
    shapes = {np.load(os.path.join(out_dir, f)).shape for f in files}
    assert shapes == {(4, 8, 8), (4, 6, 10)}


def test_sample_cli_int8_quant(workdir, trained_ckpt, monkeypatch):
    """--quant int8: the w8a8 serving path runs end-to-end from the CLI
    (ops.quant conversion after checkpoint restore)."""
    out_dir = str(workdir / "samples_int8")
    monkeypatch.setattr(sys, "argv", [
        "sample", "--checkpoint-path", trained_ckpt,
        "--num-samples", "1", "--num-sampling-steps", "2",
        "--image-height", "64", "--image-width", "64",
        "--batch-size", "1", "--output-dir", out_dir,
        "--attn-backend", "xla", "--quant", "int8",
    ])
    from fit_tpu.cli.sample import main as sample_main

    sample_main()
    files = sorted(os.listdir(out_dir))
    assert len(files) == 1
    assert np.isfinite(np.load(os.path.join(out_dir, files[0])).astype(np.float32)).all()


def test_quantize_cli_artifact_roundtrip(workdir, trained_ckpt, monkeypatch):
    """cli.quantize writes an int8 artifact; sampling from it produces
    byte-identical latents to on-the-fly --quant int8 from the original
    checkpoint (the artifact IS quantize_params' output)."""
    art_dir = str(workdir / "quantized")
    monkeypatch.setattr(sys, "argv", [
        "quantize", "--checkpoint-path", trained_ckpt, "--output", art_dir,
    ])
    from fit_tpu.cli.quantize import main as quantize_main

    quantize_main()
    assert os.path.exists(os.path.join(art_dir, "quant.json"))

    def sample_to(ckpt, out_dir, extra):
        monkeypatch.setattr(sys, "argv", [
            "sample", "--checkpoint-path", ckpt,
            "--num-samples", "1", "--num-sampling-steps", "2",
            "--image-height", "64", "--image-width", "64",
            "--batch-size", "1", "--output-dir", out_dir,
            "--attn-backend", "xla", *extra,
        ])
        from fit_tpu.cli.sample import main as sample_main

        sample_main()
        files = sorted(os.listdir(out_dir))
        assert len(files) == 1
        return np.load(os.path.join(out_dir, files[0]))

    a = sample_to(art_dir, str(workdir / "samples_art"), [])
    b = sample_to(trained_ckpt, str(workdir / "samples_fly"), ["--quant", "int8"])
    np.testing.assert_array_equal(a, b)


def test_vae_checkpoint_resolution(tmp_path):
    from fit_tpu.cli.sample import _parse_sizes, _resolve_vae_checkpoint

    assert _parse_sizes("256x256,224x288") == [(256, 256), (224, 288)]
    assert _parse_sizes("256x256 224x288") == [(256, 256), (224, 288)]

    (tmp_path / "sd-vae-ft-ema.bin").touch()
    (tmp_path / "sd-vae-ft-mse.safetensors").touch()
    assert _resolve_vae_checkpoint(str(tmp_path), "ema").endswith("sd-vae-ft-ema.bin")
    assert _resolve_vae_checkpoint(str(tmp_path), "mse").endswith("sd-vae-ft-mse.safetensors")
    # a direct file path passes through untouched
    f = tmp_path / "anything.pt"
    f.touch()
    assert _resolve_vae_checkpoint(str(f), "ema") == str(f)
    (tmp_path / "empty_dir").mkdir()
    with pytest.raises(FileNotFoundError):
        _resolve_vae_checkpoint(str(tmp_path / "empty_dir"), "ema")


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


def test_fid_cli_full_metric_suite(tmp_path, monkeypatch, capsys):
    """--metrics fid,is,pr: one CLI run prints all three, with IS from the
    checkpoint's fc head and PR consuming the raw feats the --save-stats
    npz now carries."""
    torch = pytest.importorskip("torch")
    Image = pytest.importorskip("PIL.Image")

    sys.path.insert(0, os.path.dirname(__file__))
    from test_inception import _fake_inception_sd

    rng = np.random.default_rng(5)
    sd = _fake_inception_sd()
    sd["fc.weight"] = (rng.normal(size=(1000, 2048)) * 0.02).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    weights = tmp_path / "inception_fc.pt"
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, weights)

    for name, n in (("gen", 8), ("ref", 8)):
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            arr = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    from fit_tpu.cli.fid import main as fid_main

    # save reference stats (must include feats for PR)
    stats = tmp_path / "ref_stats.npz"
    monkeypatch.setattr(sys, "argv", [
        "fid", "--samples-dir", str(tmp_path / "ref"),
        "--inception-weights", str(weights), "--batch-size", "4",
        "--save-stats", str(stats),
    ])
    fid_main()
    assert "feats" in np.load(stats)

    monkeypatch.setattr(sys, "argv", [
        "fid", "--samples-dir", str(tmp_path / "gen"),
        "--reference", str(stats),
        "--inception-weights", str(weights), "--batch-size", "4",
        "--metrics", "fid,sfid,is,pr",
    ])
    fid_main()
    out = capsys.readouterr().out
    assert "FID:" in out and "Inception Score:" in out and "Precision:" in out
    assert "sFID:" in out
    sfid = float(out.split("sFID:")[1].split()[0])
    assert np.isfinite(sfid) and sfid >= 0.0
    is_mean = float(out.split("Inception Score:")[1].split("+/-")[0])
    assert np.isfinite(is_mean) and is_mean >= 1.0 - 1e-6
    prec = float(out.split("Precision:")[1].split()[0])
    rec = float(out.split("Recall:")[1].split()[0])
    assert 0.0 <= prec <= 1.0 and 0.0 <= rec <= 1.0

    # pr without raw reference features must fail loudly, not silently skip;
    # same for sfid without spatial (mu_s/sigma_s) reference statistics
    bare = tmp_path / "bare_stats.npz"
    s = np.load(stats)
    np.savez(bare, mu=s["mu"], sigma=s["sigma"])
    for metric in ("pr", "sfid"):
        monkeypatch.setattr(sys, "argv", [
            "fid", "--samples-dir", str(tmp_path / "gen"),
            "--reference", str(bare),
            "--inception-weights", str(weights), "--batch-size", "4",
            "--metrics", metric,
        ])
        with pytest.raises(SystemExit):
            fid_main()
