"""InceptionV3 pool3 tests: converted torch weights through the JAX network
must reproduce a pure-torch oracle (torchvision ``inception_v3`` semantics,
incl. pytorch-fid's FIDInception pooling deviations), and the extractor must
plug into the FID pipeline."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from fit_tpu.eval.inception import (  # noqa: E402
    convert_torch_inception,
    inception_logits,
    make_feature_extractor,
    make_logits_extractor,
    make_suite_extractor,
    pool3_and_spatial_features,
    pool3_features,
)


# ---------------------------------------------------------------------------
# synthetic torchvision-layout state dict
# ---------------------------------------------------------------------------


def _conv_specs():
    """(out, in, kh, kw) for every BasicConv2d in torchvision Inception3."""
    s = {}

    def c(name, o, i, kh, kw=None):
        s[name] = (o, i, kh, kh if kw is None else kw)

    c("Conv2d_1a_3x3", 32, 3, 3)
    c("Conv2d_2a_3x3", 32, 32, 3)
    c("Conv2d_2b_3x3", 64, 32, 3)
    c("Conv2d_3b_1x1", 80, 64, 1)
    c("Conv2d_4a_3x3", 192, 80, 3)

    def block_a(name, in_ch, pool_f):
        c(f"{name}.branch1x1", 64, in_ch, 1)
        c(f"{name}.branch5x5_1", 48, in_ch, 1)
        c(f"{name}.branch5x5_2", 64, 48, 5)
        c(f"{name}.branch3x3dbl_1", 64, in_ch, 1)
        c(f"{name}.branch3x3dbl_2", 96, 64, 3)
        c(f"{name}.branch3x3dbl_3", 96, 96, 3)
        c(f"{name}.branch_pool", pool_f, in_ch, 1)

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)

    c("Mixed_6a.branch3x3", 384, 288, 3)
    c("Mixed_6a.branch3x3dbl_1", 64, 288, 1)
    c("Mixed_6a.branch3x3dbl_2", 96, 64, 3)
    c("Mixed_6a.branch3x3dbl_3", 96, 96, 3)

    def block_c(name, c7):
        c(f"{name}.branch1x1", 192, 768, 1)
        c(f"{name}.branch7x7_1", c7, 768, 1)
        c(f"{name}.branch7x7_2", c7, c7, 1, 7)
        c(f"{name}.branch7x7_3", 192, c7, 7, 1)
        c(f"{name}.branch7x7dbl_1", c7, 768, 1)
        c(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        c(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        c(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        c(f"{name}.branch7x7dbl_5", 192, c7, 1, 7)
        c(f"{name}.branch_pool", 192, 768, 1)

    block_c("Mixed_6b", 128)
    block_c("Mixed_6c", 160)
    block_c("Mixed_6d", 160)
    block_c("Mixed_6e", 192)

    c("Mixed_7a.branch3x3_1", 192, 768, 1)
    c("Mixed_7a.branch3x3_2", 320, 192, 3)
    c("Mixed_7a.branch7x7x3_1", 192, 768, 1)
    c("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    c("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    c("Mixed_7a.branch7x7x3_4", 192, 192, 3)

    def block_e(name, in_ch):
        c(f"{name}.branch1x1", 320, in_ch, 1)
        c(f"{name}.branch3x3_1", 384, in_ch, 1)
        c(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        c(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        c(f"{name}.branch3x3dbl_1", 448, in_ch, 1)
        c(f"{name}.branch3x3dbl_2", 384, 448, 3)
        c(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        c(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        c(f"{name}.branch_pool", 192, in_ch, 1)

    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return s


def _fake_inception_sd(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    for name, (o, i, kh, kw) in _conv_specs().items():
        fan_in = i * kh * kw
        sd[f"{name}.conv.weight"] = (
            rng.normal(size=(o, i, kh, kw)) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        sd[f"{name}.bn.weight"] = (1.0 + 0.1 * rng.normal(size=(o,))).astype(np.float32)
        sd[f"{name}.bn.bias"] = (0.05 * rng.normal(size=(o,))).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = (0.05 * rng.normal(size=(o,))).astype(np.float32)
        sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, size=(o,)).astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# pure-torch oracle (torchvision Inception3 feature-path semantics)
# ---------------------------------------------------------------------------


def _torch_pool3_oracle(sd_np, x_np, fid=True, return_spatial=False):
    sd = {k: torch.tensor(v) for k, v in sd_np.items()}

    def cbn(x, name, stride=1, padding=0):
        y = F.conv2d(x, sd[f"{name}.conv.weight"], stride=stride, padding=padding)
        y = F.batch_norm(
            y, sd[f"{name}.bn.running_mean"], sd[f"{name}.bn.running_var"],
            sd[f"{name}.bn.weight"], sd[f"{name}.bn.bias"], training=False, eps=1e-3,
        )
        return F.relu(y)

    def avg(x):
        return F.avg_pool2d(x, 3, 1, 1, count_include_pad=not fid)

    def block_a(x, n):
        b1 = cbn(x, f"{n}.branch1x1")
        b5 = cbn(cbn(x, f"{n}.branch5x5_1"), f"{n}.branch5x5_2", padding=2)
        b3 = cbn(cbn(cbn(x, f"{n}.branch3x3dbl_1"), f"{n}.branch3x3dbl_2", padding=1),
                 f"{n}.branch3x3dbl_3", padding=1)
        bp = cbn(avg(x), f"{n}.branch_pool")
        return torch.cat([b1, b5, b3, bp], 1)

    def block_c(x, n):
        b1 = cbn(x, f"{n}.branch1x1")
        b7 = cbn(cbn(cbn(x, f"{n}.branch7x7_1"), f"{n}.branch7x7_2", padding=(0, 3)),
                 f"{n}.branch7x7_3", padding=(3, 0))
        bd = cbn(x, f"{n}.branch7x7dbl_1")
        bd = cbn(bd, f"{n}.branch7x7dbl_2", padding=(3, 0))
        bd = cbn(bd, f"{n}.branch7x7dbl_3", padding=(0, 3))
        bd = cbn(bd, f"{n}.branch7x7dbl_4", padding=(3, 0))
        bd = cbn(bd, f"{n}.branch7x7dbl_5", padding=(0, 3))
        bp = cbn(avg(x), f"{n}.branch_pool")
        return torch.cat([b1, b7, bd, bp], 1)

    def block_e(x, n, pool):
        b1 = cbn(x, f"{n}.branch1x1")
        b3 = cbn(x, f"{n}.branch3x3_1")
        b3 = torch.cat([cbn(b3, f"{n}.branch3x3_2a", padding=(0, 1)),
                        cbn(b3, f"{n}.branch3x3_2b", padding=(1, 0))], 1)
        bd = cbn(cbn(x, f"{n}.branch3x3dbl_1"), f"{n}.branch3x3dbl_2", padding=1)
        bd = torch.cat([cbn(bd, f"{n}.branch3x3dbl_3a", padding=(0, 1)),
                        cbn(bd, f"{n}.branch3x3dbl_3b", padding=(1, 0))], 1)
        if pool == "max":
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = F.avg_pool2d(x, 3, 1, 1, count_include_pad=(pool == "avg"))
        bp = cbn(bp, f"{n}.branch_pool")
        return torch.cat([b1, b3, bd, bp], 1)

    with torch.no_grad():
        x = torch.tensor(x_np) * 2.0 - 1.0
        x = cbn(x, "Conv2d_1a_3x3", stride=2)
        x = cbn(x, "Conv2d_2a_3x3")
        x = cbn(x, "Conv2d_2b_3x3", padding=1)
        x = F.max_pool2d(x, 3, 2)
        x = cbn(x, "Conv2d_3b_1x1")
        x = cbn(x, "Conv2d_4a_3x3")
        x = F.max_pool2d(x, 3, 2)
        for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = block_a(x, n)
        # Mixed_6a (InceptionB)
        b3 = cbn(x, "Mixed_6a.branch3x3", stride=2)
        bd = cbn(cbn(cbn(x, "Mixed_6a.branch3x3dbl_1"),
                     "Mixed_6a.branch3x3dbl_2", padding=1),
                 "Mixed_6a.branch3x3dbl_3", stride=2)
        x = torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)
        x = block_c(x, "Mixed_6b")
        x = block_c(x, "Mixed_6c")
        # sFID spatial tap (ADM mixed_6/conv:0): Mixed_6d branch1x1 relu,
        # first 7 channels, flattened NHWC
        sp = cbn(x, "Mixed_6d.branch1x1")[:, :7]
        spatial = sp.permute(0, 2, 3, 1).reshape(sp.shape[0], -1).numpy()
        x = block_c(x, "Mixed_6d")
        x = block_c(x, "Mixed_6e")
        # Mixed_7a (InceptionD)
        b3 = cbn(cbn(x, "Mixed_7a.branch3x3_1"), "Mixed_7a.branch3x3_2", stride=2)
        b7 = cbn(x, "Mixed_7a.branch7x7x3_1")
        b7 = cbn(b7, "Mixed_7a.branch7x7x3_2", padding=(0, 3))
        b7 = cbn(b7, "Mixed_7a.branch7x7x3_3", padding=(3, 0))
        b7 = cbn(b7, "Mixed_7a.branch7x7x3_4", stride=2)
        x = torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)
        x = block_e(x, "Mixed_7b", "avg_nopad" if fid else "avg")
        x = block_e(x, "Mixed_7c", "max" if fid else "avg")
        pool3 = x.mean(dim=(2, 3)).numpy()
        return (pool3, spatial) if return_spatial else pool3


@pytest.mark.parametrize("variant", ["fid", "torchvision"])
def test_pool3_features_match_torch_oracle(variant):
    sd = _fake_inception_sd()
    params = convert_torch_inception(sd)
    x = np.random.default_rng(1).uniform(size=(2, 3, 299, 299)).astype(np.float32)

    want = _torch_pool3_oracle(sd, x, fid=(variant == "fid"))
    got = np.asarray(pool3_features(params, jnp.asarray(x), variant=variant))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_fid_variant_differs_from_torchvision():
    """The FIDInception pooling deviations must actually change features
    (guards against the variant flag being a no-op)."""
    sd = _fake_inception_sd()
    params = convert_torch_inception(sd)
    x = np.random.default_rng(2).uniform(size=(1, 3, 128, 128)).astype(np.float32)
    a = np.asarray(pool3_features(params, jnp.asarray(x), variant="fid"))
    b = np.asarray(pool3_features(params, jnp.asarray(x), variant="torchvision"))
    assert np.abs(a - b).max() > 1e-5


def test_inception_logits_match_torch_fc_oracle():
    """fc head (Inception Score path): pool3 @ W^T + b, torch Linear layout."""
    sd = _fake_inception_sd()
    rng = np.random.default_rng(7)
    sd["fc.weight"] = (rng.normal(size=(1008, 2048)) * 0.02).astype(np.float32)
    sd["fc.bias"] = (0.01 * rng.normal(size=(1008,))).astype(np.float32)
    params = convert_torch_inception(sd)
    # 299x299: the torch oracle has no input resize (pool3_features does)
    x = rng.uniform(size=(2, 3, 299, 299)).astype(np.float32)

    feats = _torch_pool3_oracle(sd, x, fid=True)
    want = feats @ sd["fc.weight"].T + sd["fc.bias"]
    got = np.asarray(inception_logits(params, jnp.asarray(x), variant="fid"))
    assert got.shape == (2, 1008)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_inception_logits_requires_fc():
    params = convert_torch_inception(_fake_inception_sd())  # no fc keys
    x = jnp.zeros((1, 3, 75, 75), jnp.float32)
    with pytest.raises(ValueError, match="fc"):
        inception_logits(params, x)


def test_logits_extractor_feeds_inception_score():
    from fit_tpu.eval.metrics import inception_score

    sd = _fake_inception_sd()
    rng = np.random.default_rng(8)
    sd["fc.weight"] = (rng.normal(size=(1000, 2048)) * 0.02).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    extract = make_logits_extractor(convert_torch_inception(sd))
    probs = extract(rng.uniform(size=(4, 3, 64, 64)).astype(np.float32))
    assert probs.shape == (4, 1000)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)  # softmaxed
    mean, std = inception_score(probs, splits=2)
    assert np.isfinite(mean) and mean >= 1.0 - 1e-6


def test_extractor_plugs_into_fid():
    from fit_tpu.eval.fid import fid_score

    sd = _fake_inception_sd()
    extractor = make_feature_extractor(convert_torch_inception(sd))
    rng = np.random.default_rng(3)
    a = [rng.uniform(size=(3, 64, 64)).astype(np.float32) for _ in range(8)]
    b = [rng.uniform(size=(3, 64, 64)).astype(np.float32) for _ in range(8)]
    same = fid_score(a, list(a), extractor=extractor, batch_size=4)
    diff = fid_score(a, b, extractor=extractor, batch_size=4)
    assert same < 1e-4
    assert np.isfinite(diff)


def test_spatial_features_match_torch_oracle():
    """sFID embedding (ADM mixed_6/conv:0 = Mixed_6d.branch1x1 relu, first 7
    channels, NHWC-flattened): one trunk pass must reproduce the torch
    oracle for BOTH returned feature sets."""
    sd = _fake_inception_sd()
    params = convert_torch_inception(sd)
    x = np.random.default_rng(4).uniform(size=(2, 3, 299, 299)).astype(np.float32)

    want_pool3, want_spatial = _torch_pool3_oracle(sd, x, fid=True, return_spatial=True)
    pool3, spatial = pool3_and_spatial_features(params, jnp.asarray(x), variant="fid")
    assert spatial.shape == (2, 17 * 17 * 7)
    np.testing.assert_allclose(np.asarray(pool3), want_pool3, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(spatial), want_spatial, atol=2e-3, rtol=1e-3)


def test_suite_extractor_one_pass_matches_individual_extractors():
    sd = _fake_inception_sd()
    rng = np.random.default_rng(11)
    sd["fc.weight"] = (rng.normal(size=(1008, 2048)) * 0.02).astype(np.float32)
    sd["fc.bias"] = np.zeros(1008, np.float32)
    params = convert_torch_inception(sd)
    batch = rng.uniform(size=(3, 3, 64, 64)).astype(np.float32)

    out = make_suite_extractor(params, spatial=True, probs=True)(batch)
    assert set(out) == {"pool3", "spatial", "probs"}
    np.testing.assert_allclose(
        out["pool3"], make_feature_extractor(params)(batch), atol=1e-5
    )
    np.testing.assert_allclose(
        out["probs"], make_logits_extractor(params)(batch), atol=1e-5
    )
    p3, sp = pool3_and_spatial_features(params, jnp.asarray(batch))
    np.testing.assert_allclose(out["spatial"], np.asarray(sp), atol=1e-5)

    # pool3-only mode returns just pool3; probs without fc fails fast
    assert set(make_suite_extractor(params)(batch)) == {"pool3"}
    no_fc = convert_torch_inception(_fake_inception_sd())
    with pytest.raises(ValueError, match="fc"):
        make_suite_extractor(no_fc, probs=True)


def test_sfid_from_spatial_features():
    """sFID is the Frechet distance over the spatial embedding: zero for
    identical sets, finite and positive for disjoint ones."""
    from fit_tpu.eval.fid import fid_from_features

    sd = _fake_inception_sd()
    extract = make_suite_extractor(convert_torch_inception(sd), spatial=True)
    rng = np.random.default_rng(5)
    a = extract(rng.uniform(size=(8, 3, 64, 64)).astype(np.float32))["spatial"]
    b = extract(rng.uniform(size=(8, 3, 64, 64)).astype(np.float32))["spatial"]
    assert fid_from_features(a, a) < 1e-4
    assert np.isfinite(fid_from_features(a, b))
