"""VAE tests: architecture shapes, distribution head, op-level parity with
torch (conv layout / groupnorm), and converter structural correctness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fit_tpu.vae import AutoencoderKL, DiagonalGaussian, convert_torch_state_dict

SMALL = dict(block_out_channels=(8, 16), latent_channels=4)


def small_vae():
    return AutoencoderKL(**SMALL)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = small_vae()
    imgs = jnp.zeros((1, 3, 32, 32))
    params = vae.init(jax.random.PRNGKey(0), imgs, jax.random.PRNGKey(1))
    return vae, params


def test_encode_decode_shapes(vae_and_params):
    vae, params = vae_and_params
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32))
    # 2 blocks -> one downsample -> /2 spatial
    z = vae.apply(params, imgs, jax.random.PRNGKey(2), method=AutoencoderKL.encode)
    assert z.shape == (2, 4, 16, 16)
    out = vae.apply(params, z, method=AutoencoderKL.decode)
    assert out.shape == (2, 3, 32, 32)
    moments = vae.apply(params, imgs, method=AutoencoderKL.encode_moments)
    assert moments.shape == (2, 16, 16, 8)


def test_diagonal_gaussian():
    rng = np.random.default_rng(1)
    moments = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    dist = DiagonalGaussian(moments)
    assert dist.mean.shape == (2, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(dist.mode()), np.asarray(dist.mean))
    s1 = dist.sample(jax.random.PRNGKey(0))
    s2 = dist.sample(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert np.abs(np.asarray(dist.sample(jax.random.PRNGKey(1)) - s1)).max() > 0


def test_encode_mode_deterministic(vae_and_params):
    vae, params = vae_and_params
    imgs = jnp.asarray(np.random.default_rng(2).normal(size=(1, 3, 32, 32)).astype(np.float32))
    a = vae.apply(params, imgs, method=AutoencoderKL.encode_mode)
    b = vae.apply(params, imgs, method=AutoencoderKL.encode_mode)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv_layout_matches_torch():
    """The converter's OIHW->HWIO mapping: flax Conv(pad 1) == torch conv2d(pad 1)."""
    torch = pytest.importorskip("torch")
    import flax.linen as fnn

    rng = np.random.default_rng(3)
    w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)  # (O,I,kH,kW)
    b = rng.normal(size=(6,)).astype(np.float32)
    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)  # NCHW

    want = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=1
    ).numpy()

    from fit_tpu.vae.convert import _conv, _vec

    conv = fnn.Conv(6, (3, 3), padding=1)
    params = {"params": {"kernel": jnp.asarray(_conv(w)), "bias": jnp.asarray(_vec(b))}}
    got = conv.apply(params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")
    from fit_tpu.vae.model import GroupNorm

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 16, 4, 4)).astype(np.float32)  # NCHW
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)

    gn_t = torch.nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        gn_t.weight.copy_(torch.tensor(scale))
        gn_t.bias.copy_(torch.tensor(bias))
    with torch.no_grad():
        want = gn_t(torch.tensor(x)).numpy()

    gn = GroupNorm(groups=4)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = gn.apply(params, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _fake_diffusers_sd(block_out=(8, 16), enc_layers=2, dec_layers=3, latent=4,
                       attn_style="new"):
    """Random diffusers-style AutoencoderKL state_dict with correct shapes.

    ``attn_style``: "new" = Linear to_q/to_k/to_v/to_out.0 + group_norm
    (diffusers >= 0.15), "old" = 1x1-conv q/k/v/proj_out + norm (ldm-style
    checkpoints). All weights (including norms and biases) are randomized so
    a mis-mapped parameter cannot hide behind an identity value.
    """
    rng = np.random.default_rng(5)
    sd = {}

    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.02

    def norm(name, c):
        sd[f"{name}.weight"] = (1.0 + 0.2 * rng.normal(size=(c,))).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(c,)).astype(np.float32) * 0.1

    def lin(name, o, i):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.02

    def resnet(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cout, cin)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.conv_shortcut", cout, cin, k=1)

    def attn(prefix, c):
        if attn_style == "new":
            norm(f"{prefix}.group_norm", c)
            for n in ("to_q", "to_k", "to_v", "to_out.0"):
                lin(f"{prefix}.{n}", c, c)
        else:  # old ldm-style: 1x1 convs
            norm(f"{prefix}.norm", c)
            for n in ("q", "k", "v", "proj_out"):
                conv(f"{prefix}.{n}", c, c, k=1)

    # encoder
    conv("encoder.conv_in", block_out[0], 3)
    ch = block_out[0]
    for i, out in enumerate(block_out):
        for j in range(enc_layers):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ch, out)
            ch = out
        if i < len(block_out) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", out, out)
    resnet("encoder.mid_block.resnets.0", ch, ch)
    attn("encoder.mid_block.attentions.0", ch)
    resnet("encoder.mid_block.resnets.1", ch, ch)
    norm("encoder.conv_norm_out", ch)
    conv("encoder.conv_out", 2 * latent, ch)
    conv("quant_conv", 2 * latent, 2 * latent, k=1)

    # decoder
    conv("post_quant_conv", latent, latent, k=1)
    rev = list(reversed(block_out))
    conv("decoder.conv_in", rev[0], latent)
    resnet("decoder.mid_block.resnets.0", rev[0], rev[0])
    attn("decoder.mid_block.attentions.0", rev[0])
    resnet("decoder.mid_block.resnets.1", rev[0], rev[0])
    ch = rev[0]
    for i, out in enumerate(rev):
        for j in range(dec_layers):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch, out)
            ch = out
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", out, out)
    norm("decoder.conv_norm_out", ch)
    conv("decoder.conv_out", 3, ch)
    return sd


def _torch_vae_oracle(sd_np, block_out=(8, 16), enc_layers=2, dec_layers=3):
    """Pure-torch functional AutoencoderKL forward driven by a diffusers-style
    state_dict — an independent oracle for the full encode/decode network
    (mirrors the diffusers module semantics the reference delegates to at
    ``/root/reference/preprocess/preprocess.py:30-42`` and
    ``FiT/sample_lightning.py:24,73-74``). Returns (encode_moments, decode)
    closures operating on NCHW torch tensors."""
    import torch
    import torch.nn.functional as F

    sd = {k: torch.tensor(v) for k, v in sd_np.items()}

    def conv(x, name, stride=1, padding=1):
        return F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"], stride=stride, padding=padding)

    def gn(x, name):
        c = x.shape[1]
        return F.group_norm(x, min(32, c), sd[f"{name}.weight"], sd[f"{name}.bias"], eps=1e-6)

    def resnet(x, p):
        h = conv(F.silu(gn(x, f"{p}.norm1")), f"{p}.conv1")
        h = conv(F.silu(gn(h, f"{p}.norm2")), f"{p}.conv2")
        if f"{p}.conv_shortcut.weight" in sd:
            x = F.conv2d(x, sd[f"{p}.conv_shortcut.weight"], sd[f"{p}.conv_shortcut.bias"])
        return x + h

    def attn(x, p):
        n, c, hh, ww = x.shape
        if f"{p}.to_q.weight" in sd:
            names = {"q": "to_q", "k": "to_k", "v": "to_v", "o": "to_out.0", "norm": "group_norm"}
        else:
            names = {"q": "q", "k": "k", "v": "v", "o": "proj_out", "norm": "norm"}
        y = gn(x, f"{p}.{names['norm']}").reshape(n, c, hh * ww).permute(0, 2, 1)

        def lin(t, nm):
            w = sd[f"{p}.{nm}.weight"]
            if w.ndim == 4:  # 1x1-conv form
                w = w[:, :, 0, 0]
            return t @ w.T + sd[f"{p}.{nm}.bias"]

        q, k, v = lin(y, names["q"]), lin(y, names["k"]), lin(y, names["v"])
        a = torch.softmax(q @ k.transpose(1, 2) * c**-0.5, dim=-1)
        y = lin(a @ v, names["o"])
        return x + y.permute(0, 2, 1).reshape(n, c, hh, ww)

    @torch.no_grad()
    def encode_moments(x):
        x = conv(x, "encoder.conv_in")
        for i in range(len(block_out)):
            for j in range(enc_layers):
                x = resnet(x, f"encoder.down_blocks.{i}.resnets.{j}")
            if i < len(block_out) - 1:
                x = F.pad(x, (0, 1, 0, 1))  # diffusers Downsample2D asymmetric pad
                x = conv(x, f"encoder.down_blocks.{i}.downsamplers.0.conv", stride=2, padding=0)
        x = resnet(x, "encoder.mid_block.resnets.0")
        x = attn(x, "encoder.mid_block.attentions.0")
        x = resnet(x, "encoder.mid_block.resnets.1")
        x = conv(F.silu(gn(x, "encoder.conv_norm_out")), "encoder.conv_out")
        return F.conv2d(x, sd["quant_conv.weight"], sd["quant_conv.bias"])

    @torch.no_grad()
    def decode(z):
        z = F.conv2d(z, sd["post_quant_conv.weight"], sd["post_quant_conv.bias"])
        x = conv(z, "decoder.conv_in")
        x = resnet(x, "decoder.mid_block.resnets.0")
        x = attn(x, "decoder.mid_block.attentions.0")
        x = resnet(x, "decoder.mid_block.resnets.1")
        for i in range(len(block_out)):
            for j in range(dec_layers):
                x = resnet(x, f"decoder.up_blocks.{i}.resnets.{j}")
            if i < len(block_out) - 1:
                x = torch.nn.functional.interpolate(x, scale_factor=2.0, mode="nearest")
                x = conv(x, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        return conv(F.silu(gn(x, "decoder.conv_norm_out")), "decoder.conv_out")

    return encode_moments, decode


@pytest.mark.parametrize("attn_style", ["new", "old"])
def test_full_network_parity_vs_torch_oracle(attn_style):
    """End-to-end encode + decode parity: converted diffusers weights through
    the flax network must match the torch oracle to ~1e-4 (VERDICT round-1
    item 3: a mis-mapped block anywhere in the tree fails this)."""
    torch = pytest.importorskip("torch")

    sd = _fake_diffusers_sd(attn_style=attn_style)
    variables = jax.tree.map(jnp.asarray, convert_torch_state_dict(sd, block_out_channels=(8, 16)))
    vae = small_vae()
    enc_t, dec_t = _torch_vae_oracle(sd)

    rng = np.random.default_rng(7)
    imgs = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    # 1) encoder moments (flax returns NHWC)
    want_m = enc_t(torch.tensor(imgs)).numpy()
    got_m = np.transpose(
        np.asarray(vae.apply(variables, jnp.asarray(imgs), method=AutoencoderKL.encode_moments)),
        (0, 3, 1, 2),
    )
    np.testing.assert_allclose(got_m, want_m, atol=1e-4, rtol=1e-4)

    # 2) deterministic scaled latents (mode = mean * 0.18215)
    mean = want_m[:, :4]
    want_z = mean * 0.18215
    got_z = np.asarray(vae.apply(variables, jnp.asarray(imgs), method=AutoencoderKL.encode_mode))
    np.testing.assert_allclose(got_z, want_z, atol=1e-4, rtol=1e-4)

    # 3) full decode back to pixels (oracle takes unscaled z)
    want_px = dec_t(torch.tensor(want_z / 0.18215)).numpy()
    got_px = np.asarray(vae.apply(variables, jnp.asarray(want_z), method=AutoencoderKL.decode))
    np.testing.assert_allclose(got_px, want_px, atol=1e-4, rtol=1e-4)


def test_converter_structure_matches_init(vae_and_params):
    """Converted diffusers weights must have exactly the init tree structure
    (names + shapes) and produce a working forward pass."""
    vae, params = vae_and_params
    sd = _fake_diffusers_sd()
    converted = convert_torch_state_dict(sd, block_out_channels=(8, 16))

    flat_init = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(jnp.asarray, converted)
    )[0]
    init_map = {jax.tree_util.keystr(k): v.shape for k, v in flat_init}
    conv_map = {jax.tree_util.keystr(k): v.shape for k, v in flat_conv}
    assert init_map == conv_map

    imgs = jnp.asarray(np.random.default_rng(6).normal(size=(1, 3, 32, 32)).astype(np.float32))
    out = vae.apply(converted, imgs, jax.random.PRNGKey(0))
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out)).all()
