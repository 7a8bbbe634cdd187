"""FiT/DiT model tests: shapes, adaLN-Zero init invariants, mask invariance,
CFG semantics, label dropout, and the size registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fit_tpu.core.pos_embed import rope_freqs_2d
from fit_tpu.models import FiT, FiT_models, create_fit

B, T, P, C, HID = 2, 64, 2, 4, 96  # tiny model: budget 64 tokens
HEADS = 6  # head_dim 16
HEAD_DIM = HID // HEADS
RNGS = {"label_dropout": jax.random.PRNGKey(99)}


def tiny_model(**kw):
    return FiT(
        patch_size=P, in_channels=C, hidden_size=HID, depth=2, num_heads=HEADS,
        num_classes=10, attn_backend="xla", **kw,
    )


def make_batch(seed=0, t_valid=48):
    rng = np.random.default_rng(seed)
    tokens = rng.normal(size=(B, T, P * P * C)).astype(np.float32)
    tokens[:, t_valid:] = 0.0
    # valid tokens from a 6x8 grid (48 tokens)
    pos = np.zeros((T, HEAD_DIM), np.float32)
    pos[:t_valid] = rope_freqs_2d(HEAD_DIM, 6, 8)[:t_valid]
    pos = np.broadcast_to(pos, (B, T, HEAD_DIM)).copy()
    mask = np.zeros((B, T), bool)
    mask[:, :t_valid] = True
    tvec = rng.integers(0, 1000, size=(B,))
    y = rng.integers(0, 10, size=(B,))
    return (jnp.asarray(tokens), jnp.asarray(tvec), jnp.asarray(y),
            jnp.asarray(pos), jnp.asarray(mask))


def init_params(model, batch, seed=0):
    x, t, y, pos, mask = batch
    return model.init(
        {"params": jax.random.PRNGKey(seed), "label_dropout": jax.random.PRNGKey(1)},
        x, t, y, pos, mask, train=True,
    )


def randomize(params, seed=7):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [
        0.02 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, leaves)


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    batch = make_batch()
    params = init_params(model, batch)
    return model, batch, params


def test_output_zero_at_init(setup):
    """adaLN-Zero: the final layer is zero-initialized, so a freshly
    initialized model outputs exactly zeros (reference fit.py:427-430)."""
    model, batch, params = setup
    out = model.apply(params, *batch, train=True, rngs=RNGS)
    assert out.shape == (B, T, P * P * C)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_mask_invariance(setup):
    """Padded-token *values* must not influence valid-token outputs."""
    model, batch, _ = setup
    x, t, y, pos, mask = batch
    params = randomize(init_params(model, batch))
    out1 = model.apply(params, x, t, y, pos, mask, train=True, rngs=RNGS)
    rng = np.random.default_rng(3)
    x2 = np.asarray(x).copy()
    x2[:, 48:] = rng.normal(size=x2[:, 48:].shape)
    out2 = model.apply(params, jnp.asarray(x2), t, y, pos, mask, train=True, rngs=RNGS)
    np.testing.assert_allclose(
        np.asarray(out1)[:, :48], np.asarray(out2)[:, :48], atol=1e-6
    )


def test_eval_path_matches_manual_patchify(setup):
    """train=False on (N,C,H,W) == patchify -> token forward -> unpatchify."""
    from fit_tpu.core.geometry import patchify, unpatchify

    model, batch, _ = setup
    _, t, y, _, _ = batch
    params = randomize(init_params(model, batch))
    latent = jnp.asarray(
        np.random.default_rng(5).normal(size=(B, C, 16, 16)).astype(np.float32)
    )
    pos_full = jnp.asarray(
        np.broadcast_to(rope_freqs_2d(HEAD_DIM, 8, 8), (B, T, HEAD_DIM)).copy()
    )
    mask_full = jnp.ones((B, T), bool)
    out = model.apply(params, latent, t, y, pos_full, mask_full, train=False)
    assert out.shape == (B, C, 16, 16)
    tokens_out = model.apply(
        params, patchify(latent, P), t, y, pos_full, mask_full, train=True, rngs=RNGS
    )
    manual = unpatchify(tokens_out, 16, 16, P, C)
    # train=True applies label dropout; with the fixed rng below p=0.1 may or
    # may not drop — use dropout-free model for the equivalence instead.
    model_nd = tiny_model(class_dropout_prob=0.0)
    params_nd = randomize(model_nd.init(
        {"params": jax.random.PRNGKey(0)}, *batch, train=True,
    ))
    a = model_nd.apply(params_nd, latent, t, y, pos_full, mask_full, train=False)
    b = unpatchify(
        model_nd.apply(params_nd, patchify(latent, P), t, y, pos_full, mask_full, train=True),
        16, 16, P, C,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cfg_guidance_math(setup):
    model, batch, _ = setup
    params = randomize(init_params(model, batch))
    n = 4
    rng = np.random.default_rng(11)
    z = jnp.asarray(rng.normal(size=(n, C, 16, 16)).astype(np.float32))
    z = jnp.concatenate([z[: n // 2], z[: n // 2]], axis=0)  # duplicated halves
    y = jnp.asarray([1, 2, 10, 10])  # cond labels then null class
    t = jnp.full((n,), 17)
    pos = jnp.asarray(
        np.broadcast_to(rope_freqs_2d(HEAD_DIM, 8, 8), (n, T, HEAD_DIM)).copy()
    )
    mask = jnp.ones((n, T), bool)

    scale = 4.0
    out = model.apply(params, z, t, y, pos, mask, scale, method=FiT.forward_with_cfg)
    assert out.shape == (n, C, 16, 16)
    plain = model.apply(params, z, t, y, pos, mask, train=False)
    cond, uncond = np.split(np.asarray(plain)[:, :C], 2, axis=0)
    guided = uncond + scale * (cond - uncond)
    np.testing.assert_allclose(np.asarray(out)[: n // 2], guided, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[n // 2 :], guided, atol=1e-6)


def test_label_dropout_semantics(setup):
    """dropout_prob=1.0 -> every label becomes the null class in train mode;
    eval mode never drops."""
    _, batch, _ = setup
    x, t, y, pos, mask = batch
    model = tiny_model(class_dropout_prob=1.0)
    params = randomize(init_params(model, batch))
    o1 = model.apply(params, x, t, jnp.zeros_like(y), pos, mask, train=True, rngs=RNGS)
    o2 = model.apply(params, x, t, jnp.ones_like(y), pos, mask, train=True, rngs=RNGS)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    latent = jnp.asarray(
        np.random.default_rng(5).normal(size=(B, C, 16, 16)).astype(np.float32)
    )
    pos_full = jnp.asarray(
        np.broadcast_to(rope_freqs_2d(HEAD_DIM, 8, 8), (B, T, HEAD_DIM)).copy()
    )
    mask_full = jnp.ones((B, T), bool)
    e1 = model.apply(params, latent, t, jnp.zeros_like(y) + 3, pos_full, mask_full, train=False)
    e2 = model.apply(params, latent, t, jnp.zeros_like(y) + 4, pos_full, mask_full, train=False)
    assert np.abs(np.asarray(e1) - np.asarray(e2)).max() > 0


def test_registry_names_and_shapes():
    assert set(FiT_models) == {
        f"FiT-{s}/{p}" for s in ("XL", "L", "B", "S") for p in (2, 4, 8)
    }
    m = create_fit("FiT-B/2")
    assert (m.depth, m.hidden_size, m.num_heads, m.patch_size) == (12, 768, 12, 2)
    m = create_fit("FiT-XL/8")
    assert (m.depth, m.hidden_size, m.num_heads, m.patch_size) == (28, 1152, 16, 8)
    m = FiT_models["FiT-S/4"]()
    assert (m.depth, m.hidden_size, m.num_heads, m.patch_size) == (12, 384, 6, 4)


def test_param_count_fit_s2():
    """FiT-S/2 should land at the DiT-S scale (~33M params, SwiGLU keeps
    the count equal via the 2/3-width hidden)."""
    model = create_fit("FiT-S/2", attn_backend="xla")
    head_dim = 384 // 6
    x = jnp.zeros((1, 4, P * P * 4))
    pos = jnp.zeros((1, 4, head_dim))
    mask = jnp.ones((1, 4), bool)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        x, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32), pos, mask, train=True,
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 30e6 < n < 36e6, f"param count {n}"
