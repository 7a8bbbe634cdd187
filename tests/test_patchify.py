"""Patchify/unpatchify/pad/unpad round-trip and layout tests."""

import jax.numpy as jnp
import numpy as np

import fit_tpu.core.geometry as pf


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 12)).astype(np.float32))
    tokens = pf.patchify(x, 2)
    assert tokens.shape == (2, (8 // 2) * (12 // 2), 2 * 2 * 4)
    back = pf.unpatchify(tokens, 8, 12, 2, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_patchify_token_layout():
    """Token t holds patch (t//nw, t%nw); inside a token the layout is
    (p, p, C) flattened with channel fastest."""
    n, c, h, w, p = 1, 3, 4, 6, 2
    x = np.arange(n * c * h * w, dtype=np.float32).reshape(n, c, h, w)
    tokens = np.asarray(pf.patchify(jnp.asarray(x), p))
    nh, nw = h // p, w // p
    for t in range(nh * nw):
        ph, pw = t // nw, t % nw
        patch = x[0, :, ph * p : (ph + 1) * p, pw * p : (pw + 1) * p]  # (C,p,p)
        expect = patch.transpose(1, 2, 0).reshape(-1)  # (p,p,C) flattened
        np.testing.assert_array_equal(tokens[0, t], expect)


def test_patchify_np_matches_device_patchify():
    rng = np.random.default_rng(1)
    lat = rng.normal(size=(4, 10, 14)).astype(np.float32)
    host = pf.patchify_np(lat, 2)
    dev = np.asarray(pf.patchify(jnp.asarray(lat)[None], 2))[0]
    np.testing.assert_array_equal(host, dev)


def test_pad_latent_to_canvas_and_unpad():
    rng = np.random.default_rng(2)
    # non-square latent: 24x40 (=> 12x20 patches = 240 tokens <= 256)
    x = jnp.asarray(rng.normal(size=(2, 4, 24, 40)).astype(np.float32))
    canvas = pf.pad_latent_to_canvas(x, 2, 32, 256)
    assert canvas.shape == (2, 4, 32, 32)
    valid_t = pf.token_count(24, 40, 2)
    assert valid_t == 240
    back = pf.unpad_latent(canvas, valid_t, 24, 40, 2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # padding region is zeros: total energy is preserved
    assert np.isclose(np.square(np.asarray(canvas)).sum(), np.square(np.asarray(x)).sum())


def test_pad_latent_passthrough_when_too_long():
    x = jnp.zeros((1, 4, 64, 64))  # 1024 tokens > 256
    out = pf.pad_latent_to_canvas(x, 2, 32, 256)
    assert out.shape == x.shape


def test_token_count():
    assert pf.token_count(32, 32, 2) == 256
    assert pf.token_count(30, 34, 2) == 15 * 17
