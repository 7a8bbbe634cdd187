"""Full-model fp32 parity: the flax FiT forward vs an independent torch
oracle implementing the same architecture (written here from the FiT paper /
architecture spec, consuming the *flax* weight layout directly).

This anchors the BASELINE "sample fidelity" contract: given identical
weights and inputs, per-forward outputs agree to fp32 matmul-reordering
tolerance, and therefore per-step sampling latents do too (the sampler math
is covered bit-level in test_diffusion.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fit_tpu.core.pos_embed import rope_freqs_2d
from fit_tpu.models import FiT

B, T, P, C = 2, 64, 2, 4
HID, HEADS, DEPTH = 96, 6, 2
HEAD_DIM = HID // HEADS
NUM_CLASSES = 10


def flax_model():
    return FiT(
        patch_size=P, in_channels=C, hidden_size=HID, depth=DEPTH,
        num_heads=HEADS, num_classes=NUM_CLASSES, class_dropout_prob=0.0,
        attn_backend="xla",
    )


def torch_oracle_forward(p, x, t, y, pos, mask, dims=None):
    """Torch implementation of the FiT forward on packed tokens.

    ``p``: flax params pytree as numpy (Dense kernels are (in, out)).
    All math fp32; LayerNorm affine-free eps 1e-6; RoPE in fp32 complex
    pairs; attention with key-only masking. ``dims``: optional
    (B, T, HID, HEADS, DEPTH) override for reuse with other model sizes.
    """
    B, T, HID, HEADS, DEPTH = dims if dims is not None else (
        globals()["B"], globals()["T"], globals()["HID"],
        globals()["HEADS"], globals()["DEPTH"],
    )
    HEAD_DIM = HID // HEADS
    tt = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)

    def dense(name_tree, v):
        k, bias = name_tree["kernel"], name_tree["bias"]
        if np.asarray(k).ndim == 3:  # head-grouped qkv (D, 3, C): same memory
            k = np.asarray(k).reshape(np.asarray(k).shape[0], -1)
            bias = np.asarray(bias).reshape(-1)
        return v @ tt(k) + tt(bias)

    x = tt(x)
    pos_t = tt(pos)
    mask_t = torch.tensor(np.asarray(mask))

    # token embedding
    h = dense(p["x_embedder"], x)

    # timestep embedding: 256-dim [cos|sin], then MLP(SiLU)
    half = 128
    freqs = torch.exp(-np.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = tt(t)[:, None] * freqs[None]
    t_feat = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    t_emb = dense(p["t_embedder"]["fc2"], torch.nn.functional.silu(dense(p["t_embedder"]["fc1"], t_feat)))

    # label embedding (eval: no dropout)
    table = tt(p["y_embedder"]["table"]["embedding"])
    c = t_emb + table[torch.tensor(np.asarray(y), dtype=torch.long)]

    def layer_norm(v):
        mu = v.mean(-1, keepdim=True)
        var = v.var(-1, unbiased=False, keepdim=True)
        return (v - mu) / torch.sqrt(var + 1e-6)

    def modulate(v, shift, scale):
        return v * (1 + scale[:, None]) + shift[:, None]

    def rope(q):  # (B,H,T,d)
        b, nh, n, d = q.shape
        fc = pos_t.reshape(b, 1, n, d // 2, 2)
        qr = q.reshape(b, nh, n, d // 2, 2)
        a, bb = qr[..., 0], qr[..., 1]
        cos, sin = fc[..., 0], fc[..., 1]
        return torch.stack([a * cos - bb * sin, bb * cos + a * sin], dim=-1).reshape(b, nh, n, d)

    for i in range(DEPTH):
        blk = p[f"blocks_{i}"]
        mod = dense(blk["adaLN"], torch.nn.functional.silu(c))
        sm, scm, gm, sf, scf, gf = mod.chunk(6, dim=1)

        a_in = modulate(layer_norm(h), sm, scm)
        qkv = dense(blk["attn"]["qkv"], a_in)  # (B,T,3*HID)
        qkv = qkv.reshape(B, T, 3, HEADS, HEAD_DIM).permute(2, 0, 3, 1, 4)
        q, k, v = rope(qkv[0]), rope(qkv[1]), qkv[2]
        scores = (q @ k.transpose(-2, -1)) * HEAD_DIM**-0.5
        scores = scores.masked_fill(~mask_t[:, None, None, :], float("-inf"))
        attn_out = torch.softmax(scores, dim=-1) @ v
        attn_out = attn_out.transpose(1, 2).reshape(B, T, HID)
        h = h + gm[:, None] * dense(blk["attn"]["proj"], attn_out)

        f_in = modulate(layer_norm(h), sf, scf)
        gate = torch.nn.functional.silu(dense(blk["ffn"]["fc1_g"], f_in))
        h = h + gf[:, None] * dense(blk["ffn"]["fc2"], gate * dense(blk["ffn"]["fc1_x"], f_in))

    fin = p["final"]
    shift, scale = dense(fin["adaLN"], torch.nn.functional.silu(c)).chunk(2, dim=1)
    return dense(fin["linear"], modulate(layer_norm(h), shift, scale)).numpy()


@pytest.fixture(scope="module")
def weights_and_inputs():
    model = flax_model()
    rng = np.random.default_rng(0)
    tokens = rng.normal(size=(B, T, P * P * C)).astype(np.float32)
    tokens[:, 48:] = 0.0
    pos = np.zeros((T, HEAD_DIM), np.float32)
    pos[:48] = rope_freqs_2d(HEAD_DIM, 6, 8)[:48]
    pos = np.broadcast_to(pos, (B, T, HEAD_DIM)).copy()
    mask = np.zeros((B, T), bool)
    mask[:, :48] = True
    t = rng.integers(0, 1000, size=(B,)).astype(np.int32)
    y = rng.integers(0, NUM_CLASSES, size=(B,)).astype(np.int32)

    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(tokens), jnp.asarray(t), jnp.asarray(y),
        jnp.asarray(pos), jnp.asarray(mask), train=True,
    )
    # randomize (init is the zero function)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    params = jax.tree.unflatten(
        td, [0.05 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )
    return model, params, (tokens, t, y, pos, mask)


def test_forward_matches_torch_oracle(weights_and_inputs):
    model, params, (tokens, t, y, pos, mask) = weights_and_inputs
    got = np.asarray(model.apply(
        params, jnp.asarray(tokens), jnp.asarray(t), jnp.asarray(y),
        jnp.asarray(pos), jnp.asarray(mask), train=True,
    ))
    p_np = jax.tree.map(np.asarray, params)["params"]
    want = torch_oracle_forward(p_np, tokens, t, y, pos, mask)
    # compare valid tokens (padded query rows are garbage in both, but the
    # garbage agrees too since both use key-only masking -> compare all)
    np.testing.assert_allclose(got[:, :48], want[:, :48], atol=3e-5)


def test_forward_flash_backend_matches_oracle(weights_and_inputs):
    """Same weights through the Pallas flash kernel (interpreted on CPU)."""
    model, params, (tokens, t, y, pos, mask) = weights_and_inputs
    flash_model = FiT(
        patch_size=P, in_channels=C, hidden_size=HID, depth=DEPTH,
        num_heads=HEADS, num_classes=NUM_CLASSES, class_dropout_prob=0.0,
        attn_backend="flash",
    )
    got = np.asarray(flash_model.apply(
        params, jnp.asarray(tokens), jnp.asarray(t), jnp.asarray(y),
        jnp.asarray(pos), jnp.asarray(mask), train=True,
    ))
    p_np = jax.tree.map(np.asarray, params)["params"]
    want = torch_oracle_forward(p_np, tokens, t, y, pos, mask)
    np.testing.assert_allclose(got[:, :48], want[:, :48], atol=3e-5)
