"""DiT family tests (the reference's square-image model tree)."""

import jax
import jax.numpy as jnp
import numpy as np

from fit_tpu.models import DiT, DiT_models, create_dit


def tiny_dit():
    return DiT(
        input_size=16, patch_size=2, hidden_size=64, depth=2, num_heads=4,
        num_classes=10, learn_sigma=True, attn_backend="xla",
    )


def make(seed=0):
    model = tiny_dit()
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16)).astype(np.float32))
    t = jnp.asarray([10, 500])
    y = jnp.asarray([1, 2])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        x, t, y, train=True,
    )
    return model, params, (x, t, y)


def test_dit_output_shape_learn_sigma():
    model, params, (x, t, y) = make()
    out = model.apply(params, x, t, y, train=False)
    assert out.shape == (2, 8, 16, 16)  # eps + variance channels


def test_dit_zero_at_init():
    model, params, (x, t, y) = make()
    out = model.apply(params, x, t, y, train=False)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_dit_cfg_three_channel():
    model, params, (x, t, y) = make()
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree.unflatten(
        td, [0.02 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )
    z = jnp.concatenate([x[:1], x[:1]], axis=0)
    out = model.apply(params, z, t, y, 3.0, method=DiT.forward_with_cfg)
    assert out.shape == (2, 8, 16, 16)
    plain = np.asarray(model.apply(params, z, t, y, train=False))
    cond, uncond = plain[:1, :3], plain[1:, :3]
    guided = uncond + 3.0 * (cond - uncond)
    np.testing.assert_allclose(np.asarray(out)[:1, :3], guided, atol=1e-6)
    # channels beyond 3 pass through unguided (reference dit.py:262-267)
    np.testing.assert_allclose(np.asarray(out)[:, 3:], plain[:, 3:], atol=1e-6)


def test_dit_registry():
    assert set(DiT_models) == {
        f"DiT-{s}/{p}" for s in ("XL", "L", "B", "S") for p in (2, 4, 8)
    }
    m = create_dit("DiT-XL/2")
    assert (m.depth, m.hidden_size, m.num_heads) == (28, 1152, 16)
