"""End-to-end sampling pipeline tests on a tiny FiT (the PR1 minimum slice:
class-conditional sampling, CPU, small step count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fit_tpu.models import FiT
from fit_tpu.sampling import FiTSampler, create_mask, create_pos_embed


def tiny_fit():
    return FiT(
        patch_size=2, in_channels=4, hidden_size=96, depth=2, num_heads=6,
        num_classes=10, attn_backend="xla",
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_fit()
    head_dim = 96 // 6
    x = jnp.zeros((1, 8, 2 * 2 * 4))
    pos = jnp.zeros((1, 8, head_dim))
    mask = jnp.ones((1, 8), bool)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        x, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32), pos, mask, train=True,
    )
    # randomize so outputs are non-trivial (init is identically zero)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        td, [0.02 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )
    return model, params


def test_create_pos_embed_within_budget():
    table, valid_t = create_pos_embed(32, 32, 2, 256, 16)
    assert table.shape == (1, 256, 16) and valid_t == 256
    table, valid_t = create_pos_embed(24, 40, 2, 256, 16)
    assert table.shape == (1, 256, 16) and valid_t == 240
    assert (table[0, 240:] == 0).all()


def test_create_pos_embed_extrapolation():
    # 512x512px -> 64x64 latent -> 1024 tokens > 256 budget
    table, valid_t = create_pos_embed(64, 64, 2, 256, 16)
    assert table.shape == (1, 1024, 16) and valid_t == 1024


def test_create_mask():
    m = create_mask(240, 256, 4)
    assert m.shape == (4, 256)
    assert m[:, :240].all() and not m[:, 240:].any()
    m = create_mask(1024, 256, 2)
    assert m.shape == (2, 1024) and m.all()


@pytest.mark.parametrize("sampler", ["ddim", "ddpm", "dpm"])
def test_sample_square(model_and_params, sampler):
    model, params = model_and_params
    s = FiTSampler(
        model, num_sampling_steps=4, cfg_scale=1.5, sampler=sampler,
        max_size=16, max_length=64, num_classes=10,
    )
    out = s.sample(params, [1, 2], jax.random.PRNGKey(3), 128, 128)
    assert out.shape == (2, 4, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_nonsquare_aspect(model_and_params):
    """BASELINE config 4: mixed aspect sampling (here 160x96px -> 20x12)."""
    model, params = model_and_params
    s = FiTSampler(model, num_sampling_steps=3, max_size=16, max_length=64, num_classes=10)
    out = s.sample(params, [0, 3, 5], jax.random.PRNGKey(4), 160, 96)
    assert out.shape == (3, 4, 20, 12)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_extrapolated_resolution(model_and_params):
    """BASELINE config 5: resolution beyond the training budget via
    VisionNTK (canvas grows beyond max_length)."""
    model, params = model_and_params
    s = FiTSampler(model, num_sampling_steps=2, max_size=16, max_length=64, num_classes=10)
    out = s.sample(params, [1], jax.random.PRNGKey(5), 256, 256)  # 32x32 latent = 256 tokens > 64
    assert out.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_deterministic_given_rng(model_and_params):
    model, params = model_and_params
    s = FiTSampler(model, num_sampling_steps=3, max_size=16, max_length=64, num_classes=10)
    a = s.sample(params, [1, 2], jax.random.PRNGKey(3), 128, 128)
    b = s.sample(params, [1, 2], jax.random.PRNGKey(3), 128, 128)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_scale_changes_output(model_and_params):
    model, params = model_and_params
    z = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 16, 16))
    s1 = FiTSampler(model, num_sampling_steps=3, cfg_scale=1.0, max_size=16, max_length=64, num_classes=10)
    s2 = FiTSampler(model, num_sampling_steps=3, cfg_scale=8.0, max_size=16, max_length=64, num_classes=10)
    a = s1.sample(params, [1, 2], jax.random.PRNGKey(3), 128, 128, z=z)
    b = s2.sample(params, [1, 2], jax.random.PRNGKey(3), 128, 128, z=z)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_sample_multi_device_dp(model_and_params):
    """DP sampling over the 8-device CPU mesh matches single-device output."""
    from fit_tpu.parallel import make_mesh

    model, params = model_and_params
    kwargs = dict(num_sampling_steps=3, max_size=16, max_length=64, num_classes=10)
    labels = list(range(8))
    single = FiTSampler(model, **kwargs)
    a = single.sample(params, labels, jax.random.PRNGKey(3), 128, 128)
    sharded = FiTSampler(model, mesh=make_mesh(tp=1), **kwargs)
    b = sharded.sample(params, labels, jax.random.PRNGKey(3), 128, 128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sample_mixed_multi_device_dp(model_and_params):
    """DP packed mixed-resolution sampling over the 8-device CPU mesh
    matches single-device output — the multi-chip serving path
    (fit_tpu.serve routes through sample_mixed)."""
    from fit_tpu.parallel import make_mesh

    model, params = model_and_params
    kwargs = dict(num_sampling_steps=3, max_size=16, max_length=64, num_classes=10)
    labels = list(range(8))
    sizes = [(128, 64), (64, 128)] * 4
    single = FiTSampler(model, **kwargs)
    a = single.sample_mixed(params, labels, sizes, jax.random.PRNGKey(4))
    sharded = FiTSampler(model, mesh=make_mesh(tp=1), **kwargs)
    b = sharded.sample_mixed(params, labels, sizes, jax.random.PRNGKey(4))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)


def test_sample_mixed_aspect_packed_batch(model_and_params):
    """BASELINE config 4 proper: different resolutions in ONE packed batch,
    per-sample pos tables and masks; each output matches the same seed's
    behavior shape-wise and padded samples don't interfere."""
    model, params = model_and_params
    s = FiTSampler(model, num_sampling_steps=3, max_size=16, max_length=64, num_classes=10)
    outs = s.sample_mixed(
        params, [1, 2, 3], [(128, 64), (64, 128), (128, 128)], jax.random.PRNGKey(6)
    )
    assert [tuple(o.shape) for o in outs] == [(4, 16, 8), (4, 8, 16), (4, 16, 16)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_cast_params_cache_multi_entry(model_and_params):
    """Alternating between param sets must hit the MRU cast cache for BOTH
    (VERDICT r3 weak #6: the old single-entry cache re-cast 675M params on
    every serve<->eval switch)."""
    _, params = model_and_params
    model_bf16 = FiT(
        patch_size=2, in_channels=4, hidden_size=96, depth=2, num_heads=6,
        num_classes=10, attn_backend="xla", dtype=jnp.bfloat16,
    )
    s = FiTSampler(model_bf16, num_sampling_steps=2, max_size=16,
                   max_length=64, num_classes=10)
    params_b = jax.tree.map(lambda x: x + 1.0, params)
    cast_a1 = s._cast_params(params)
    cast_b1 = s._cast_params(params_b)
    cast_a2 = s._cast_params(params)
    cast_b2 = s._cast_params(params_b)
    assert cast_a1 is cast_a2, "first param set evicted by the second"
    assert cast_b1 is cast_b2
    assert jax.tree.leaves(cast_a1)[0].dtype == jnp.bfloat16
