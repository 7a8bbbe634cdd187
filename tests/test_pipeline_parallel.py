"""Pipeline parallelism tests — parallel.pipeline (GPipe over a 'pipe' axis).

All on the 8-device virtual CPU mesh (conftest). The pipelined forward must
match the single-mesh scan-over-layers model bit-for-bit (fp32, highest
precision): the schedule only reorders WHICH device computes a microbatch,
never the math.

One intentional deviation: with ``class_dropout_prob > 0`` the label-dropout
DRAW differs from ``FiT.__call__`` (the standalone ``LabelEmbedder.apply``
folds the rng on a different module path), so bit-parity tests run at
dropout 0 and a separate test pins that the dropout path executes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fit_tpu.core.pos_embed import rope_freqs_2d
from fit_tpu.models.fit import FiT
from fit_tpu.parallel import make_mesh, make_pipelined_apply, pipelined_apply


def fixture(pp, dp, b=8, t=64, depth=4, remat=False, dropout=0.0):
    kw = dict(
        patch_size=2, in_channels=4, hidden_size=128, depth=depth, num_heads=8,
        num_classes=10, class_dropout_prob=dropout, attn_backend="fused",
        scan_blocks=True, remat=remat,
    )
    model = FiT(**kw)
    mesh = make_mesh(dp=dp, pp=pp)
    head_dim = kw["hidden_size"] // kw["num_heads"]

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.normal(size=(b, t, 16)).astype(np.float32))
    pos = jnp.asarray(
        np.broadcast_to(rope_freqs_2d(head_dim, 8, t // 8, max_length=t), (b, t, head_dim))
        .copy().astype(np.float32)
    )
    mask = jnp.asarray(np.arange(t)[None] < rng.integers(t // 2, t + 1, size=(b, 1)))
    tv = jnp.asarray(rng.integers(0, 100, size=(b,)).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 10, size=(b,)).astype(np.int32))
    args = (tokens, tv, y, pos, mask)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        *args, train=True,
    )
    return model, mesh, params, args


@pytest.mark.parametrize("pp,dp,m", [(4, 2, 4), (2, 4, 2), (8, 1, 8)])
def test_pipelined_forward_matches_single_mesh(pp, dp, m):
    model, mesh, params, args = fixture(pp=pp, dp=dp, depth=8 if pp == 8 else 4)
    want = np.asarray(model.apply(params, *args, train=True))
    with mesh:
        params_s = jax.device_put(params, NamedSharding(mesh, P()))
        got = jax.jit(
            lambda p: pipelined_apply(model, p, *args, mesh=mesh, microbatches=m)
        )(params_s)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("remat", [False, True])
def test_pipelined_grads_match(remat):
    model, mesh, params, args = fixture(pp=4, dp=2, remat=remat)

    def loss(fn):
        return lambda p: jnp.sum(fn(p).astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss(lambda p: model.apply(p, *args, train=True))))(params)
    with mesh:
        params_s = jax.device_put(params, NamedSharding(mesh, P()))
        g_pp = jax.jit(
            jax.grad(loss(lambda p: pipelined_apply(
                model, p, *args, mesh=mesh, microbatches=4)))
        )(params_s)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


def test_pipelined_label_dropout_path_runs():
    model, mesh, params, args = fixture(pp=2, dp=4, dropout=0.5)
    with mesh:
        params_s = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(
            lambda p: pipelined_apply(
                model, p, *args, mesh=mesh, microbatches=2,
                rngs={"label_dropout": jax.random.PRNGKey(3)},
            )
        )(params_s)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pipelined_train_step_matches_plain():
    """make_train_step with the pipelined apply_fn: same loss stream as the
    single-mesh step (dropout 0, same rng) — pp is a pure re-scheduling."""
    from fit_tpu.diffusion import create_diffusion
    from fit_tpu.train import create_train_state, make_optimizer, make_train_step
    from fit_tpu.train.step import split_for_accumulation

    model, mesh, params, args = fixture(pp=4, dp=2)
    tokens, tv, y, pos, mask = args
    batch = {"tokens": tokens, "pos": pos, "mask": mask, "label": y}
    diffusion = create_diffusion(None)

    def run(apply_fn, params, in_mesh):
        tx = make_optimizer()
        state = create_train_state(params, tx)
        step = make_train_step(apply_fn, diffusion, tx, grad_accum=1, donate=False)
        ctx = in_mesh if in_mesh is not None else _null()
        with ctx:
            state, metrics = step(state, batch, jax.random.PRNGKey(7))
        return float(metrics["loss"])

    import contextlib

    def _null():
        return contextlib.nullcontext()

    want = run(model.apply, params, None)
    params_s = jax.device_put(params, NamedSharding(mesh, P()))
    got = run(make_pipelined_apply(model, mesh, microbatches=4), params_s, mesh)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pipeline_requires_scan_blocks():
    model, mesh, params, args = fixture(pp=2, dp=4)
    unrolled = FiT(
        patch_size=2, in_channels=4, hidden_size=128, depth=4, num_heads=8,
        num_classes=10, scan_blocks=False,
    )
    with pytest.raises(AssertionError, match="scan-over-layers"):
        pipelined_apply(unrolled, params, *args, mesh=mesh, microbatches=2)
