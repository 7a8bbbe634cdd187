"""scan-over-layers mode: numerical equivalence with the unrolled model and
param layout conversion round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from fit_tpu.models import FiT
from fit_tpu.models.fit import stack_block_params, unstack_block_params

KW = dict(
    patch_size=2, in_channels=4, hidden_size=64, depth=3, num_heads=4,
    num_classes=8, class_dropout_prob=0.0, attn_backend="xla",
)


def make_args(b=2, t=32, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, t, 16)).astype(np.float32)),
        jnp.asarray([5, 10]),
        jnp.asarray([1, 2]),
        jnp.asarray(rng.normal(size=(b, t, 16)).astype(np.float32)),
        jnp.asarray(np.arange(t)[None] < np.array([[20], [32]])),
    )


def randomized_params(model, args, seed=5):
    p = model.init({"params": jax.random.PRNGKey(0)}, *args, train=True)
    leaves, td = jax.tree.flatten(p)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        td, [0.05 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    )


def test_scan_matches_unrolled():
    args = make_args()
    m_unroll = FiT(**KW)
    m_scan = FiT(**KW, scan_blocks=True)
    p = randomized_params(m_unroll, args)
    want = np.asarray(m_unroll.apply(p, *args, train=True))
    got = np.asarray(m_scan.apply(stack_block_params(p, KW["depth"]), *args, train=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_stack_roundtrip_and_init_layout():
    args = make_args()
    m_unroll = FiT(**KW)
    m_scan = FiT(**KW, scan_blocks=True)
    p = randomized_params(m_unroll, args)
    stacked = stack_block_params(p, KW["depth"])

    import jax.tree_util as jtu

    init_scan = m_scan.init({"params": jax.random.PRNGKey(0)}, *args, train=True)
    s1 = {jtu.keystr(k): v.shape for k, v in jtu.tree_flatten_with_path(stacked)[0]}
    s2 = {jtu.keystr(k): v.shape for k, v in jtu.tree_flatten_with_path(init_scan)[0]}
    assert s1 == s2

    back = unstack_block_params(stacked, KW["depth"])
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_with_remat():
    args = make_args()
    m = FiT(**KW, scan_blocks=True, remat=True)
    p = randomized_params(m, args)
    out = m.apply(p, *args, train=True)
    # grads flow through remat+scan
    g = jax.grad(lambda pp: jnp.sum(m.apply(pp, *args, train=True) ** 2))(p)
    assert np.isfinite(np.asarray(out)).all()
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
