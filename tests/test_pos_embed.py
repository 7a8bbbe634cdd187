"""Unit tests for 2D sincos and RoPE tables, including VisionNTK.

Oracles are written from the math definitions (closed forms), independently
of the implementation's code path.
"""

import numpy as np
import pytest

from fit_tpu.core import pos_embed as pe


def test_grid_positions_row_major():
    pos_w, pos_h = pe.grid_positions_2d(2, 3)
    # token i at (h=i//nw, w=i%nw)
    np.testing.assert_array_equal(pos_w, [0, 1, 2, 0, 1, 2])
    np.testing.assert_array_equal(pos_h, [0, 0, 0, 1, 1, 1])


def test_sincos_1d_closed_form():
    D, L = 8, 5
    table = pe.sincos_1d(D, L)
    assert table.shape == (L, D)
    assert table.dtype == np.float32
    for m in range(L):
        for j in range(D // 2):
            omega = 1.0 / 10000 ** (j / (D / 2))
            assert table[m, j] == pytest.approx(np.sin(m * omega), abs=1e-7)
            assert table[m, D // 2 + j] == pytest.approx(np.cos(m * omega), abs=1e-7)


def test_sincos_2d_w_first_concat():
    D = 8
    table = pe.sincos_2d(D, 2, 3)
    assert table.shape == (6, D)
    # token 1 is (h=0, w=1); token 3 is (h=1, w=0).
    one_d = pe.sincos_1d(D // 2, 4)  # positions 0..3
    np.testing.assert_allclose(table[1, : D // 2], one_d[1], rtol=1e-6)  # w part
    np.testing.assert_allclose(table[1, D // 2 :], one_d[0], rtol=1e-6)  # h part
    np.testing.assert_allclose(table[3, : D // 2], one_d[0], rtol=1e-6)
    np.testing.assert_allclose(table[3, D // 2 :], one_d[1], rtol=1e-6)


def test_rope_2d_layout_and_values():
    """head_dim=64 -> 16 w-axis (cos,sin) pairs then 16 h-axis pairs."""
    dim = 64
    nh, nw = 3, 2
    table = pe.rope_freqs_2d(dim, nh, nw)
    assert table.shape == (6, dim)
    assert table.dtype == np.float32

    # closed form: axis dim is dim/2=32, so 16 freqs theta**(-2j/32)
    def pair(posval, j):
        f = 1.0 / 10000 ** (2 * j / 32)
        return np.cos(posval * f), np.sin(posval * f)

    # token 5 => (h=2, w=1)
    tok = table[5].reshape(32, 2)
    for j in range(16):
        cw, sw = pair(1.0, j)  # w-axis
        ch, sh = pair(2.0, j)  # h-axis
        assert tok[j, 0] == pytest.approx(cw, abs=1e-6)
        assert tok[j, 1] == pytest.approx(sw, abs=1e-6)
        assert tok[16 + j, 0] == pytest.approx(ch, abs=1e-6)
        assert tok[16 + j, 1] == pytest.approx(sh, abs=1e-6)


def test_rope_position_zero_is_identity():
    table = pe.rope_freqs_2d(64, 4, 4)
    tok0 = table[0].reshape(-1, 2)
    np.testing.assert_array_equal(tok0[:, 0], 1.0)  # cos(0)
    np.testing.assert_array_equal(tok0[:, 1], 0.0)  # sin(0)


def test_visionntk_identity_within_budget():
    """Grid coords <= sqrt(max_length) => s=1 => same angles.

    Note: with max_length given, theta is promoted to float64 (reference
    semantics), so the table agrees with the float32 training table only to
    float32 rounding, not bit-for-bit.
    """
    base = pe.rope_freqs_2d(64, 16, 16)
    ntk = pe.rope_freqs_2d(64, 16, 16, max_length=256)
    assert pe.ntk_scaled_theta(10000.0, 32, np.float32(15.0), 256) == 10000.0
    np.testing.assert_allclose(base, ntk.astype(np.float32), atol=5e-7)


def test_visionntk_rescales_beyond_budget():
    dim_axis = 32  # per-axis dim for head_dim 64
    nh = nw = 32  # 1024 tokens > 256 budget
    ntk = pe.rope_freqs_2d(64, nh, nw, max_length=256)
    base = pe.rope_freqs_2d(64, nh, nw)
    assert not np.allclose(ntk, base)
    # closed form for the scaled theta: s = 31/16, theta' = 1e4 * s**(32/30)
    s = 31 / np.sqrt(256)
    theta_p = 10000.0 * s ** (dim_axis / (dim_axis - 2))
    assert pe.ntk_scaled_theta(10000.0, dim_axis, np.float32(31.0), 256) == pytest.approx(theta_p)
    # spot-check one angle: token at (h=0, w=31), first w-frequency j=1
    tok = np.asarray(ntk[31]).reshape(32, 2)
    f1 = 1.0 / theta_p ** (2 * 1 / 32)
    assert tok[1, 0] == pytest.approx(np.cos(31 * f1), rel=1e-5)
    assert tok[1, 1] == pytest.approx(np.sin(31 * f1), rel=1e-5)


def test_visionntk_interpolation_never_shrinks_theta():
    # tiny grids: s clamps at 1, theta never decreases below base
    assert pe.ntk_scaled_theta(10000.0, 32, np.float32(3.0), 256) == 10000.0


def test_reference_named_aliases():
    assert pe.precompute_freqs_cis_2d is pe.rope_freqs_2d
    assert pe.get_2d_sincos_pos_embed is pe.sincos_2d
    assert pe.get_1d_sincos_pos_embed is pe.sincos_1d
