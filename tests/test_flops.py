"""Analytic FLOP / roofline accounting (fit_tpu.utils.flops).

The roofline is documentation-as-code for the bench: these tests pin the
counting conventions (1 MAC = 2 FLOPs, batch scaling, component split) and
the round-3 hardware-correction terms (MXU lane efficiency at per-head
width d < 128, VPU softmax costing) so a refactor can't silently change
what `bench.py` reports as "compute_bound_ms".
"""

import pytest

from fit_tpu.utils.flops import (
    _PEAKS,
    FitFlops,
    attention_mxu_efficiency,
    fit_forward_flops,
    peak_flops,
    peak_hbm_bw,
    peak_vpu_flops,
    softmax_vpu_ops,
)


def test_forward_flops_components_and_batch_scaling():
    fl1 = fit_forward_flops(1152, 28, 16, t=256, batch=1)
    fl4 = fit_forward_flops(1152, 28, 16, t=256, batch=4)
    assert fl1.total == pytest.approx(fl1.dense + fl1.attention + fl1.rope + fl1.cond)
    for f in ("dense", "attention", "rope", "cond", "total"):
        assert getattr(fl4, f) == pytest.approx(4 * getattr(fl1, f))


def test_attention_flops_quadratic_in_t():
    a = fit_forward_flops(768, 12, 12, t=512).attention
    b = fit_forward_flops(768, 12, 12, t=1024).attention
    assert b == pytest.approx(4 * a)


def test_scaled_preserves_structure():
    fl = fit_forward_flops(768, 12, 12, t=256)
    tripled = fl.scaled(3.0)
    assert isinstance(tripled, FitFlops)
    assert tripled.total == pytest.approx(3 * fl.total)


def test_mxu_efficiency():
    # FiT head widths: XL/B are 72/64-wide -> padded to 128 lanes
    assert attention_mxu_efficiency(72) == pytest.approx(72 / 128)
    assert attention_mxu_efficiency(64) == pytest.approx(0.5)
    assert attention_mxu_efficiency(128) == 1.0
    assert attention_mxu_efficiency(256) == 1.0  # never above peak


def test_softmax_vpu_ops_scaling():
    base = softmax_vpu_ops(28, 16, 1024, batch=1)
    assert softmax_vpu_ops(28, 16, 2048, batch=1) == pytest.approx(4 * base)
    assert softmax_vpu_ops(28, 16, 1024, batch=8) == pytest.approx(8 * base)
    # backward ~ 3x: recompute p + two more walks of the score set
    assert softmax_vpu_ops(28, 16, 1024, batch=1, backward=True) == pytest.approx(
        3 * base
    )


def test_moe_flops_accounting():
    """Top-1 MoE at capacity factor 1.0 runs EXACTLY the dense SwiGLU FFN
    matmul volume (slots == tokens); the honest-MFU delta is the dispatch/
    combine einsums + router, pinned here so `bench.py --train-ffn moe`
    can't silently report dense-FFN MFU (VERDICT r4 item 6)."""
    import math

    dense = fit_forward_flops(768, 12, 12, t=256)
    moe = fit_forward_flops(
        768, 12, 12, t=256, ffn="moe", moe_experts=8, moe_capacity=1.0
    )
    assert dense.dispatch == 0.0
    assert moe.dense == pytest.approx(dense.dense)  # cf=1: slots == t
    assert moe.attention == dense.attention and moe.rope == dense.rope
    slots = 256
    expect = 12 * (2 * 2 * 256 * slots * 768 + 2 * 256 * 768 * 8)
    assert moe.dispatch == pytest.approx(expect)
    assert moe.total == pytest.approx(dense.total + moe.dispatch)

    # capacity factor 1.25 inflates ONLY the FFN share of dense by ~1.25x
    moe125 = fit_forward_flops(
        768, 12, 12, t=256, ffn="moe", moe_experts=8, moe_capacity=1.25
    )
    dh = int(768 * 4 * 2 / 3)
    ffn_dense = 12 * 256 * 3 * 2 * 768 * dh
    slots125 = 8 * math.ceil(256 / 8 * 1.25)
    assert moe125.dense - dense.dense == pytest.approx(
        (slots125 - 256) / 256 * ffn_dense
    )
    # batch scaling covers the new component too
    assert fit_forward_flops(
        768, 12, 12, t=256, batch=4, ffn="moe", moe_experts=8
    ).dispatch == pytest.approx(4 * moe125.dispatch)


def test_peak_tables_are_consistent():
    for kind, row in _PEAKS.items():
        mxu, hbm, vpu = row
        assert mxu > hbm, kind  # FLOP/s always exceeds byte/s on TPUs
        # MXU/VPU ratio is O(25-125): catches a mistyped exponent
        assert 25 < mxu / vpu < 125, kind
    assert peak_flops("TPU v5e") == _PEAKS["TPU v5e"][0]
    assert peak_hbm_bw("TPU v5e") == _PEAKS["TPU v5e"][1]
    assert peak_vpu_flops("TPU v5e") == _PEAKS["TPU v5e"][2]
    assert peak_flops("cpu") is None
    assert peak_vpu_flops("cpu") is None


def test_peak_flops_env_override(monkeypatch):
    monkeypatch.setenv("FIT_TPU_PEAK_FLOPS", "1e12")
    assert peak_flops("TPU v5e") == 1e12


def test_moe_sort_dispatch_flops():
    """dispatch='sort' moves tokens by argsort+gather — zero dispatch MACs;
    only the router's logits remain in the dispatch component."""
    einsum = fit_forward_flops(
        768, 12, 12, t=256, ffn="moe", moe_experts=8, moe_dispatch="einsum"
    )
    sort = fit_forward_flops(
        768, 12, 12, t=256, ffn="moe", moe_experts=8, moe_dispatch="sort"
    )
    assert sort.dense == pytest.approx(einsum.dense)
    router = 12 * 2 * 256 * 768 * 8
    assert sort.dispatch == pytest.approx(router)
    assert einsum.dispatch > 20 * sort.dispatch  # the eliminated MAC volume
    assert sort.total == pytest.approx(einsum.total - (einsum.dispatch - router))
