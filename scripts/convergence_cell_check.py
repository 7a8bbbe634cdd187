#!/usr/bin/env python
"""Learning-curve analysis for ONE convergence-matrix cell (VERDICT r4
items 3 & 5): bf16-SR optimizer state, bucket packing, or MoE — each trained
under the same protocol as the r4 control run (6000 steps on the reference's
shipped latents, scripts/convergence_run.sh) but with the recipe flag under
test. The control proved B/2 + pad + fp32 state learns; these prove the
numerically-different recipes do too:

* ``sr``     — bf16 Adam moments + EMA with stochastic rounding: the claim
               to kill is long-horizon rounding BIAS, invisible to the unit
               tests (tests/test_sr_state.py covers only step-level stats).
* ``bucket`` — masked_FiT token-subsampling batches through the C++ gather
               packer (bit-identity is tested; this proves training on
               random token SUBSETS actually learns).
* ``moe``    — Switch top-1 MoE on real data over thousands of steps: the
               aux-weighted router must stay balanced (moe_aux ~ 1, no
               collapse) while the loss converges.

Checks: the loss falls and plateaus like the control (ratios recorded, cell
gates generous — different recipes are different trajectories), and for moe
the tail-mean moe_aux stays near 1. Writes
artifacts/convergence/cell_<name>_summary.json.
"""

import argparse
import json
import os


def read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def curve_stats(rows):
    loss = {r["step"]: r["train_loss"] for r in rows if "train_loss" in r}
    steps = sorted(loss)
    first_quarter = steps[: max(1, len(steps) // 4)]
    tail = steps[-200:]
    w1 = [loss[s] for s in steps[-1000:-500]]
    w2 = [loss[s] for s in steps[-500:]]
    return {
        "steps": steps[-1],
        "init_loss": loss[steps[0]],
        "early_peak_loss": max(loss[s] for s in first_quarter),
        "plateau_loss_last200": sum(loss[s] for s in tail) / len(tail),
        "plateau_drift_last1000_pct": abs(
            sum(w1) / len(w1) - sum(w2) / len(w2)
        ) / (sum(w2) / len(w2)) * 100,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cell_dir", help="runs/convergence/<cell> results dir")
    ap.add_argument("--cell", required=True, choices=["sr", "bucket", "moe"])
    ap.add_argument("--control", default="runs/convergence/control",
                    help="control results dir for plateau comparison")
    ap.add_argument("--artifacts", default="artifacts/convergence")
    ap.add_argument("--run-name", default="FiT-B-2")
    # plateau-vs-control gates: sr is the same objective (bias is the only
    # degree of freedom); bucket trains on random token subsets and moe has
    # 4x FFN params + an aux term, so their plateaus legitimately differ
    ap.add_argument("--plateau-tol", type=float, default=None)
    args = ap.parse_args()
    tol = args.plateau_tol or {"sr": 0.10, "bucket": 0.30, "moe": 0.30}[args.cell]

    rows = read_jsonl(
        os.path.join(args.cell_dir, f"{args.run_name}_metrics.jsonl")
    )
    cell = curve_stats(rows)
    cell["cell"] = args.cell

    # learning gates (same spirit as convergence_check.py)
    assert cell["plateau_loss_last200"] < cell["init_loss"] * 0.5, (
        f"{args.cell}: loss did not fall substantially "
        f"({cell['init_loss']:.4f} -> {cell['plateau_loss_last200']:.4f})"
    )
    assert cell["plateau_drift_last1000_pct"] < 10.0, (
        f"{args.cell}: no plateau — drift "
        f"{cell['plateau_drift_last1000_pct']:.1f}% over the last 1000 steps"
    )

    ctl_path = os.path.join(args.control, f"{args.run_name}_metrics.jsonl")
    if os.path.exists(ctl_path):
        ctl = curve_stats(read_jsonl(ctl_path))
        ratio = cell["plateau_loss_last200"] / ctl["plateau_loss_last200"]
        cell["control_plateau_loss_last200"] = ctl["plateau_loss_last200"]
        cell["plateau_vs_control"] = ratio
        assert abs(ratio - 1.0) < tol, (
            f"{args.cell}: plateau {ratio:.3f}x control (tolerance {tol})"
        )

    if args.cell == "moe":
        aux = [r["moe_aux"] for r in rows if "moe_aux" in r]
        assert aux, "moe cell logged no moe_aux"
        tail = aux[-1000:]
        cell["moe_aux_tail_mean"] = sum(tail) / len(tail)
        cell["moe_aux_tail_max"] = max(tail)
        # E * sum f_e * m_e == 1 at uniform routing; collapse drives it
        # toward E (the r4 dynamics test starts a collapsed router at ~4)
        assert cell["moe_aux_tail_mean"] < 1.2, (
            f"router imbalance: tail moe_aux {cell['moe_aux_tail_mean']:.3f}"
        )

    os.makedirs(args.artifacts, exist_ok=True)
    out = os.path.join(args.artifacts, f"cell_{args.cell}_summary.json")
    with open(out, "w") as f:
        json.dump(cell, f, indent=2)
    print(json.dumps(cell, indent=2))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
