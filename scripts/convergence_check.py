#!/usr/bin/env python
"""Convergence-run curve analysis (phase C of scripts/convergence_run.sh).

Verifies, from the per-step loss JSONLs alone:

1. **learning** — the control run's loss falls far from init and plateaus
   (the reference's evidence of learning is its 370k-step resume checkpoint,
   /root/reference/FiT/launch.sbatch:13; this is ours, executed in-repo);
2. **resume exactness in anger** — the kill -9'd run, relaunched, rewinds to
   its last checkpoint and then reproduces the control's loss at every
   subsequent step bit-for-bit (same seed => both runs are the same
   deterministic trajectory; the interrupted one just crossed a process
   death, an Orbax restore, a loader-position seek, and a host-RNG reload).

Writes a summary JSON + the control curve into --artifacts for the record.
"""

import argparse
import json
import os
import shutil


def read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", help="runs/convergence (control/ + interrupted/)")
    ap.add_argument("--artifacts", default="artifacts/convergence")
    ap.add_argument("--run-name", default="FiT-B-2")
    args = ap.parse_args()

    ctl = read_jsonl(os.path.join(args.out_dir, "control", f"{args.run_name}_metrics.jsonl"))
    itr = read_jsonl(os.path.join(args.out_dir, "interrupted", f"{args.run_name}_metrics.jsonl"))
    ctl_loss = {r["step"]: r["train_loss"] for r in ctl if "train_loss" in r}

    # locate the resume rewind: the step counter goes backwards (or repeats)
    # exactly once, where the relaunch restored the pre-kill checkpoint
    steps = [r["step"] for r in itr if "train_loss" in r]
    rows = [r for r in itr if "train_loss" in r]
    rewinds = [i for i in range(1, len(steps)) if steps[i] <= steps[i - 1]]
    assert len(rewinds) == 1, f"expected exactly one kill/resume rewind, found {len(rewinds)}"
    cut = rewinds[0]
    kill_step, resume_step = steps[cut - 1], steps[cut]
    print(f"killed after step {kill_step}; resumed (from checkpoint) at step {resume_step}")
    assert resume_step <= kill_step, "resume started past the kill point"

    # post-resume curve must equal the control's trajectory EXACTLY
    mismatch = [
        (s, r["train_loss"], ctl_loss[s])
        for s, r in zip(steps[cut:], rows[cut:])
        if s in ctl_loss and r["train_loss"] != ctl_loss[s]
    ]
    checked = sum(1 for s in steps[cut:] if s in ctl_loss)
    assert checked > 100, f"too few post-resume steps compared ({checked})"
    assert not mismatch, (
        f"{len(mismatch)}/{checked} post-resume losses differ from control; "
        f"first: step {mismatch[0][0]} {mismatch[0][1]} != {mismatch[0][2]}"
    )
    # ... and so must the pre-kill prefix (same seed, same trajectory)
    pre_mismatch = [
        s for s, r in zip(steps[:cut], rows[:cut])
        if s in ctl_loss and r["train_loss"] != ctl_loss[s]
    ]
    assert not pre_mismatch, f"pre-kill curve diverged at steps {pre_mismatch[:5]}"

    # learning: early loss vs converged plateau
    ctl_steps = sorted(ctl_loss)
    init_loss = ctl_loss[ctl_steps[0]]
    plateau = sum(ctl_loss[s] for s in ctl_steps[-200:]) / len(ctl_steps[-200:])
    first_quarter = ctl_steps[: max(1, len(ctl_steps) // 4)]
    early_peak = max(ctl_loss[s] for s in first_quarter)
    print(f"loss: step-1 {init_loss:.4f}, plateau(last 200) {plateau:.4f}, "
          f"fall {early_peak / plateau:.1f}x from early peak")
    assert plateau < init_loss * 0.5, "loss did not fall substantially"
    # plateau check: the last two 500-step windows agree within 5%
    w1 = [ctl_loss[s] for s in ctl_steps[-1000:-500]]
    w2 = [ctl_loss[s] for s in ctl_steps[-500:]]
    drift = abs(sum(w1) / len(w1) - sum(w2) / len(w2)) / (sum(w2) / len(w2))
    print(f"plateau drift over the last 1000 steps: {drift * 100:.2f}%")

    os.makedirs(args.artifacts, exist_ok=True)
    shutil.copy(
        os.path.join(args.out_dir, "control", f"{args.run_name}_metrics.jsonl"),
        os.path.join(args.artifacts, "control_loss.jsonl"),
    )
    shutil.copy(
        os.path.join(args.out_dir, "interrupted", f"{args.run_name}_metrics.jsonl"),
        os.path.join(args.artifacts, "interrupted_loss.jsonl"),
    )
    summary = {
        "steps": ctl_steps[-1],
        "init_loss": init_loss,
        "early_peak_loss": early_peak,
        "plateau_loss_last200": plateau,
        "fall_ratio_from_early_peak": early_peak / plateau,
        "plateau_drift_last1000_pct": drift * 100,
        "kill_step": kill_step,
        "resume_step": resume_step,
        "post_resume_steps_checked": checked,
        "post_resume_bitexact": True,
    }
    with open(os.path.join(args.artifacts, "convergence_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
