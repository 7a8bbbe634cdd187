#!/usr/bin/env python
"""Attribute training-step time to op classes on the real TPU.

The training roofline (BASELINE.md) predicts a per-config floor; measured
steps run above it. This script answers WHERE the residual goes: it traces a
few training steps with ``jax.profiler``, parses the XPlane protobuf directly
(no TensorBoard here — see .claude/skills/verify), and buckets device-op time
into dense dots / attention kernels / optimizer+EMA / copies / everything
else, printed next to the analytic bounds from ``bench.train_roofline``.

Usage (TPU):
  python scripts/profile_train.py --model FiT-XL/2 --batch 128 --accum 4 \
      --tokens 256 --state-dtype bfloat16 [--remat none]
"""

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bucket(name: str) -> str:
    n = name.lower()
    if "fused_attention" in n or "flash" in n or "attn" in n:
        return "attention_kernel"
    if n.startswith("custom-call") or "pallas" in n:
        return "custom_call"
    if "dot" in n or "conv" in n:
        return "dot"
    if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n or "collective" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n or "reshape" in n:
        return "copy/layout"
    if "fusion" in n:
        return "fusion(elementwise/reduce)"
    if "infeed" in n or "outfeed" in n:
        return "infeed/outfeed"
    return "other"


# Wrapper/container ops whose event DURATION spans their children or an
# async in-flight window (a copy-start on a 4-float tensor shows 200+ ms;
# a %while over the 28-layer scan spans the whole step): summing them
# massively double-counts. Excluded from totals AND from the busy-union —
# the real loop-body ops appear as their own events on the same line.
_ASYNC_WRAPPERS = ("copy-start", "copy-done", "-start.", "-done.",
                   "send", "recv")
_CONTAINERS = ("while", "conditional", "call.")


def _is_async_wrapper(name: str) -> bool:
    n = name.lower().lstrip("%")
    return (
        any(w in n for w in _ASYNC_WRAPPERS)
        or n.endswith(("-start", "-done"))
        or any(n.startswith(c) for c in _CONTAINERS)
    )


def parse_xplane(logdir):
    """Sum per-op durations from the busiest device plane's op-level lines.

    Picks the plane whose name mentions TPU (falls back to the busiest
    non-host plane) and, within it, aggregates every line whose events carry
    HLO-op metadata — excluding async start/done wrappers (their duration is
    the async WINDOW, not busy time). Returns ({op_name: total_seconds},
    trace_span_s, busy_union_s): busy_union is the merged-interval time the
    core spent in any real op, so span - busy = stalls (DMA waits, host
    gaps, infeed).
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    device_planes = [p for p in space.planes if "TPU" in p.name.upper()]
    if not device_planes:
        device_planes = [p for p in space.planes if "host" not in p.name.lower()]
    totals = collections.Counter()
    span_ps = 0
    intervals = []
    async_intervals = []  # "Async XLA Ops" windows: DMA in flight
    for plane in device_planes:
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        # the op-level line: named "XLA Ops" on TPU device planes; fall back
        # to the line with the most events (step/module lines have only a
        # handful of per-step/per-module spans, the op line has thousands)
        named = [
            ln for ln in plane.lines
            if "op" in (ln.name or "").lower()
            and "async" not in (ln.name or "").lower()
        ]
        if named:
            best_line = max(named, key=lambda ln: len(ln.events))
        elif plane.lines:
            best_line = max(plane.lines, key=lambda ln: len(ln.events))
        else:
            continue
        t0 = min((ev.offset_ps for ev in best_line.events), default=0)
        t1 = max((ev.offset_ps + ev.duration_ps for ev in best_line.events), default=0)
        span_ps = max(span_ps, t1 - t0)
        for ev in best_line.events:
            name = meta.get(ev.metadata_id, f"op{ev.metadata_id}")
            if _is_async_wrapper(name):
                continue
            totals[name] += ev.duration_ps
            intervals.append((ev.offset_ps, ev.offset_ps + ev.duration_ps))
        # async line: each event is a launch->done WINDOW with a DMA (or
        # other async op) in flight — union them with compute to split
        # "core idle but DMA busy" from genuine idle
        for line in plane.lines:
            if "async" in (line.name or "").lower():
                async_intervals.extend(
                    (ev.offset_ps, ev.offset_ps + ev.duration_ps)
                    for ev in line.events
                )

    def union_ps(ivs):
        ivs = sorted(ivs)
        busy = 0
        cur_s = cur_e = None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            busy += cur_e - cur_s
        return busy

    return (
        {k: v / 1e12 for k, v in totals.items()},
        span_ps / 1e12,
        union_ps(intervals) / 1e12,
        union_ps(intervals + async_intervals) / 1e12,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="FiT-XL/2")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--state-dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ap.add_argument("--remat", choices=["full", "dots", "none"], default="full")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--parse-only", default=None, metavar="LOGDIR",
                    help="re-parse an existing trace dir (no TPU run); pass "
                    "--measured-ms to carry the measured step time into the "
                    "report")
    ap.add_argument("--measured-ms", type=float, default=0.0)
    args = ap.parse_args()

    if args.parse_only:
        step_s = args.measured_ms / 1e3 if args.measured_ms else None
        logdir = args.parse_only
        report_and_exit(args, logdir, step_s)
        return

    import jax
    import jax.numpy as jnp

    import bench
    from fit_tpu.utils.profiling import force_completion, trace

    sd = jnp.bfloat16 if args.state_dtype == "bfloat16" else None
    remat = {"full": True, "dots": "dots", "none": False}[args.remat]
    # measure_train compiles + times; reuse it so the profiled program IS the
    # benched program, then re-trace a few steps
    img_s, step_s, model, params = bench.measure_train(
        args.model, args.batch, grad_accum=args.accum, iters=args.steps,
        t_len=args.tokens, state_dtype=sd, remat=remat,
    )
    print(f"measured: {img_s:.1f} img/s, {step_s * 1e3:.1f} ms/step")

    # rebuild the step/state (measure_train donated its state away) and trace
    import numpy as np

    from fit_tpu.diffusion import create_diffusion
    from fit_tpu.train import create_train_state, make_optimizer, make_train_step
    from fit_tpu.train.step import split_for_accumulation

    head_dim = model.hidden_size // model.num_heads
    params = bench.init_params(model, head_dim)
    tx = make_optimizer(moment_dtype=sd)
    state = create_train_state(params, tx, ema_dtype=sd or jnp.float32)
    step_fn = make_train_step(
        model.apply, create_diffusion(None), tx, grad_accum=args.accum, donate=True
    )
    rng = np.random.default_rng(0)
    lengths = rng.integers(max(args.tokens // 2, 1), args.tokens + 1, size=args.batch)
    batch_d = {
        "tokens": jnp.asarray(rng.normal(size=(args.batch, args.tokens, 16)).astype(np.float32)),
        "pos": jnp.asarray(rng.normal(size=(args.batch, args.tokens, head_dim)).astype(np.float32)),
        "mask": jnp.asarray(np.arange(args.tokens)[None] < lengths[:, None]),
        "label": jnp.asarray(rng.integers(0, 1000, size=args.batch).astype(np.int32)),
    }
    if args.accum > 1:
        batch_d = split_for_accumulation(batch_d, args.accum)
    key = jax.random.PRNGKey(0)
    state, m = step_fn(state, batch_d, key)  # compile outside the trace
    force_completion(m["loss"])

    logdir = tempfile.mkdtemp(prefix="fit_train_prof_")
    with trace(logdir):
        for i in range(args.steps):
            state, m = step_fn(state, batch_d, jax.random.fold_in(key, i))
        force_completion(m["loss"])

    report_and_exit(args, logdir, step_s)


def report_and_exit(args, logdir, step_s):
    totals, span, busy, busy_w_dma = parse_xplane(logdir)
    by_bucket = collections.Counter()
    for name, sec in totals.items():
        by_bucket[bucket(name)] += sec
    dev_total = sum(totals.values())
    print(f"\ntrace: {span * 1e3:.1f} ms span, {dev_total * 1e3:.1f} ms device-op "
          f"time over {args.steps} steps "
          f"({dev_total / args.steps * 1e3:.1f} ms/step device)")
    print(f"compute busy-union {busy * 1e3:.1f} ms; compute+DMA "
          f"{busy_w_dma * 1e3:.1f} ms; genuine idle "
          f"{(span - busy_w_dma) * 1e3:.1f} ms over the span")
    if step_s:
        print(f"core busy fraction of measured step: "
              f"{busy / args.steps / step_s:.3f}; DMA-covered "
              f"{(busy_w_dma - busy) / args.steps / step_s:.3f}\n")
    print("-- by bucket (ms/step) --")
    for k, v in by_bucket.most_common():
        print(f"  {k:28s} {v / args.steps * 1e3:9.2f}  "
              f"({v / dev_total * 100:4.1f}%)")
    print(f"\n-- top {args.top} ops (ms/step) --")
    for name, sec in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {sec / args.steps * 1e3:8.2f}  {name[:110]}")
    out = {
        "model": args.model, "batch": args.batch, "accum": args.accum,
        "tokens": args.tokens, "remat": args.remat,
        "state_dtype": args.state_dtype,
        "device_ms_per_step": round(dev_total / args.steps * 1e3, 2),
        "compute_busy_ms_per_step": round(busy / args.steps * 1e3, 2),
        "dma_only_ms_per_step": round(
            (busy_w_dma - busy) / args.steps * 1e3, 2
        ),
        "idle_ms_over_span": round((span - busy_w_dma) * 1e3, 2),
        "buckets_ms_per_step": {
            k: round(v / args.steps * 1e3, 2) for k, v in by_bucket.items()
        },
    }
    if step_s:
        out["measured_step_ms"] = round(step_s * 1e3, 2)
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
