"""Per-op device profile of the fused MoCo train step (bench.py config).

Runs a few steps under jax.profiler.trace and prints the top XLA ops by
total device time — the ground truth for where the step's 126 ms go
(the axon platform does export device op timings; durations in the
chrome trace are microseconds).

Usage: python utils/profile_step.py [--batch 128] [--steps 5] [--top 25]
Env:   RSPNET_POOL=xla to profile the reduce_window max-pool variant.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_and_trace(batch: int, steps: int, trace_dir: str):
    T0 = time.perf_counter()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rspnet_tpu.framework import enable_persistent_jit_cache
    enable_persistent_jit_cache()

    from rspnet_tpu.models import get_model_class
    from rspnet_tpu.moco import (MoCoConfig, MultiTaskWrapper,
                                 init_moco_state, make_sharded_train_step,
                                 packed_frame_subset)
    from rspnet_tpu.parallel import (create_mesh, fetch_scalar,
                                     replicate_to_mesh, shard_batch)

    mesh = create_mesh()
    n_chips = jax.device_count()
    b_global = batch * n_chips
    T, S = 32, 112
    subset = packed_frame_subset(T, (2,))
    P = len(subset)

    cfg = MoCoConfig(dim=128, k=16384 - 16384 % b_global, m=0.999, t=0.07,
                     diff_speed=(2,), packed_frames=True, t_load=T)
    model = MultiTaskWrapper(
        encoder_factory=get_model_class("s3dg"),
        num_classes=cfg.dim, finetune=False, fc_type="linear",
        dtype=jnp.bfloat16, axis_name="data")
    optimizer = optax.chain(
        optax.add_decayed_weights(1e-4), optax.sgd(0.05, momentum=0.9))
    state = init_moco_state(model, cfg, optimizer, jax.random.PRNGKey(0),
                            (1, 16, S, S, 3))
    step = make_sharded_train_step(model, optimizer, cfg, mesh)

    rng = np.random.RandomState(0)
    im_q = jnp.asarray(rng.rand(b_global, P, S, S, 3), jnp.float32)
    im_k = jnp.asarray(rng.rand(b_global, P, S, S, 3), jnp.float32)

    print(f"# state+step built at +{time.perf_counter() - T0:.0f}s",
          file=sys.stderr, flush=True)
    with mesh:
        state = replicate_to_mesh(state, mesh)
        im_q = shard_batch(im_q, mesh)
        im_k = shard_batch(im_k, mesh)
        t0 = time.perf_counter()
        state, metrics = step(state, im_q, im_k, jax.random.PRNGKey(1))
        fetch_scalar(metrics["loss"])
        print(f"# warmup (compile or cache load): "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)
        # Dump the optimized HLO next to the trace: summarize() estimates
        # per-op HBM bytes from instruction shapes when the trace carries
        # no byte counters (the axon profiler exports durations and
        # model_flops but not bytes_accessed).
        try:
            hlo = step.lower(state, im_q, im_k,
                             jax.random.PRNGKey(1)).compile().as_text()
            Path(trace_dir).mkdir(parents=True, exist_ok=True)
            (Path(trace_dir) / "hlo.txt").write_text(hlo)
        except Exception as e:  # pragma: no cover - best-effort artifact
            print(f"# hlo dump failed: {e}", file=sys.stderr)
        with jax.profiler.trace(trace_dir):
            for i in range(steps):
                state, metrics = step(state, im_q, im_k,
                                      jax.random.PRNGKey(2 + i))
            fetch_scalar(metrics["loss"])


# v5e per-chip speed-of-light constants (public spec: 394 bf16 TFLOP/s,
# 819 GB/s HBM BW). The roofline bound for an op is
# max(flops/394e12, bytes/819e9); "x bound" = measured_time / bound.
V5E_BF16_TFLOPS = 394.0
V5E_HBM_GBPS = 819.0

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1,
}


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples by summing)."""
    total = 0
    for m in re.finditer(r"([a-z]\w*?)\[([\d,]*)\]", shape_str):
        bs = _DTYPE_BYTES.get(m.group(1))
        if bs is None:
            continue  # token[], opaque[]
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * bs
    return total


def _scan_balanced(s: str, i: int) -> int:
    """Index just past the group that opens at s[i] ('(' or '{')."""
    close = {"(": ")", "{": "}"}[s[i]]
    depth = 0
    for j in range(i, len(s)):
        if s[j] == s[i]:
            depth += 1
        elif s[j] == close:
            depth -= 1
            if depth == 0:
                return j + 1
    return len(s)


def parse_hlo_bytes(hlo_text: str) -> dict:
    """name -> (output_bytes, output+operand bytes) for every instruction.

    Bytes are a *roofline estimate* of the op's HBM traffic: a fusion
    reads each operand once from HBM and writes its output once (XLA may
    do better via reuse in VMEM, never worse for a single pass). HLO
    instruction names are module-unique, so one flat map suffices for
    looking up trace op names (which match the top-level entry names).
    """
    shapes = {}     # name -> output bytes
    operands = {}   # name -> [operand names]
    for raw in hlo_text.splitlines():
        line = raw.strip()
        m = re.match(r"(?:ROOT\s+)?%?([\w.\-]+) = ", line)
        if not m:
            continue
        name = m.group(1)
        rest = line[m.end():]
        # shape: either a tuple "(f32[..]{..}, ...)" or "f32[..]{..}"
        if rest.startswith("("):
            end = _scan_balanced(rest, 0)
        else:
            sm = re.match(r"[a-z]\w*\[[\d,]*\](?:\{[^}]*\})?", rest)
            if not sm:
                continue
            end = sm.end()
        shape_str, rest = rest[:end], rest[end:].lstrip()
        om = re.match(r"[\w\-]+\(", rest)
        ops = []
        if om:
            gend = _scan_balanced(rest, om.end() - 1)
            ops = re.findall(r"%([\w.\-]+)", rest[om.end() - 1:gend])
        shapes[name] = _shape_bytes(shape_str)
        operands[name] = ops
    out = {}
    for name, ob in shapes.items():
        total = ob + sum(shapes.get(o, 0) for o in operands.get(name, ()))
        out[name] = (ob, total)
    return out


def roofline(per_op, steps: int, top: int):
    """Per-op attainable-time table for the lowest-TF/s fusions.

    Needs byte counters in the trace events (the axon/TPU profiler exports
    bytes_accessed per op when available); ops without one get bytes from
    'shapes'-free fallback = unknown and are marked '?'.
    """
    rows = []
    for name, rec in per_op.items():
        dur_us, n, flops, tf_op = rec[0], rec[1], rec[2], rec[3]
        byt = rec[4] if len(rec) > 4 else 0.0
        src = rec[5] if len(rec) > 5 else ("counter" if byt else "none")
        if dur_us <= 0:
            continue
        t_comp = flops / (V5E_BF16_TFLOPS * 1e12) * 1e6   # us
        t_mem = byt / (V5E_HBM_GBPS * 1e9) * 1e6 if byt else 0.0
        bound = max(t_comp, t_mem)
        rows.append((name, dur_us, n, flops, byt, t_comp, t_mem, bound,
                     tf_op, src))
    # sort by worst absolute headroom (measured - bound), the real target
    rows.sort(key=lambda r: -(r[1] - r[7]))
    print("\n== roofline (v5e: %.0f bf16 TF/s, %.0f GB/s HBM); headroom = "
          "measured - bound" % (V5E_BF16_TFLOPS, V5E_HBM_GBPS))
    print("%9s %9s %9s %7s %7s %7s  %s" % (
        "meas ms", "bound ms", "headrm ms", "x bnd", "TF/s", "GB/s", "op"))
    for (name, dur, n, flops, byt, t_comp, t_mem, bound, tf_op,
         src) in rows[:top]:
        tfs = flops / (dur * 1e6) if dur else 0.0
        gbs = byt / (dur * 1e3) if dur else 0.0   # bytes/us -> GB/s
        mark = {"counter": "", "hlo-est": "  [hlo est]",
                "none": "  [no bytes]"}[src]
        xb = dur / bound if bound else float("inf")
        print("%9.3f %9.3f %9.3f %7.1f %7.1f %7.0f  %s%s" % (
            dur / 1e3 / steps, bound / 1e3 / steps,
            (dur - bound) / 1e3 / steps, xb, tfs, gbs, name[:52], mark))


def summarize(trace_dir: str, steps: int, top: int,
              dump_args: bool = False, do_roofline: bool = False):
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/",
                                   "*.trace.json.gz"))
    if not paths:
        print(json.dumps({"error": "no trace produced"}))
        return
    hlo_bytes = {}
    hlo_path = Path(trace_dir) / "hlo.txt"
    if hlo_path.exists():
        hlo_bytes = parse_hlo_bytes(hlo_path.read_text())
    with gzip.open(sorted(paths)[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}

    def direction(tf_op: str) -> str:
        if "transpose(jvp(" in tf_op:
            return "bwd"
        if "jvp(" in tf_op:
            return "fwd"
        return "other"

    per_prog = defaultdict(lambda: [0.0, 0])
    per_cat = defaultdict(lambda: [0.0, 0])     # (dir, hlo_category)
    # name -> [t_us, n, flops, tf_op, bytes]
    per_op = defaultdict(lambda: [0.0, 0, 0.0, "", 0.0])
    arg_keys = defaultdict(int)
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in tpu_pids:
            continue
        name, dur = e["name"], e.get("dur", 0.0)  # dur in us
        args = e.get("args") or {}
        if name.startswith("jit_"):
            per_prog[name.split("(")[0]][0] += dur
            per_prog[name.split("(")[0]][1] += 1
            continue
        if not args.get("hlo_category"):
            continue                      # per-step region rows, not ops
        if dump_args:
            for k in args:
                arg_keys[k] += 1
        tf_op = args.get("tf_op", "")
        cat = (direction(tf_op), args["hlo_category"])
        per_cat[cat][0] += dur
        per_cat[cat][1] += 1
        rec = per_op[name]
        rec[0] += dur
        rec[1] += 1
        rec[2] += float(args.get("model_flops", 0) or 0)
        rec[3] = tf_op
        got_counter = False
        for bk in ("bytes_accessed", "bytes accessed",
                   "model_bytes_accessed"):
            if args.get(bk):
                rec[4] += float(args[bk])
                got_counter = True
                break
        if not got_counter:
            hb = hlo_bytes.get(name.lstrip("%"))
            if hb:
                rec[4] += float(hb[1])
                if len(rec) == 5:
                    rec.append("hlo-est")
    if dump_args:
        print("== per-op arg keys seen:",
              json.dumps(dict(sorted(arg_keys.items()))))

    rows = sorted(per_prog.items(), key=lambda kv: -kv[1][0])
    # Normalize by the EXECUTION COUNT the trace actually holds, not the
    # requested --steps: the profiler window can capture extra in-flight
    # executions (the 2026-08-17 63-vs-106 ms/step "mystery" was exactly
    # this — 5 captured executions divided by steps=3).
    if rows and rows[0][1][1] > 0:
        steps = rows[0][1][1]
    print(f"== programs (normalizing by {steps} captured executions)")
    for name, (dur, n) in rows[:5]:
        print(f"{dur / 1e3 / steps:9.3f} ms/step  x{n:<4d} {name[:80]}")

    total = sum(v[0] for v in per_cat.values())
    print(f"\n== device time by (direction, category) "
          f"(total {total / 1e3 / steps:.2f} ms/step)")
    for (dirn, cat), (dur, n) in sorted(per_cat.items(),
                                        key=lambda kv: -kv[1][0]):
        print(f"{dur / 1e3 / steps:9.3f} ms/step  x{n / steps:<6.0f} "
              f"{dirn:5s} {cat}")

    if do_roofline:
        roofline(per_op, steps, top)

    print(f"\n== top ops")
    for name, (dur, n, flops, tf_op, *_rest) in sorted(
            per_op.items(), key=lambda kv: -kv[1][0])[:top]:
        tflops = flops / (dur * 1e6) if dur else 0.0   # flops/us -> TF/s
        short = tf_op.replace("jit(step)/", "").replace(
            "transpose(jvp(MultiTaskWrapper))", "BWD").replace(
            "jvp(MultiTaskWrapper)", "FWD")
        print(f"{dur / 1e3 / steps:8.3f} ms/step x{n / steps:<4.0f} "
              f"{tflops:6.1f}TF/s {name[:28]:28s} {short[:70]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--parse-only", default=None, metavar="DIR",
                    help="summarize an existing trace dir, no device run")
    ap.add_argument("--dump-args", action="store_true",
                    help="print the union of per-op trace arg keys")
    ap.add_argument("--roofline", action="store_true",
                    help="per-op attainable-time table (needs byte "
                    "counters in the trace)")
    args = ap.parse_args()
    if args.parse_only:
        summarize(args.parse_only, args.steps, args.top, args.dump_args,
                  args.roofline)
        return
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="rspnet_prof_")
    run_and_trace(args.batch, args.steps, trace_dir)
    summarize(trace_dir, args.steps, args.top, args.dump_args,
              args.roofline)
    print(f"# trace: {trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
