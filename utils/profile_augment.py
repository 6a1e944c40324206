"""Per-op device profile of the fused train augment (ops/augment.py).

Companion to utils/profile_step.py (same trace parsing / roofline
machinery): traces `augment_batch` over a bench-shaped uint8 batch and
groups device time per op with HLO-estimated HBM bytes. Used to attribute
the ~33 ms/clip-batch augment cost (hue HSV round-trip vs blend-slot
reduces vs resize einsums) measured by bench.py's cached phase.

Usage: python utils/profile_augment.py [--batch 128] [--steps 5]
       [--roofline] [--jitter hsplit|csplit]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_and_trace(batch: int, steps: int, trace_dir: str, jitter: str):
    os.environ["RSPNET_JITTER"] = jitter
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rspnet_tpu.framework import enable_persistent_jit_cache
    enable_persistent_jit_cache()
    from rspnet_tpu.ops.augment import augment_batch, sample_train_params

    T, S = 24, 112          # bench packed length / output size
    DH, DW = 128, 171       # decode resolution (device-geometry pipeline)
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 255, (batch, T, DH, DW, 3), np.uint8))
    p = sample_train_params(rng, batch, [(DH, DW)], crop_area=(0.4, 1.0),
                            h_flip=0.5, gray_p=0.2,
                            jitter=(0.4, 0.4, 0.4, 0.4))

    def run(params):
        return jnp.sum(augment_batch(
            u8, params.boxes, params.flip, params.jitter, params.order,
            params.gray, params.blur, size=(S, S)))

    t0 = time.perf_counter()
    float(run(p))            # compile + real completion (fetch-synced)
    print(f"# warmup (compile or cache load): {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)
    try:
        # lower the SAME jitted callable the timed loop runs so HLO
        # instruction names line up with the trace rows
        lowered = augment_batch.lower(
            u8, p.boxes, p.flip, p.jitter, p.order, p.gray, p.blur,
            size=(S, S))
        Path(trace_dir).mkdir(parents=True, exist_ok=True)
        (Path(trace_dir) / "hlo.txt").write_text(
            lowered.compile().as_text())
    except Exception as e:  # pragma: no cover - best-effort artifact
        print(f"# hlo dump failed: {e}", file=sys.stderr)
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(steps):
            out = run(p)
        float(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--jitter", default="hsplit",
                    choices=["hsplit", "csplit"])
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--parse-only", default=None, metavar="DIR")
    ap.add_argument("--roofline", action="store_true")
    args = ap.parse_args()

    from profile_step import summarize  # same dir import

    if args.parse_only:
        summarize(args.parse_only, args.steps, args.top,
                  do_roofline=args.roofline)
        return
    trace_dir = args.trace_dir or f"/tmp/rspnet_augment_trace_{os.getpid()}"
    run_and_trace(args.batch, args.steps, trace_dir, args.jitter)
    summarize(trace_dir, args.steps, args.top, do_roofline=args.roofline)


if __name__ == "__main__":
    main()
