"""Same-session A/B benchmark harness.

The tunneled TPU chip drifts ~30-35% between sessions on IDENTICAL code
(CLAUDE.md perf log), so a bench number is only comparable to another number
from the SAME session. This tool runs `python bench.py` for the current
working tree AND for one or more git revisions back-to-back, interleaved
A/B/A/B to cancel slow drift within the session, and prints a comparison.

Usage:
    python utils/bench_ab.py <rev> [<rev2> ...] [--reps 2] [--env K=V ...]

Each revision is materialized in a temporary `git worktree` (the working
tree itself is never touched), bench.py runs there with the same
interpreter and environment, and the JSON lines are aggregated.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(workdir: Path, env: dict) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=workdir, env=env,
        capture_output=True, text=True, check=True)
    # last line of stdout is the JSON
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("revs", nargs="+", help="git revisions to compare "
                    "against the working tree")
    ap.add_argument("--reps", type=int, default=2,
                    help="benchmark repetitions per variant (interleaved)")
    ap.add_argument("--env", action="append", default=[],
                    metavar="K=V", help="extra env vars for bench.py "
                    "(e.g. RSPNET_BENCH_SKIP_E2E=1)")
    args = ap.parse_args(argv)

    env = dict(os.environ)
    for kv in args.env:
        k, _, v = kv.partition("=")
        env[k] = v

    variants = {"WORKTREE": REPO}
    tmp = Path(tempfile.mkdtemp(prefix="bench_ab_"))
    try:
        for rev in args.revs:
            wt = tmp / rev.replace("/", "_")
            subprocess.run(["git", "worktree", "add", "--detach",
                            str(wt), rev], cwd=REPO, check=True,
                           capture_output=True)
            variants[rev] = wt

        results: dict = {name: [] for name in variants}
        for rep in range(args.reps):
            for name, path in variants.items():   # interleaved A/B/A/B
                r = run_bench(path, env)
                results[name].append(r)
                print(f"[rep {rep + 1}] {name}: {r['value']} {r['unit']}"
                      + (f"  e2e={r['e2e_clips_per_sec_per_chip']}"
                         if "e2e_clips_per_sec_per_chip" in r else ""),
                      file=sys.stderr)

        base = statistics.mean(r["value"] for r in results["WORKTREE"])
        summary = {}
        for name, rs in results.items():
            vals = [r["value"] for r in rs]
            summary[name] = {
                "mean": round(statistics.mean(vals), 2),
                "min": round(min(vals), 2),
                "max": round(max(vals), 2),
                "vs_worktree": round(statistics.mean(vals) / base, 4),
            }
            e2e = [r["e2e_clips_per_sec_per_chip"] for r in rs
                   if "e2e_clips_per_sec_per_chip" in r]
            if e2e:
                summary[name]["e2e_mean"] = round(statistics.mean(e2e), 2)
        print(json.dumps(summary, indent=2))
    finally:
        for rev in args.revs:
            wt = tmp / rev.replace("/", "_")
            subprocess.run(["git", "worktree", "remove", "--force", str(wt)],
                           cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
