"""Model-level fwd vs bwd A/B on the real chip: where does bwd = 4x fwd
come from?

The fetch-synced step breakdown (CLAUDE.md) shows S3D-G query fwd+bwd =
80 ms at b128 vs fwd 16 ms (bwd 4x fwd; typical TPU conv bwd is ~2x).
Per-conv microbenches (utils/bench_conv_bwd.py) show healthy per-conv
gradients, so the excess must come from model-level structure. This tool
times the full backbone forward and gradient under feature toggles:

  - gate on/off   (self-gating SE: global mean -> 1x1x1 -> sigmoid * x;
                   its bwd adds full-activation reduction passes)
  - BN train/eval (train-mode BN bwd needs batch-moment gradient chains)

Timing contract (CLAUDE.md TIMING TRAP): block_until_ready does not wait
on the tunneled chip, so we enqueue K calls of ONE compiled program (the
device executes programs in order) and end with a dependent scalar fetch
of the LAST call's output, minus the measured fetch RTT. No on-device
fori_loop: wrapping the model in a loop multiplied axon compile time past
usefulness; plain programs also land in the persistent jit cache so
killed runs make progress for the next attempt.

Usage: python utils/bench_model_bwd.py [--batch 128] [--iters 10]
         [--only gate_train|gate_eval|nogate_train|nogate_eval]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="run a single combo, e.g. gate_train")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rspnet_tpu.framework import enable_persistent_jit_cache
    enable_persistent_jit_cache()

    from rspnet_tpu.models.s3dg import S3DG

    B = args.batch
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 112, 112, 3),
                          jnp.float32)

    from rspnet_tpu.parallel import time_enqueued

    def measure(fn, *a) -> float:
        # RTT calibrated on an unfetched output inside time_enqueued
        # (refetching a fetched jax.Array reads its host-side cache and
        # returns ~0, which would bias every result by +RTT/iters)
        t0 = time.perf_counter()
        dt = time_enqueued(fn, *a, iters=args.iters)
        print(f"#   compiled+measured in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        return dt

    for gate in (True, False):
        model = S3DG(with_classifier=False, gate=gate,
                     dtype=jnp.bfloat16, axis_name=None)
        variables = model.init(jax.random.PRNGKey(0), x[:1], train=True)
        params, stats = variables["params"], variables["batch_stats"]

        def apply_fn(params, xi, train):
            out = model.apply({"params": params, "batch_stats": stats}, xi,
                              train=train,
                              mutable=["batch_stats"] if train else False)
            return out[0] if train else out

        for train in (True, False):
            name = f"{'gate' if gate else 'nogate'}_" \
                   f"{'train' if train else 'eval'}"
            if args.only and name != args.only:
                continue

            @jax.jit
            def fwd(params, x, _t=train):
                return jnp.mean(apply_fn(params, x, _t)).astype(jnp.float32)

            @jax.jit
            def bwd(params, x, _t=train):
                def loss(params, xi):
                    return jnp.sum(apply_fn(params, xi, _t)
                                   .astype(jnp.float32))
                g = jax.grad(loss)(params, x)
                # one scalar depending on every leaf (anti-DCE)
                return sum(jnp.mean(l).astype(jnp.float32)
                           for l in jax.tree_util.tree_leaves(g))

            t_f = measure(fwd, params, x)
            t_b = measure(bwd, params, x)
            print(json.dumps({
                "combo": name,
                "fwd_ms": round(t_f * 1e3, 2),
                "grad_ms": round(t_b * 1e3, 2),
                "grad_over_fwd": round(t_b / max(t_f, 1e-9), 2)}),
                flush=True)


if __name__ == "__main__":
    sys.exit(main())
