"""Microbenchmark: fwd vs bwd cost per S3D-G conv shape on the real chip.

Motivation: the fetch-synced step breakdown (CLAUDE.md) shows query
fwd+bwd = 4.1x fwd at b128 while a typical TPU conv bwd (dgrad + wgrad)
is ~2x fwd. This tool times each distinct conv shape in the S3D-G hot
path, forward and backward, to locate which gradients XLA lowers badly.

Timing contract (see CLAUDE.md TIMING TRAP): the axon tunnel's
block_until_ready does not wait for remote execution, so each
measurement chains K applications inside ONE jitted fori_loop (a
value-dependent chain XLA cannot reorder or elide) and ends with a
single dependent scalar fetch; the measured fetch RTT is subtracted.

Usage: python utils/bench_conv_bwd.py [--batch 128] [--iters 10]
Prints one JSON line per shape: fwd ms, grad ms (= fwd + dgrad + wgrad,
since jax.grad re-runs the forward), and the ratio — healthy is ~3x,
pathological lowering shows as >>3x.
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
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rspnet_tpu.framework import enable_persistent_jit_cache
    enable_persistent_jit_cache()

    B = args.batch
    dt = jnp.dtype(args.dtype)

    # (name, input [T,H,W,C], kernel (kt,kh,kw), stride, out_channels)
    # — the distinct conv geometries of the S3D-G forward at 16x112x112
    # (models/s3dg.py; T halves at the stem because stride=2 is 3-D).
    SHAPES = [
        ("stem_dn (1,7,7)s2 3->64@112", (16, 112, 112, 3), (1, 7, 7), 2, 64),
        ("stem_up (7,1,1) 64@56", (8, 56, 56, 64), (7, 1, 1), 1, 64),
        ("conv1x1 64@28", (8, 28, 28, 64), (1, 1, 1), 1, 64),
        ("sep2_dn (1,3,3) 64->192@28", (8, 28, 28, 64), (1, 3, 3), 1, 192),
        ("sep2_up (3,1,1) 192@28", (8, 28, 28, 192), (3, 1, 1), 1, 192),
        ("inc3_red 1x1 480->128@14", (8, 14, 14, 480), (1, 1, 1), 1, 128),
        ("inc3_dn (1,3,3) 128->192@14", (8, 14, 14, 128), (1, 3, 3), 1, 192),
        ("inc3_up (3,1,1) 192@14", (8, 14, 14, 192), (3, 1, 1), 1, 192),
        ("inc4_dn (1,3,3) 160->320@7", (4, 7, 7, 160), (1, 3, 3), 1, 320),
        ("inc4_up (3,1,1) 320@7", (4, 7, 7, 320), (3, 1, 1), 1, 320),
        ("inc5_red 1x1 832->384@4", (2, 4, 4, 832), (1, 1, 1), 1, 384),
        ("inc5_dn (1,3,3) 160->320@4", (2, 4, 4, 160), (1, 3, 3), 1, 320),
    ]

    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))

    def conv(x, w, stride):
        return jax.lax.conv_general_dilated(
            x, w, (stride,) * 3, "SAME", dimension_numbers=dn)

    from rspnet_tpu.parallel import time_enqueued

    def timed(fn, *a):
        """K chained applications inside one jit; dependent fetch; - RTT
        (time_enqueued calibrates RTT on an unfetched output — refetching
        a fetched jax.Array reads a host-side cache and returns ~0)."""
        return time_enqueued(fn, *a, iters=1) / args.iters

    results = []
    for name, ishape, k, stride, cout in SHAPES:
        cin = ishape[-1]
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, *ishape), dt)
        w = jax.random.normal(key, (*k, cin, cout), dt) * 0.01

        # NOTE: w must depend on the loop carry or XLA hoists the
        # (loop-invariant) conv out of the fori_loop and the loop times
        # nothing. Adding acc*1e-30 is numerically a no-op in bf16 but
        # defeats loop-invariant code motion.
        @jax.jit
        def fwd_loop(x, w, _s=stride):
            def body(i, acc):
                wi = w + (acc * 1e-30).astype(w.dtype)
                y = conv(x, wi, _s)
                return acc + jnp.mean(y).astype(jnp.float32)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        @jax.jit
        def bwd_loop(x, w, _s=stride):
            def loss(x, w):
                return jnp.sum(conv(x, w, _s).astype(jnp.float32))
            def body(i, acc):
                # BOTH operands must depend on the loop carry: dgrad
                # reads only w and wgrad reads only x (the sum-loss
                # cotangent is constant ones), so an invariant operand
                # lets XLA hoist that gradient out of the loop entirely
                # (verified on compiled HLO: wgrad was hoisted to ENTRY
                # when only w was perturbed).
                wi = w + (acc * 1e-30).astype(w.dtype)
                xi = x + (acc * 1e-30).astype(x.dtype)
                val, (gx, gw) = jax.value_and_grad(
                    loss, argnums=(0, 1))(xi, wi)
                # accumulate through the value and BOTH grads so nothing
                # is dead-code eliminated (bwd_ms = fwd + dgrad + wgrad)
                return (acc + val * 1e-30
                        + jnp.mean(gx).astype(jnp.float32)
                        + jnp.mean(gw).astype(jnp.float32))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        t_fwd = timed(fwd_loop, x, w)
        t_bwd = timed(bwd_loop, x, w)
        rec = {"shape": name, "fwd_ms": round(t_fwd * 1e3, 2),
               "bwd_ms": round(t_bwd * 1e3, 2),
               "bwd_over_fwd": round(t_bwd / max(t_fwd, 1e-9), 2)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    tot_f = sum(r["fwd_ms"] for r in results)
    tot_b = sum(r["bwd_ms"] for r in results)
    print(json.dumps({"shape": "TOTAL", "fwd_ms": round(tot_f, 2),
                      "bwd_ms": round(tot_b, 2),
                      "bwd_over_fwd": round(tot_b / max(tot_f, 1e-9), 2)}),
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
