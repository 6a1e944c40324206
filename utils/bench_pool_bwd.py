"""A/B: reduce_window max pool vs separable jnp.maximum pool, fwd + grad.

Why: jax lowers the reduce_window-max VJP to select_and_gather_add (a
packed double-width reduce-window; downcasts f32 on TPU) and S3D-G has a
stride-1 3x3x3 max pool in every inception block, so pool gradients are
a candidate for the measured bwd = 4x fwd gap (CLAUDE.md step breakdown).

Shapes = the actual S3D-G pool sites at b128, 16x112x112 inputs.
Timing: K in-order enqueues of one compiled program, one dependent
scalar fetch, minus fetch RTT (CLAUDE.md TIMING TRAP).

Usage: python utils/bench_pool_bwd.py [--batch 128] [--iters 10]
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
    ap.add_argument("--impls", type=str, default="",
                    help="comma list of xla,sep,rw-sep,pallas (default all)")
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rspnet_tpu.framework import enable_persistent_jit_cache
    enable_persistent_jit_cache()

    from rspnet_tpu.models.common import (_max_pool3d_separable, _pad3,
                                          _triple)

    B = args.batch
    # (name, input [T,H,W,C], kernel, stride, pad) — S3D-G pool sites
    SITES = [
        ("stem (1,3,3)s(1,2,2)@56c64", (8, 56, 56, 64), (1, 3, 3),
         (1, 2, 2), (0, 1, 1)),
        ("pre-inc (1,3,3)s(1,2,2)@28c192", (8, 28, 28, 192), (1, 3, 3),
         (1, 2, 2), (0, 1, 1)),
        ("inc3.branch3 3x3x3s1@14c480", (8, 14, 14, 480), (3, 3, 3),
         (1, 1, 1), (1, 1, 1)),
        ("pool3 3x3x3s2@14c480", (8, 14, 14, 480), (3, 3, 3),
         (2, 2, 2), (1, 1, 1)),
        ("inc4.branch3 3x3x3s1@7c512", (4, 7, 7, 512), (3, 3, 3),
         (1, 1, 1), (1, 1, 1)),
        ("inc5.branch3 3x3x3s1@4c832", (2, 4, 4, 832), (3, 3, 3),
         (1, 1, 1), (1, 1, 1)),
    ]

    from rspnet_tpu.parallel import time_enqueued

    def measure(fn, *a) -> float:
        # RTT calibrated on an unfetched output (refetching a fetched
        # jax.Array reads its host-side cache and returns ~0, which
        # would bias every result by +RTT/iters)
        return time_enqueued(fn, *a, iters=args.iters)

    from rspnet_tpu.models.common import (_make_max_pool3d_fm,
                                          _max_pool3d_separable_rw)
    from rspnet_tpu.ops.pallas_pool import (max_pool3d_pallas,
                                            pallas_pool_supported)
    pool_fm = _make_max_pool3d_fm()

    def pool_xla(x, k, s, p):
        return nn.max_pool(x, window_shape=_triple(k), strides=_triple(s),
                           padding=_pad3(p))

    def pool_sep(x, k, s, p):
        return _max_pool3d_separable(x, _triple(k), _triple(s), _triple(p))

    def pool_rw_sep(x, k, s, p):
        return _max_pool3d_separable_rw(x, _triple(k), _triple(s),
                                        _triple(p))

    def pool_pallas(x, k, s, p):
        return max_pool3d_pallas(x, _triple(k), _triple(s), _triple(p),
                                 jax.default_backend() == "cpu")

    impls = [("xla", pool_xla), ("sep", pool_sep), ("rw-sep", pool_rw_sep),
             ("pallas", pool_pallas),
             ("fm", lambda x, k, s, p: pool_fm(x, _triple(k), _triple(s),
                                               _triple(p)))]
    if args.impls:
        want = set(args.impls.split(","))
        impls = [iv for iv in impls if iv[0] in want]

    for name, ishape, k, s, p in SITES:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, *ishape),
                              jnp.bfloat16)
        for impl_name, impl in impls:
            if impl_name == "pallas" and not pallas_pool_supported(
                    (B, *ishape), _triple(k), _triple(s), _triple(p),
                    x.dtype):
                print(json.dumps({"site": name, "impl": impl_name,
                                  "skipped": "unsupported"}), flush=True)
                continue
            @jax.jit
            def fwd(x, _i=impl):
                return jnp.mean(_i(x, k, s, p)).astype(jnp.float32)

            @jax.jit
            def bwd(x, _i=impl):
                g = jax.grad(
                    lambda x: jnp.sum(_i(x, k, s, p).astype(jnp.float32)))(x)
                return jnp.mean(g).astype(jnp.float32)

            t_f = measure(fwd, x)
            t_b = measure(bwd, x)
            print(json.dumps({
                "site": name, "impl": impl_name,
                "fwd_ms": round(t_f * 1e3, 3),
                "grad_ms": round(t_b * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
