"""Real multi-process data sharding test: two jax.distributed CPU processes
each load their half of the global batch and assemble global arrays
(the TPU-native replacement for the reference's DistributedSampler +
per-rank DataLoader, datasets/classification/__init__.py:130,139-147).
"""
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import os, sys
pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, sys.argv[4])
from rspnet_tpu.parallel import (create_mesh, shard_batch, fetch_global,
                                 replicate_to_mesh)
from rspnet_tpu.data.pipeline import PipelineConfig, VideoDataLoader
from rspnet_tpu.data.catalogs import Synthetic
from rspnet_tpu.framework.checkpoint import CheckpointManager

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()
mesh = create_mesh(2)

cat = Synthetic(num_samples=8, num_classes=3, num_frames=16,
                height=32, width=32)
def make_cfg(pi, pc):
    return PipelineConfig(clip_len=4, out_size=16, num_clips=1, batch_size=4,
                          train=True, num_workers=1, seed=0,
                          process_index=pi, process_count=pc)

loader = VideoDataLoader(cat, make_cfg(jax.process_index(),
                                       jax.process_count()))
batch = next(iter(loader))
assert batch["labels"].shape == (2,), batch["labels"].shape  # local half

# global assembly from process-local shards
labels = shard_batch(jnp.asarray(batch["labels"]), mesh)
clips = shard_batch(jnp.asarray(batch["clips"][0], jnp.float32), mesh)
assert labels.shape == (4,), labels.shape
assert clips.shape == (4, 4, 16, 16, 3), clips.shape

# the assembled global batch must equal what a single-host loader builds
ref = next(iter(VideoDataLoader(cat, make_cfg(0, 1))))
np.testing.assert_array_equal(fetch_global(labels, mesh), ref["labels"])
np.testing.assert_array_equal(fetch_global(clips, mesh),
                              ref["clips"][0].astype(np.float32))

# a compiled cross-process reduction sees every sample exactly once
state = replicate_to_mesh({"w": jnp.float32(2.0)}, mesh)
with mesh:
    total = jax.jit(lambda s, x: s["w"] * jnp.sum(x))(state, labels)
assert float(total) == 2.0 * float(ref["labels"].sum()), float(total)

# rank-0-only checkpoint writer
cm = CheckpointManager(out_dir)
cm.save({"epoch": 1, "arch": "t", "model": {"x": np.zeros(2)}},
        is_best=False, epoch=1)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("ckpt")
n_ckpt = len([p for p in os.listdir(out_dir) if p.endswith(".pth.tar")])
assert n_ckpt == 1, os.listdir(out_dir)

print(f"MULTIHOST OK p{pid}")
"""


def test_two_process_data_sharding(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(pid), str(port),
             str(tmp_path), str(REPO)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST OK p{pid}" in out
