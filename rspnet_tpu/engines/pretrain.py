"""MoCo + RSP pretraining engine (reference: pretrain.py:33-260).

Single-process, mesh-parallel: one JAX process drives every local chip via
the 1-D data mesh (the reference forked one NCCL process per GPU,
pretrain.py:336). The hot loop:

  host loader (decode + geometry, uint8)
    -> device fused color augment (ops.augment)
    -> fused MoCo train step (moco.builder; EMA/gather/forwards/grads/queue)

Run-dir artifacts match the reference: checkpoint.pth.tar (epoch/arch/model/
best_loss/optimizer/scheduler), model_best hard link, TensorBoard scalars
train/{loss,loss_A,acc1_A,acc5_A,loss_A_n,acc1_A_n,acc5_A_n,loss_M,acc1_M,lr}.
"""
from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigTree
from ..framework import CheckpointManager, MeterGroup, MetricSpool, load_state
from ..framework.environment import scale_learning_rate
from ..framework.lr_schedule import build_optimizer, build_scheduler, set_opt_lr
from ..moco import (MoCoState, build_moco_model, gather_queue_2d,
                    init_moco_state, make_sharded_eval_step,
                    make_sharded_eval_step_2d, make_sharded_train_step,
                    make_sharded_train_step_2d, shard_moco_state_2d)
from ..ops.augment import augment_batch, sample_train_params
from .normalization import dataset_normalization
from ..parallel import (fetch_scalar, mesh_for_config,
                        replicate_to_mesh, shard_batch)
from ..utils.moco import replace_moco_k_in_config

logger = logging.getLogger(__name__)

_METER_KEYS = ["loss", "loss_A", "loss_M", "acc1_A", "acc5_A",
               "acc1_A_n", "acc5_A_n", "acc1_M"]


class PretrainEngine:
    def __init__(self, args, cfg: ConfigTree, build_loader_fn=None):
        self.args = args
        self.cfg = cfg
        self.debug = bool(getattr(args, "debug", False))

        # config `parallel: {data: D, model: M}` selects the 2-D data x
        # model layout (K-sharded queue, moco/sharded_queue.py); default is
        # the 1-D data mesh
        self.mesh = mesh_for_config(cfg, args)
        self.model_parallel = dict(self.mesh.shape).get("model", 1)
        self.is_2d = self.model_parallel > 1
        self.batch_axes = ("data", "model") if self.is_2d else "data"
        self.world_size = self.mesh.devices.size
        logger.info("Mesh: %d device(s) on %s%s", self.world_size,
                    jax.devices()[0].platform,
                    f" (2-D {dict(self.mesh.shape)})" if self.is_2d else "")

        # global batch = per-replica batch * replicas (reference batch_size
        # is per-GPU; the batch shards over BOTH axes of a 2-D mesh)
        self.batch_size = cfg.get_int("batch_size")
        self.global_batch = self.batch_size * self.world_size
        replace_moco_k_in_config(cfg, self.global_batch,
                                 model_parallel=self.model_parallel)

        self.model, self.moco_cfg = build_moco_model(
            cfg, dtype=jnp.bfloat16 if self._on_tpu() else None,
            axis_name=self.batch_axes)
        self.arch = cfg.get_string("model.arch")

        # lr scaling (reference: framework/utils/environment.py:13-16)
        lr = cfg.get_float("optimizer.lr")
        if not getattr(args, "no_scale_lr", False):
            lr = scale_learning_rate(lr, self.world_size, self.batch_size)
            logger.info("Scaled lr: %f", lr)
        self.num_epochs = cfg.get_int("num_epochs")
        self.scheduler = build_scheduler(
            cfg.get_string("optimizer.schedule", "cosine"), lr,
            num_epochs=self.num_epochs,
            milestones=cfg.get_list("optimizer.milestones", []),
            patience=cfg.get_int("optimizer.patience", 10),
            # reference pretrain cosine floors at lr/1000 (pretrain.py:75-79)
            eta_min=lr / 1000.0)
        self.optimizer = build_optimizer(cfg.get_config("optimizer"), lr)

        # data
        if build_loader_fn is None:
            from ..data.pipeline import build_loader
            build_loader_fn = build_loader
        self.train_loader = build_loader_fn(cfg, "train", vid=True,
                                            debug=self.debug,
                                            batch_multiplier=self.world_size)

        self.t_load = cfg.get_int("temporal_transforms.size")
        self.size = cfg.get_int("spatial_transforms.size")
        from ..moco.builder import real_clip_len
        t_real = (real_clip_len(self.t_load, self.moco_cfg.diff_speed)
                  if self.moco_cfg.diff_speed else self.t_load)
        self.state: MoCoState = init_moco_state(
            self.model, self.moco_cfg, self.optimizer,
            jax.random.PRNGKey(cfg.get_int("seed", 0)),
            (1, t_real, self.size, self.size, 3))
        self.state = self._place_state(self.state)

        ds = tuple(self.moco_cfg.diff_speed or ())
        if len(ds) > 1:
            # exact multi-speed: the reference trains each step at
            # T_real = T//s for a per-step random speed (builder:431-434);
            # one compiled step per speed, host draws the speed. The draw
            # is seeded WITHOUT process_index: it must be mesh-uniform
            # (every host runs the same program for a given step).
            if self.is_2d:
                from ..moco.sharded_queue import \
                    make_variable_speed_train_steps_2d as make_speed_steps
            else:
                from ..moco.builder import \
                    make_variable_speed_train_steps as make_speed_steps
            self._speed_steps = make_speed_steps(
                self.model, self.optimizer, self.moco_cfg, self.mesh)
            self._speed_rng = np.random.default_rng(
                cfg.get_int("seed", 0) + 0x5BEE)
            self.train_step = self._variable_speed_step
        elif self.is_2d:
            self.train_step = make_sharded_train_step_2d(
                self.model, self.optimizer, self.moco_cfg, self.mesh)
        else:
            self.train_step = make_sharded_train_step(
                self.model, self.optimizer, self.moco_cfg, self.mesh)

        self.checkpoint_manager = CheckpointManager(
            args.experiment_dir,
            keep_interval=cfg.get_int("checkpoint_interval", None))
        self.meters = MeterGroup(_METER_KEYS)
        self.log_interval = cfg.get_int("log_interval", 10)
        self.best_loss = float("inf")
        self.current_epoch = 1
        self.rng = np.random.default_rng(
            cfg.get_int("seed", 0) + jax.process_index())  # per-host stream
        self.step_key = jax.random.PRNGKey(cfg.get_int("seed", 0) + 1)

        self.summary_writer = None
        if args.experiment_dir is not None:
            try:
                from tensorboardX import SummaryWriter
                self.summary_writer = SummaryWriter(
                    logdir=str(args.experiment_dir))
            except ImportError:
                logger.warning("tensorboardX unavailable; no TB logs")

        # augment settings (reference get_transform_vid hardcodes the MoCo
        # stack, datasets/classification/__init__.py:186-216)
        self.aug_plus = cfg.get_bool("moco.aug_plus", False)
        # dataset.mean/std from config; debug disables normalization in the
        # VID pipeline (reference :152-162)
        self.normalize = dataset_normalization(cfg, vid_debug=self.debug)

    def _draw_speed(self) -> int:
        ds = self.moco_cfg.diff_speed
        return int(ds[int(self._speed_rng.integers(len(ds)))])

    def _variable_speed_step(self, state, clip_q, clip_k, rng):
        return self._speed_steps[self._draw_speed()](state, clip_q, clip_k,
                                                     rng)

    @staticmethod
    def _on_tpu() -> bool:
        return jax.devices()[0].platform == "tpu"

    # -- mesh placement (1-D replicated vs 2-D K-sharded queue) ---------------
    def _place_state(self, state: MoCoState) -> MoCoState:
        if self.is_2d:
            return shard_moco_state_2d(state, self.mesh)
        return replicate_to_mesh(state, self.mesh)

    def _shard(self, batch):
        """Shard a host batch over the mesh's batch axes (both on 2-D)."""
        return shard_batch(batch, self.mesh, axis=self.batch_axes)

    # -- device-side augmentation of a uint8 batch ----------------------------
    # Host-geometry loaders pre-crop+resize to the network size (identity
    # boxes here); device-geometry loaders ship decode-res windows and the
    # crop box is sampled here with the VID crop_area (0.4, 1.0) and applied
    # inside the same fused program (reference crop semantics:
    # datasets/classification/__init__.py:174-178).
    def _augment_clip(self, clip_u8: np.ndarray) -> jnp.ndarray:
        B = clip_u8.shape[0]
        hw = [(clip_u8.shape[2], clip_u8.shape[3])]
        dev_geom = getattr(self.train_loader.cfg, "device_geometry", False)
        crop_area = self.train_loader.cfg.crop_area if dev_geom else (1.0, 1.0)
        if self.aug_plus:
            p = sample_train_params(
                self.rng, B, hw, crop_area=crop_area, h_flip=0.5,
                gray_p=0.2, jitter=(0.4, 0.4, 0.4, 0.1), jitter_p=0.8,
                blur_p=0.5)
            gray_first, use_blur = False, True
        else:
            p = sample_train_params(
                self.rng, B, hw, crop_area=crop_area, h_flip=0.5,
                gray_p=0.2, jitter=(0.4, 0.4, 0.4, 0.4))
            gray_first, use_blur = True, False
        if not dev_geom:
            # crop/resize already happened on host: identity boxes
            p.boxes[:] = [0, 0, clip_u8.shape[2], clip_u8.shape[3]]
        mean, std = self.normalize
        return augment_batch(
            jnp.asarray(clip_u8), p.boxes, p.flip, p.jitter, p.order,
            p.gray, p.blur, size=(self.size, self.size), mean=mean, std=std,
            gray_before_jitter=gray_first, use_blur=use_blur,
            identity_geometry=not dev_geom
            and (clip_u8.shape[2], clip_u8.shape[3])
            == (self.size, self.size))

    # -- epochs ---------------------------------------------------------------
    def train_epoch(self, epoch: int) -> None:
        self.meters.reset()
        self.train_loader.set_epoch(epoch)
        n_batches = len(self.train_loader)
        t_epoch = time.perf_counter()
        samples = 0
        # keep EVERY step's metrics as device scalars (no sync); bounded
        # chunked fetches give the exact full-epoch averages the reference
        # computes per-iteration (pretrain.py:169-195) without compiling a
        # whole-epoch stacked program
        spool = MetricSpool()

        import os
        timing = os.environ.get("RSPNET_TIMING")
        tprev = time.perf_counter()
        from ..data.pipeline import prefetch_iterator
        for i, batch in enumerate(prefetch_iterator(iter(self.train_loader))):
            if timing:
                t0 = time.perf_counter()
            clip_q = self._augment_clip(batch["clips"][0])
            clip_k = self._augment_clip(batch["clips"][1])
            clip_q = self._shard(clip_q)
            clip_k = self._shard(clip_k)
            if timing:
                # fetch_scalar, not block_until_ready: the axon tunnel's
                # block_until_ready returns before remote work finishes,
                # so it times dispatch, not execution (CLAUDE.md). The
                # fetch RTT (~30ms idle) is included in both samples.
                fetch_scalar(jnp.sum(clip_k))
                t1 = time.perf_counter()
            self.step_key, sub = jax.random.split(self.step_key)
            self.state, metrics = self.train_step(self.state, clip_q,
                                                  clip_k, sub)
            if timing:
                fetch_scalar(metrics["loss"])
                t2 = time.perf_counter()
                logger.info("timing[%d]: load=%.0fms augment=%.0fms "
                            "step=%.0fms", i, (t0 - tprev) * 1000,
                            (t1 - t0) * 1000, (t2 - t1) * 1000)
                tprev = t2
            # stack the step's metrics into ONE device array: per-scalar
            # fetches cost a full tunnel round-trip each (~1s on axon)
            spool.append(jnp.stack([metrics[k] for k in _METER_KEYS]))
            samples += batch["labels"].shape[0]

            if i % self.log_interval == 0:
                # the only mid-epoch device sync, like the reference's
                # log-late pattern (pretrain.py:177-185) — one transfer
                vals = spool.last()
                logger.info(
                    "Epoch %d [%d/%d] %s lr=%.5f", epoch, i, n_batches,
                    "\t".join(f"{k}={v:.4f}"
                              for k, v in zip(_METER_KEYS, vals)),
                    self.scheduler.lr)
            if self.debug and i >= 2:
                break

        # drain the spool (exact epoch averages; <= chunk-size transfers)
        for row, n in spool.rows():
            self.meters.update(dict(zip(_METER_KEYS, row)), n=n)

        jax.block_until_ready(self.state.step)
        dt = time.perf_counter() - t_epoch
        logger.info("Epoch %d done in %.1fs (%.1f clips/s)", epoch, dt,
                    samples / max(dt, 1e-9))
        if self.summary_writer is not None:
            self.summary_writer.add_scalar("train/clips_per_sec",
                                           samples / max(dt, 1e-9), epoch)

        if self.summary_writer is not None:
            for k in _METER_KEYS:
                self.summary_writer.add_scalar(
                    f"train/{k}", self.meters[k].avg, epoch)
            self.summary_writer.add_scalar("train/lr", self.scheduler.lr,
                                           epoch)

    def validate_epoch(self) -> dict:
        """One no-grad statistics epoch (reference: pretrain.py:300-304)."""
        if len(tuple(self.moco_cfg.diff_speed or ())) > 1:
            if self.is_2d:
                from ..moco.sharded_queue import \
                    make_variable_speed_eval_steps_2d as make_eval_steps
            else:
                from ..moco.builder import \
                    make_variable_speed_eval_steps as make_eval_steps
            steps = make_eval_steps(self.model, self.moco_cfg, self.mesh)

            def eval_step(state, q, k, rng):
                return steps[self._draw_speed()](state, q, k, rng)
        elif self.is_2d:
            eval_step = make_sharded_eval_step_2d(self.model, self.moco_cfg,
                                                  self.mesh)
        else:
            eval_step = make_sharded_eval_step(self.model, self.moco_cfg,
                                               self.mesh)
        meters = MeterGroup(_METER_KEYS)
        self.train_loader.set_epoch(self.current_epoch)
        spool = MetricSpool()
        from ..data.pipeline import prefetch_iterator
        for i, batch in enumerate(prefetch_iterator(iter(self.train_loader))):
            clip_q = self._shard(self._augment_clip(batch["clips"][0]))
            clip_k = self._shard(self._augment_clip(batch["clips"][1]))
            self.step_key, sub = jax.random.split(self.step_key)
            metrics = eval_step(self.state, clip_q, clip_k, sub)
            spool.append(jnp.stack([metrics[k] for k in _METER_KEYS]),
                         n=batch["labels"].shape[0])
            if self.debug and i >= 2:
                break
        for row, n in spool.rows():
            meters.update(dict(zip(_METER_KEYS, row)), n=n)
        logger.info("Validate statistics: %s", meters)
        return {k: meters[k].avg for k in _METER_KEYS}

    def profile_steps(self, n_steps: int = 5) -> str:
        """Capture a JAX profiler trace of a few training steps into the
        run dir (observability; the reference has none, SURVEY.md §5.1)."""
        trace_dir = str(self.args.run_dir / "profile")
        it = iter(self.train_loader)
        batch = next(it)
        clip_q = self._shard(self._augment_clip(batch["clips"][0]))
        clip_k = self._shard(self._augment_clip(batch["clips"][1]))
        # warmup/compile outside the trace; the barrier must be a dependent
        # VALUE FETCH — block_until_ready returns before remote execution
        # on the tunneled chip (CLAUDE.md TIMING TRAP), which would close
        # the trace before the steps run
        from ..parallel import fetch_scalar
        self.step_key, sub = jax.random.split(self.step_key)
        self.state, m = self.train_step(self.state, clip_q, clip_k, sub)
        fetch_scalar(m["loss"])
        with jax.profiler.trace(trace_dir):
            for _ in range(n_steps):
                self.step_key, sub = jax.random.split(self.step_key)
                self.state, m = self.train_step(self.state, clip_q, clip_k,
                                                sub)
            fetch_scalar(m["loss"])
        logger.info("Profiler trace written to %s", trace_dir)
        return trace_dir

    def run(self) -> None:
        num_epochs = 1 if self.debug else self.num_epochs
        try:
            for epoch in range(self.current_epoch, num_epochs + 1):
                self.current_epoch = epoch
                self.train_epoch(epoch)
                lr = self.scheduler.step(self.meters["loss"].avg)
                self.state = self.state._replace(
                    opt_state=set_opt_lr(self.state.opt_state, lr))

                loss_avg = self.meters["loss"].avg
                is_best = loss_avg < self.best_loss
                self.best_loss = min(self.best_loss, loss_avg)
                self.save_checkpoint(epoch, is_best)
        finally:
            self.close()

    def close(self) -> None:
        """Release the TB event writer (its background thread + queue leak
        per engine otherwise — enough CLI runs in one process exhaust fds)."""
        if self.summary_writer is not None:
            self.summary_writer.close()
            self.summary_writer = None

    # -- checkpointing --------------------------------------------------------
    def save_checkpoint(self, epoch: int, is_best: bool) -> None:
        # no device_get here: the checkpoint layer fetches all leaves as one
        # batched transfer (per-leaf fetches cost a tunnel round trip each)
        s = self.state
        if self.is_2d:
            # checkpoints store the reference's dense [dim, K] queue layout
            # (.pth.tar interop); gather the K-shards device-side first
            s = gather_queue_2d(s, self.mesh)
        state = {
            "epoch": epoch,
            "arch": self.arch,
            "model": {
                "params_q": s.params_q,
                "params_k": s.params_k,
                "batch_stats_q": s.batch_stats_q,
                "batch_stats_k": s.batch_stats_k,
                "queue": s.queue,
                "queue_ptr": s.queue_ptr,
            },
            "best_loss": self.best_loss,
            "optimizer": s.opt_state,
            "scheduler": self.scheduler.state_dict(),
        }
        self.checkpoint_manager.save(state, is_best, epoch)

    def load_checkpoint(self, path, model_only: bool = False) -> None:
        ckpt = load_state(path)
        if ckpt.get("arch") != self.arch:
            raise ValueError(
                f"Checkpoint arch {ckpt.get('arch')!r} != {self.arch!r}")
        m = ckpt["model"]
        self.state = self.state._replace(
            params_q=m["params_q"], params_k=m["params_k"],
            batch_stats_q=m["batch_stats_q"],
            batch_stats_k=m["batch_stats_k"],
            queue=jnp.asarray(m["queue"]),
            queue_ptr=jnp.asarray(m["queue_ptr"]).reshape(()).astype(jnp.int32))
        if not model_only:
            self.state = self.state._replace(opt_state=ckpt["optimizer"])
            self.scheduler.load_state_dict(ckpt["scheduler"])
            self.current_epoch = int(ckpt["epoch"]) + 1
            self.best_loss = float(ckpt.get("best_loss", float("inf")))
        # re-shards the dense checkpoint queue over K on a 2-D mesh
        self.state = self._place_state(self.state)
        logger.info("Loaded checkpoint from %s (epoch %s)", path,
                    ckpt.get("epoch"))
