"""Supervised finetune engine (reference: finetune.py:149-472).

Train + per-epoch validation + final multi-crop validation, mesh-parallel.
Multi-crop clips arrive time-concatenated from the loader (EvenNCrop tiles
n_crop windows); the compiled step unfolds them into the batch axis and
averages logits (reference reshape_clip/average_logits, finetune.py:44-61).
"""
from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigTree
from ..framework import CheckpointManager, MeterGroup, MetricSpool, load_state
from ..framework.lr_schedule import build_optimizer, build_scheduler, set_opt_lr
from ..models import get_model_class
from ..moco import MultiTaskWrapper
from ..ops.augment import augment_batch, eval_preprocess, center_crop_params, \
    sample_train_params
from ..parallel import (mesh_for_args,
                        replicate_to_mesh, shard_batch)
from .classifier import (TrainState, init_train_state,
                         make_classifier_eval_step,
                         make_classifier_train_step, shard_classifier_step)
from .normalization import dataset_normalization
from .transfer import load_pretrained_encoder, merge_encoder_into

logger = logging.getLogger(__name__)


def build_classifier_model(cfg: ConfigTree, dtype=None, axis_name="data"):
    """model_type 1stream | multitask (reference: finetune.py:163-169)."""
    model_cfg = cfg.get_config("model").as_plain_dict()
    arch = model_cfg.pop("arch")
    num_classes = cfg.get_int("dataset.num_classes")
    model_type = cfg.get_string("model_type", "1stream")
    # pass model.* keys through like the reference's
    # get_model_class(**cfg.get_config('model'))
    factory = get_model_class(arch, **model_cfg)
    if model_type == "1stream":
        return factory(num_classes=num_classes, dtype=dtype,
                       axis_name=axis_name), model_type
    if model_type == "multitask":
        return MultiTaskWrapper(
            encoder_factory=factory, num_classes=num_classes, finetune=True,
            dtype=dtype, axis_name=axis_name), model_type
    raise ValueError(f'Unrecognized model_type "{model_type}"')


class FinetuneEngine:
    def __init__(self, args, cfg: ConfigTree, final_validate: bool = False,
                 build_loader_fn=None):
        self.args = args
        self.cfg = cfg
        self.debug = bool(getattr(args, "debug", False))
        self.final_validate = final_validate

        self.mesh = mesh_for_args(args)
        self.world_size = self.mesh.shape["data"]
        on_tpu = jax.devices()[0].platform == "tpu"
        self.model, self.model_type = build_classifier_model(
            cfg, dtype=jnp.bfloat16 if on_tpu else None, axis_name="data")
        self.arch = cfg.get_string("model.arch")
        self.only_train_fc = cfg.get_bool("only_train_fc", False)
        # precise-BN (reference: slowfast defaults.py:26-30) — number of
        # train batches used to replace EMA running stats with true batch
        # statistics before training starts. Load-bearing for linear probes
        # on low-BN-momentum backbones (s3dg m=0.001): see precise_bn.py.
        self.bn_recalibrate = cfg.get_int("bn_recalibrate", 0)

        self.learning_rate = cfg.get_float("optimizer.lr")
        self.num_epochs = cfg.get_int("num_epochs")
        self.optimizer = build_optimizer(cfg.get_config("optimizer"),
                                         self.learning_rate)
        self.scheduler = build_scheduler(
            cfg.get_string("optimizer.schedule", "none"), self.learning_rate,
            num_epochs=self.num_epochs,
            milestones=cfg.get_list("optimizer.milestones", []),
            patience=cfg.get_int("optimizer.patience", 10),
            # reference finetune cosine floors at lr/1000 (finetune.py:228)
            eta_min=self.learning_rate / 1000.0)

        if build_loader_fn is None:
            from ..data.pipeline import build_loader
            build_loader_fn = build_loader
        if not final_validate:
            self.train_loader = build_loader_fn(
                cfg, "train", debug=self.debug,
                batch_multiplier=self.world_size)
        self.validate_loader = build_loader_fn(
            cfg, "val", final_validate=final_validate,
            batch_multiplier=self.world_size)

        tt = cfg.get_config("temporal_transforms")
        self.n_crop = (tt.get_int("validate.final_n_crop") if final_validate
                       else tt.get_int("validate.n_crop", 1))
        self.clip_len = tt.get_int("size")
        self.size = cfg.get_int("spatial_transforms.size")

        self.state = init_train_state(
            self.model, self.optimizer,
            jax.random.PRNGKey(cfg.get_int("seed", 0)),
            (1, self.clip_len, self.size, self.size, 3))
        self.state = replicate_to_mesh(self.state, self.mesh)

        self.train_step = shard_classifier_step(
            make_classifier_train_step(
                self.model, self.optimizer, n_crop=1, axis_name="data",
                only_train_fc=self.only_train_fc),
            self.mesh)
        self.eval_step = shard_classifier_step(
            make_classifier_eval_step(self.model, n_crop=self.n_crop,
                                      axis_name="data"),
            self.mesh, is_eval=True)

        self.checkpoint_manager = CheckpointManager(args.experiment_dir,
                                                    keep_interval=None)
        self.log_interval = cfg.get_int("log_interval", 10)
        self.best_acc1 = 0.0
        self.current_epoch = 0
        self.rng = np.random.default_rng(
            cfg.get_int("seed", 0) + jax.process_index())  # per-host stream
        self.step_key = jax.random.PRNGKey(cfg.get_int("seed", 0) + 1)

        self.summary_writer = None
        if args.experiment_dir is not None and not final_validate:
            try:
                from tensorboardX import SummaryWriter
                self.summary_writer = SummaryWriter(
                    logdir=str(args.experiment_dir))
            except ImportError:
                pass

        st = cfg.get_config("spatial_transforms")
        self.aug = dict(
            gray_p=st.get_float("gray_scale", 0.0),
            jitter=(st.get_float("color_jitter.brightness", 0.0),
                    st.get_float("color_jitter.contrast", 0.0),
                    st.get_float("color_jitter.saturation", 0.0),
                    st.get_float("color_jitter.hue", 0.0)),
            h_flip=st.get_float("h_flip", 0.5),
        )
        # classification pipeline: config-driven, debug does NOT disable
        # (reference :222-227)
        self.normalize = dataset_normalization(cfg)

    # -- device preprocessing -------------------------------------------------
    # With a device-geometry loader (pipeline.PipelineConfig.device_geometry)
    # clips arrive at decode resolution and the crop/center box is applied
    # on-device inside the fused program; host-geometry clips arrive
    # pre-cropped (identity boxes).
    def _device_train_augment(self, clip_u8: np.ndarray) -> jnp.ndarray:
        B, _, H, W, _ = clip_u8.shape
        dev_geom = getattr(self.train_loader.cfg, "device_geometry", False)
        p = sample_train_params(
            self.rng, B, [(H, W)],
            crop_area=self.train_loader.cfg.crop_area if dev_geom
            else (1.0, 1.0),
            h_flip=self.aug["h_flip"],
            gray_p=self.aug["gray_p"],
            jitter=self.aug["jitter"])
        if not dev_geom:
            p.boxes[:] = [0, 0, H, W]
        mean, std = self.normalize
        return augment_batch(jnp.asarray(clip_u8), p.boxes, p.flip, p.jitter,
                             p.order, p.gray, p.blur,
                             size=(self.size, self.size), mean=mean, std=std,
                             identity_geometry=not dev_geom
                             and (H, W) == (self.size, self.size))

    def _device_eval_preprocess(self, clip_u8: np.ndarray) -> jnp.ndarray:
        B, _, H, W, _ = clip_u8.shape
        p = center_crop_params(B, [(H, W)])
        if not getattr(self.validate_loader.cfg, "device_geometry", False):
            p.boxes[:] = [0, 0, H, W]
        mean, std = self.normalize
        return eval_preprocess(jnp.asarray(clip_u8), p.boxes,
                               size=(self.size, self.size), mean=mean,
                               std=std)

    # -- loading ---------------------------------------------------------------
    def load_moco_checkpoint(self, path) -> None:
        enc_params, enc_stats = load_pretrained_encoder(path, self.arch)
        s = jax.device_get(self.state)
        params, stats = merge_encoder_into(
            dict(s.params), dict(s.batch_stats), enc_params, enc_stats,
            self.model_type)
        self.state = replicate_to_mesh(
            self.state._replace(params=params, batch_stats=stats), self.mesh)

    def load_checkpoint(self, path) -> None:
        states = load_state(path)
        if states["arch"] != self.arch:
            raise ValueError(
                f'Checkpoint arch {states["arch"]!r} != {self.arch!r}')
        m = states["model"]
        self.state = self.state._replace(
            params=m["params"], batch_stats=m["batch_stats"],
            opt_state=states["optimizer"])
        self.scheduler.load_state_dict(states["scheduler"])
        self.current_epoch = int(states["epoch"])
        self.best_acc1 = float(states["best_acc1"])
        self.state = replicate_to_mesh(self.state, self.mesh)
        logger.info("Loaded checkpoint %s (epoch %d)", path,
                    self.current_epoch)

    def load_model_only(self, path) -> None:
        states = load_state(path)
        m = states["model"]
        self.state = replicate_to_mesh(
            self.state._replace(params=m["params"],
                                batch_stats=m["batch_stats"]), self.mesh)

    def recalibrate_bn(self) -> None:
        """Precise-BN pass over ``bn_recalibrate`` augmented train batches
        (engines/precise_bn.py). Called once on fresh runs, after any
        checkpoint/--mc load and before the first train epoch."""
        n = self.bn_recalibrate
        if not n or not jax.tree_util.tree_leaves(self.state.batch_stats):
            return
        from .precise_bn import recalibrate_batch_stats

        def batch_iter():
            count = 0
            epoch = 0
            while count < n:
                if len(self.train_loader) == 0:
                    # e.g. dataset smaller than the global batch under
                    # drop_last — would otherwise spin forever here
                    raise ValueError(
                        "bn_recalibrate: train loader yields no batches "
                        f"({self.train_loader.num_samples} samples < global "
                        "batch?)")
                self.train_loader.set_epoch(10_000 + epoch)
                epoch += 1
                it = iter(self.train_loader)
                try:
                    for b in it:
                        if count >= n:
                            break
                        clips = self._device_train_augment(b["clips"][0])
                        yield shard_batch(clips, self.mesh)
                        count += 1
                finally:
                    # un-exhausted loader generators suspend their worker
                    # pool until GC (round-2 leak findings) — close eagerly
                    if hasattr(it, "close"):
                        it.close()

        # deterministic calibration: pin the augment-param stream so every
        # run (and both probe arms) sees identical calibration batches,
        # then restore the training stream untouched
        saved_rng, self.rng = self.rng, np.random.default_rng(
            self.cfg.get_int("seed", 0) + 3)

        logger.info("Precise-BN: recalibrating batch_stats over %d batches",
                    n)
        t0 = time.perf_counter()
        s = self.state
        try:
            new_stats = recalibrate_batch_stats(
                self.model, self.mesh, s.params, s.batch_stats, batch_iter(),
                jax.random.PRNGKey(self.cfg.get_int("seed", 0) + 2))
        finally:
            self.rng = saved_rng
        self.state = s._replace(batch_stats=new_stats)
        logger.info("Precise-BN done in %.1fs", time.perf_counter() - t0)

    # -- epochs ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> MeterGroup:
        meters = MeterGroup(["loss", "acc1", "acc5"])
        self.train_loader.set_epoch(epoch)
        n_batches = len(self.train_loader)
        t0 = time.perf_counter()
        from ..data.pipeline import prefetch_iterator
        keys = ("loss", "acc1", "acc5")
        spool = MetricSpool()  # bulk chunked fetches of per-step metrics
        for i, batch in enumerate(prefetch_iterator(iter(self.train_loader))):
            clips = self._device_train_augment(batch["clips"][0])
            clips = shard_batch(clips, self.mesh)
            labels = shard_batch(jnp.asarray(batch["labels"]), self.mesh)
            self.step_key, sub = jax.random.split(self.step_key)
            self.state, metrics = self.train_step(self.state, clips, labels,
                                                  sub)
            # per-scalar device fetches cost a full tunnel round-trip each;
            # stack and fetch in bulk (log-late, like the reference)
            spool.append(jnp.stack([metrics[k] for k in keys]),
                         n=batch["labels"].shape[0])
            if i % self.log_interval == 0:
                vals = spool.last()
                logger.info("Train [%d/%d][%d/%d]\t%s", epoch,
                            self.num_epochs, i, n_batches,
                            "\t".join(f"{k}={v:.4f}"
                                      for k, v in zip(keys, vals)))
            if self.debug and i >= 2:
                break
        for row, n in spool.rows():
            meters.update(dict(zip(keys, row)), n=n)
        logger.info("Train epoch %d done in %.1fs", epoch,
                    time.perf_counter() - t0)
        if self.summary_writer is not None:
            for k in ("loss", "acc1", "acc5"):
                self.summary_writer.add_scalar(f"train/{k}", meters[k].avg,
                                               epoch)
            self.summary_writer.add_scalar("train/lr", self.scheduler.lr,
                                           epoch)
        return meters

    def validate_epoch(self, epoch: int, prefix: str = "val"):
        sum_keys = ("loss_sum", "correct1", "correct5", "count")
        self.validate_loader.set_epoch(epoch)
        t0 = time.perf_counter()
        spool = MetricSpool()
        from ..data.pipeline import prefetch_iterator
        for i, batch in enumerate(prefetch_iterator(
                iter(self.validate_loader))):
            clips = self._device_eval_preprocess(batch["clips"][0])
            clips = shard_batch(clips, self.mesh)
            labels = shard_batch(jnp.asarray(batch["labels"]), self.mesh)
            mask = shard_batch(jnp.asarray(batch["mask"]), self.mesh)
            sums = self.eval_step(self.state, clips, labels, mask)
            spool.append(jnp.stack([sums[k] for k in sum_keys]))
            if self.debug and i >= 2:
                break
        all_sums = np.sum([row for row, _ in spool.rows()], axis=0)
        totals = dict(zip(sum_keys, all_sums))
        count = max(totals["count"], 1.0)
        loss = totals["loss_sum"] / count
        acc1 = totals["correct1"] / count * 100.0
        acc5 = totals["correct5"] / count * 100.0
        logger.info("Validate epoch %d: loss=%.4f acc1=%.2f acc5=%.2f "
                    "(%d samples, %.1fs)", epoch, loss, acc1, acc5,
                    int(count), time.perf_counter() - t0)
        if self.summary_writer is not None:
            self.summary_writer.add_scalar(f"{prefix}/loss", loss, epoch)
            self.summary_writer.add_scalar(f"{prefix}/acc1", acc1, epoch)
            self.summary_writer.add_scalar(f"{prefix}/acc5", acc5, epoch)
        return {"loss": loss, "acc1": acc1, "acc5": acc5}

    def run(self):
        num_epochs = 1 if self.debug else self.num_epochs
        try:
            if self.current_epoch == 0:  # fresh run, not a --continue resume
                self.recalibrate_bn()
            for epoch in range(self.current_epoch + 1, num_epochs + 1):
                self.current_epoch = epoch
                train_meters = self.train_epoch(epoch)
                val = self.validate_epoch(epoch)
                # every scheduler accepts (and non-plateau ones ignore)
                # the metric, like pretrain's unconditional call
                lr = self.scheduler.step(val["loss"])
                self.state = self.state._replace(
                    opt_state=set_opt_lr(self.state.opt_state, lr))

                is_best = val["acc1"] > self.best_acc1
                self.best_acc1 = max(self.best_acc1, val["acc1"])
                self.save_checkpoint(epoch, is_best)
        finally:
            self.close()
        return self.best_acc1

    def close(self) -> None:
        """Release the TB event writer (its background thread + queue leak
        per engine otherwise — enough CLI runs in one process exhaust fds)."""
        if self.summary_writer is not None:
            self.summary_writer.close()
            self.summary_writer = None

    def save_checkpoint(self, epoch: int, is_best: bool) -> None:
        # no device_get here: the checkpoint layer fetches all leaves as one
        # batched transfer (per-leaf fetches cost a tunnel round trip each)
        s = self.state
        self.checkpoint_manager.save({
            "epoch": epoch,
            "arch": self.arch,
            "model": {"params": s.params, "batch_stats": s.batch_stats},
            "best_acc1": self.best_acc1,
            "optimizer": s.opt_state,
            "scheduler": self.scheduler.state_dict(),
        }, is_best, epoch)
