"""Frozen-feature video retrieval (reference: retrieval.py:36-185).

Extract global-avg-pooled backbone features for train and test splits
(multi-crop averaged), save .npy, and compute R@{1,5,10,20,50} with cosine
distance: a test clip counts as a hit if any top-k nearest train clip shares
its label.
"""
from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigTree
from ..framework import load_state
from ..ops.augment import eval_preprocess
from ..parallel import (fetch_global, mesh_for_args,
                        replicate_to_mesh, shard_batch)
from .classifier import init_train_state
from .finetune import build_classifier_model
from .normalization import dataset_normalization
from .transfer import load_pretrained_encoder, merge_encoder_into

logger = logging.getLogger(__name__)

TOPK = (1, 5, 10, 20, 50)


class RetrievalEngine:
    def __init__(self, args, cfg: ConfigTree, build_loader_fn=None):
        self.args = args
        self.cfg = cfg
        self.debug = bool(getattr(args, "debug", False))
        self.mesh = mesh_for_args(args)
        self.world_size = self.mesh.shape["data"]
        # crop-box sampling for device_geometry train-split extraction
        self._crop_rng = np.random.default_rng(
            getattr(args, "seed", None) or 0)

        on_tpu = jax.devices()[0].platform == "tpu"
        self.model, self.model_type = build_classifier_model(
            cfg, dtype=jnp.bfloat16 if on_tpu else None, axis_name="data")
        self.arch = cfg.get_string("model.arch")

        if build_loader_fn is None:
            from ..data.pipeline import build_loader
            build_loader_fn = build_loader
        # retrieval uses force_n_crop EvenNCrop on both splits
        # (reference: config/retrieval/default.libsonnet temporal type clip)
        self.train_loader = build_loader_fn(
            cfg, "train", final_validate=True,
            batch_multiplier=self.world_size)
        self.test_loader = build_loader_fn(
            cfg, "val", final_validate=True,
            batch_multiplier=self.world_size)

        tt = cfg.get_config("temporal_transforms")
        self.n_crop = tt.get_int("validate.final_n_crop", 10)
        self.clip_len = tt.get_int("size")
        self.size = cfg.get_int("spatial_transforms.size")

        import optax
        self.state = init_train_state(
            self.model, optax.identity(),
            jax.random.PRNGKey(cfg.get_int("seed", 0)),
            (1, self.clip_len, self.size, self.size, 3))

        self._feature_fn = self._build_feature_fn()
        # classification pipeline: config-driven, debug does NOT disable
        # (reference :222-227)
        self.normalize = dataset_normalization(cfg)

    def _build_feature_fn(self):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_crop = self.n_crop
        model = self.model

        def feats(state, clips):
            B = clips.shape[0]
            x = clips
            if n_crop > 1:
                T = clips.shape[1] // n_crop
                x = clips.reshape((B * n_crop, T) + clips.shape[2:])
            fmap = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False, method="features")
            f = jnp.mean(fmap, axis=(1, 2, 3))      # AdaptiveAvgPool3d(1)
            if n_crop > 1:
                f = f.reshape(B, n_crop, -1).mean(axis=1)  # crop averaging
            return jax.lax.all_gather(f, "data", axis=0, tiled=True)

        sharded = shard_map(feats, mesh=self.mesh,
                            in_specs=(P(), P("data")), out_specs=P(),
                            check_vma=False)
        return jax.jit(sharded)

    def load_moco_checkpoint(self, path) -> None:
        enc_params, enc_stats = load_pretrained_encoder(path, self.arch)
        s = jax.device_get(self.state)
        params, stats = merge_encoder_into(
            dict(s.params), dict(s.batch_stats), enc_params, enc_stats,
            self.model_type)
        self.state = self.state._replace(params=params, batch_stats=stats)

    def load_model_checkpoint(self, path) -> None:
        states = load_state(path)
        m = states["model"]
        self.state = self.state._replace(params=m["params"],
                                         batch_stats=m["batch_stats"])

    def extract_features(self, loader, name: str):
        self.state = replicate_to_mesh(self.state, self.mesh)
        feats, labels = [], []
        t0 = time.perf_counter()
        mean, std = self.normalize
        it = iter(loader)
        try:
            self._extract_loop(it, loader, feats, labels, mean, std)
        finally:
            # a debug-mode early break must not leave the loader's
            # per-epoch worker pool suspended (fd/thread leak class, see
            # CLAUDE.md resource-leak findings)
            close = getattr(it, "close", None)
            if close is not None:
                close()
        feats = np.concatenate(feats)
        labels = np.concatenate(labels)
        logger.info("%s features: %s in %.1fs", name, feats.shape,
                    time.perf_counter() - t0)
        return feats, labels

    def _extract_loop(self, it, loader, feats, labels, mean, std):
        for i, batch in enumerate(it):
            clip_u8 = batch["clips"][0]
            B, _, H, W, _ = clip_u8.shape
            if getattr(loader.cfg, "device_geometry", False):
                # geometry moved on-device must keep the host path's crop
                # DISTRIBUTION: the train split samples random Inception
                # crops (reference get_transform('train'),
                # classification/__init__.py:231-239), eval the center
                # max crop. (Deliberate deviation kept from the
                # reference: no color jitter on extracted features in
                # either mode — frozen-feature retrieval.)
                if loader.cfg.train:
                    from ..ops.augment import _sample_crop_box
                    boxes = np.stack([np.asarray(
                        _sample_crop_box(self._crop_rng, H, W,
                                         loader.cfg.crop_area),
                        np.float32) for _ in range(B)])
                else:
                    from ..ops.augment import center_crop_params
                    boxes = center_crop_params(B, [(H, W)]).boxes
            else:
                boxes = np.array([[0, 0, H, W]] * B, np.float32)
            clips = eval_preprocess(
                jnp.asarray(clip_u8), boxes,
                size=(self.size, self.size), mean=mean, std=std)
            f = self._feature_fn(self.state, shard_batch(clips, self.mesh))
            # multi-host: every host needs the full feature matrix for the
            # cosine retrieval, so gather batch shards (and the loaders'
            # per-host label/mask slices) across processes
            f = fetch_global(f, self.mesh)
            m = fetch_global(batch["mask"], self.mesh)
            labels_g = fetch_global(batch["labels"], self.mesh)
            feats.append(f[m])
            labels.append(labels_g[m])
            if self.debug and i >= 2:
                break

    def save_features(self, out_dir: Path, feats, labels, split: str):
        """Reference artifact names (retrieval.py:133-141):
        {split}_fold{fold}_feats.npy / {split}_fold{fold}_labels.npy.
        The round-2 names ({split}_feature.npy / {split}_class.npy) are kept
        as aliases for tooling written against them."""
        out_dir = Path(out_dir)
        fold = self.cfg.get_int("dataset.fold", 1)
        np.save(out_dir / f"{split}_fold{fold}_feats.npy", feats)
        np.save(out_dir / f"{split}_fold{fold}_labels.npy", labels)
        np.save(out_dir / f"{split}_feature.npy", feats)
        np.save(out_dir / f"{split}_class.npy", labels)

    @staticmethod
    def topk_retrieval(train_feats, train_labels, test_feats, test_labels,
                       topk=TOPK) -> dict:
        """Cosine retrieval R@k (reference: retrieval.py:152-185)."""
        def norm(x):
            return x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

        sim = norm(test_feats) @ norm(train_feats).T   # [n_test, n_train]
        order = np.argsort(-sim, axis=1)
        ks = sorted(topk)
        results = {}
        hits = np.zeros(len(test_labels), bool)
        prev = 0
        for k in ks:
            newcols = train_labels[order[:, prev:k]]
            hits |= (newcols == test_labels[:, None]).any(axis=1)
            results[f"R@{k}"] = float(hits.mean() * 100.0)
            prev = k
        return results

    def run(self) -> dict:
        train_f, train_l = self.extract_features(self.train_loader, "train")
        test_f, test_l = self.extract_features(self.test_loader, "test")
        out_dir = Path(self.args.run_dir)
        self.save_features(out_dir, train_f, train_l, "train")
        self.save_features(out_dir, test_f, test_l, "test")
        results = self.topk_retrieval(train_f, train_l, test_f, test_l)
        with open(out_dir / "topk_correct.json", "w") as f:
            json.dump(results, f, indent=2)
        logger.info("Retrieval: %s", results)
        return results
