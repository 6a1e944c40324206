"""CAM visualization of the pretext heads (reference: visualization.py:52-111,
moco/builder_diffspeed_diffloss.py:449-490).

For each (query, key) clip pair and each head (A-VID fc1, RSP fc2), a class
activation map is computed by projecting the *other* clip's pooled embedding
through both heads' weights onto the feature map:

  M_q = ((w_head_k @ gap(k_F)) @ w_head_q) . q_F   summed over channels

Maps are min-max normalized, JET-colormapped, and alpha-blended onto the
denormalized frames; results saved as PNG grids per sample.
"""
from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigTree
from ..moco import build_moco_model, diff_speed_gather
from ..ops.augment import _center_max_box, eval_preprocess
from .normalization import dataset_normalization
from .transfer import load_pretrained_encoder

logger = logging.getLogger(__name__)



def cam_maps(feat_q, feat_k, w_a_q, w_a_k, w_m_q, w_m_k):
    """feat_*: [B, T, H, W, C]; w_*: [dim, C]. Returns 4 maps [B, T, H, W]
    (reference einsum chain, builder:468-487)."""
    def gap(f):
        return jnp.mean(f, axis=(1, 2, 3))          # [B, C]

    def project(w_src, x_src, w_dst, f_dst):
        b_n = jnp.einsum("nc,bc->bn", w_src, x_src)     # [B, dim]
        b_c = jnp.einsum("bn,nc->bc", b_n, w_dst)       # [B, C]
        return jnp.einsum("bc,bthwc->bthw", b_c, f_dst)

    q_x, k_x = gap(feat_q), gap(feat_k)
    return (
        project(w_a_k, k_x, w_a_q, feat_q),   # Ms_qA
        project(w_m_k, k_x, w_m_q, feat_q),   # Ms_qM
        project(w_a_q, q_x, w_a_k, feat_k),   # Ms_kA
        project(w_m_q, q_x, w_m_k, feat_k),   # Ms_kM
    )


def cam_rgbmask(cam: np.ndarray, out_hw) -> np.ndarray:
    """[T, h, w] -> uint8 RGB heatmaps [T, H, W, 3] (JET, reference :52-60)."""
    import cv2
    t = cam.shape[0]
    lo, hi = cam.min(), cam.max()
    norm = (cam - lo) / max(hi - lo, 1e-12)
    out = np.empty((t, out_hw[0], out_hw[1], 3), np.uint8)
    for i in range(t):
        m = cv2.resize((norm[i] * 255).astype(np.uint8),
                       (out_hw[1], out_hw[0]))
        out[i] = cv2.applyColorMap(m, cv2.COLORMAP_JET)[..., ::-1]  # BGR->RGB
    return out


def mask_clip(clip: np.ndarray, mask_rgb: np.ndarray, mean: np.ndarray,
              std: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Blend heatmap onto denormalized clip [T, H, W, 3] float -> uint8
    (reference :62-74); mean/std are the SAME stats the loader normalized
    with (dataset.mean/std, identity under --debug)."""
    frames = np.clip(clip * std + mean, 0, 1)
    blend = (1 - alpha) * frames + alpha * (mask_rgb.astype(np.float32) / 255)
    return (np.clip(blend, 0, 1) * 255).astype(np.uint8)


class VisualizationEngine:
    def __init__(self, args, cfg: ConfigTree, build_loader_fn=None):
        self.args = args
        self.cfg = cfg
        self.debug = bool(getattr(args, "debug", False))
        # vid pipeline: dataset.mean/std from config, identity under --debug
        # (reference :152-162)
        self.normalize = dataset_normalization(cfg, vid_debug=self.debug)
        self._mean_np = np.array(self.normalize[0], np.float32)
        self._std_np = np.array(self.normalize[1], np.float32)
        # single-device by design: CAM rendering is a handful of batches
        # under plain jit (axis_name=None), no mesh involved

        self.model, self.moco_cfg = build_moco_model(cfg, axis_name=None)
        if self.moco_cfg.fc_type != "linear":
            raise NotImplementedError(
                "CAM visualization requires linear heads (reference "
                "_get_fc_weight indexes the linear layer)")
        self.arch = cfg.get_string("model.arch")
        self.size = cfg.get_int("spatial_transforms.size")
        self.clip_len = (cfg.get_int("temporal_transforms.size")
                         // (max(self.moco_cfg.diff_speed)
                             if self.moco_cfg.diff_speed else 1))

        if build_loader_fn is None:
            from ..data.pipeline import build_loader
            build_loader_fn = build_loader
        self.loader = build_loader_fn(cfg, "train", vid=True,
                                      debug=self.debug)

        rng = jax.random.PRNGKey(cfg.get_int("seed", 0))
        # deterministic per-batch speed pairing (seed-derived, so CAM output
        # is reproducible for a given checkpoint + seed)
        self._rng_speed = jax.random.fold_in(rng, 0x5eed)
        dummy = jnp.zeros((1, self.clip_len, self.size, self.size, 3))
        self.variables = self.model.init({"params": rng}, dummy, train=False)
        # key-encoder variables: default to the query encoder until a MoCo
        # checkpoint provides the real encoder_k (reference cam_visualize
        # uses encoder_k for the key side, builder:455-466)
        self.variables_k = self.variables

    def load_moco_checkpoint(self, path) -> None:
        from ..framework import load_state
        cp = load_state(path)
        m = cp.get("model") if isinstance(cp, dict) else None
        if isinstance(m, dict) and "params_q" in m:
            self.variables = {"params": m["params_q"],
                              "batch_stats": m["batch_stats_q"]}
            self.variables_k = {"params": m["params_k"],
                                "batch_stats": m["batch_stats_k"]}
        else:
            enc_params, enc_stats = load_pretrained_encoder(path, self.arch)
            params = dict(self.variables["params"])
            stats = dict(self.variables.get("batch_stats", {}))
            params["encoder"] = enc_params
            stats["encoder"] = enc_stats
            self.variables = {"params": params, "batch_stats": stats}
            self.variables_k = self.variables
        logger.info("Loaded checkpoint %s", path)

    @staticmethod
    def _head_weights_of(variables):
        p = variables["params"]
        w_a = np.asarray(p["fc1"]["linear"]["kernel"]).T  # [dim, C]
        w_m = np.asarray(p["fc2"]["linear"]["kernel"]).T
        return jnp.asarray(w_a), jnp.asarray(w_m)

    def visual_epoch(self, max_batches: int = 4) -> int:
        out_dir = Path(self.args.run_dir) / "cam"
        out_dir.mkdir(parents=True, exist_ok=True)
        w_a_q, w_m_q = self._head_weights_of(self.variables)
        w_a_k, w_m_k = self._head_weights_of(self.variables_k)

        @jax.jit
        def compute(variables_q, variables_k, clip_q, clip_k):
            feat_q = self.model.apply(variables_q, clip_q, train=False,
                                      method="features")
            # key side uses the MOMENTUM encoder, as the reference does
            feat_k = self.model.apply(variables_k, clip_k, train=False,
                                      method="features")
            return cam_maps(feat_q, feat_k, w_a_q, w_a_k, w_m_q,
                            w_m_k), (feat_q, feat_k)

        n_saved = 0
        mean, std = self.normalize
        it = iter(self.loader)
        try:
            n_saved = self._visual_loop(it, max_batches, out_dir, compute,
                                        mean, std)
        finally:
            # the max_batches/debug early breaks must not leave the
            # loader's worker pool suspended (fd/thread leak class, see
            # CLAUDE.md resource-leak findings)
            close = getattr(it, "close", None)
            if close is not None:
                close()
        logger.info("Saved %d CAM strips to %s", n_saved, out_dir)
        return n_saved

    def _visual_loop(self, it, max_batches, out_dir, compute, mean, std):
        n_saved = 0
        for bi, batch in enumerate(it):
            if bi >= max_batches:
                break
            # eval preprocessing at full loaded length, then dual-speed
            # pairing exactly like training (reference cam_visualize routes
            # clips through _diff_speed first, builder:458-461): half the
            # batch plays fast, half normal, q and k at MATCHED speeds.
            qs = batch["clips"][0]
            ks = batch["clips"][1]
            # center-max crop box: identity when the worker already resized
            # to S x S, a proper centered square crop when device_geometry
            # ships decode-resolution frames (a full-frame identity box
            # would squash 4:3 frames anisotropically — a geometry the
            # encoder never saw in training)
            i0, j0, bh, bw = _center_max_box(qs.shape[2], qs.shape[3], 1.0)
            boxes = np.array([[i0, j0, bh, bw]] * qs.shape[0], np.float32)
            clip_q = eval_preprocess(jnp.asarray(qs), boxes,
                                     size=(self.size, self.size),
                                     mean=mean, std=std)
            clip_k = eval_preprocess(jnp.asarray(ks), boxes,
                                     size=(self.size, self.size),
                                     mean=mean, std=std)
            if self.moco_cfg.diff_speed:
                rng_b = jax.random.fold_in(self._rng_speed, bi)
                clip_q, clip_k, _ = diff_speed_gather(
                    clip_q, clip_k, rng_b, self.moco_cfg)
            else:
                clip_q = clip_q[:, :self.clip_len]
                clip_k = clip_k[:, :self.clip_len]
            (ms_qa, ms_qm, ms_ka, ms_km), _ = compute(
                self.variables, self.variables_k, clip_q, clip_k)

            for b in range(qs.shape[0]):
                for name, cam, clip in (
                        ("qA", ms_qa, clip_q), ("qM", ms_qm, clip_q),
                        ("kA", ms_ka, clip_k), ("kM", ms_km, clip_k)):
                    cam_np = np.asarray(cam[b])
                    heat = cam_rgbmask(cam_np, (self.size, self.size))
                    blended = mask_clip(np.asarray(clip[b]), heat,
                                        self._mean_np, self._std_np)
                    self._save_strip(
                        out_dir / f"sample{bi}_{b}_{name}.png", blended)
                    n_saved += 1
            if self.debug:
                break
        return n_saved

    @staticmethod
    def _save_strip(path: Path, frames: np.ndarray) -> None:
        """Save [T, H, W, 3] as one horizontal strip PNG."""
        import cv2
        strip = np.concatenate(list(frames[:8]), axis=1)
        cv2.imwrite(str(path), strip[..., ::-1])
