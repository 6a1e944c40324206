"""Fused, batched, on-device video augmentation.

The reference augments per clip in a Python loop on the main process
(reference: datasets/transforms_video/transforms_tensor.py:207-233, the
SequentialGPUCollateFn). Here the whole batch is one jitted program:

    uint8 [B, T, H, W, C] --crop+resize--> float [B, T, S, S, C]
        --color jitter/gray/(blur)--> --flip--> --normalize-->

Crop *parameters* are sampled host-side in numpy (replicating the reference's
Inception-style rejection sampling, transforms_spatial.py:42-100) because
they are data-dependent scalar work; all *pixel* math runs on device with
static shapes. Crop + bilinear resize collapse into one matmul-based
sampler (equivalent to crop -> F.interpolate(align_corners=False)), so the
variable-size crop never materializes — this keeps XLA shapes static, which
the TPU requires, rides the MXU, and saves one HBM round-trip.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import color

__all__ = ["AugmentParams", "sample_train_params", "center_crop_params",
           "augment_batch", "eval_preprocess"]


# ---------------------------------------------------------------------------
# Host-side parameter sampling
# ---------------------------------------------------------------------------

@dataclass
class AugmentParams:
    """Per-sample augmentation parameters (host numpy, shipped to device).

    boxes:   [B, 4] float32 (i, j, h, w) crop rectangles in source pixels
    flip:    [B] bool
    jitter:  [B, 4] float32 factors (brightness, contrast, saturation, hue);
             neutral = (1, 1, 1, 0)
    order:   [B, 4] int32 permutation of the four jitter ops
    gray:    [B] bool
    blur:    [B] bool
    """
    boxes: np.ndarray
    flip: np.ndarray
    jitter: np.ndarray
    order: np.ndarray
    gray: np.ndarray
    blur: np.ndarray


def _sample_crop_box(rng: np.random.Generator, height: int, width: int,
                     scale: Tuple[float, float],
                     ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
                     ) -> Tuple[int, int, int, int]:
    """Inception-style area/aspect crop (reference: transforms_spatial.py:53-83)."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            i = int(rng.integers(0, height - h + 1))
            j = int(rng.integers(0, width - w + 1))
            return i, j, h, w
    # Central fallback
    in_ratio = width / height
    if in_ratio < min(ratio):
        w = width
        h = int(round(w / min(ratio)))
    elif in_ratio > max(ratio):
        h = height
        w = int(round(h * max(ratio)))
    else:
        w, h = width, height
    return (height - h) // 2, (width - w) // 2, h, w


def _center_max_box(height: int, width: int, ratio: float = 1.0
                    ) -> Tuple[int, int, int, int]:
    """Largest centered crop of the given aspect
    (reference: transforms_spatial.py:86-100)."""
    if width / height > ratio:
        h = height
        w = int(round(h * ratio))
    else:
        w = width
        h = int(round(w / ratio))
    return (height - h) // 2, (width - w) // 2, h, w


def sample_train_params(
    rng: np.random.Generator,
    batch_size: int,
    source_hw: Sequence[Tuple[int, int]],
    *,
    crop_area: Tuple[float, float] = (0.25, 1.0),
    h_flip: float = 0.5,
    gray_p: float = 0.0,
    jitter: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
    jitter_p: float = 1.0,
    blur_p: float = 0.0,
) -> AugmentParams:
    """Sample all per-clip augmentation randomness on the host.

    Distributions mirror the reference's transform stack:
    brightness/contrast/saturation ~ U[max(0,1-v), 1+v], hue ~ U[-v, v]
    (transforms_tensor.py:107-124), random op order (:126), gray with prob p,
    flip with prob h_flip, optional blur (aug_plus).
    """
    if len(source_hw) not in (1, batch_size):
        raise ValueError(
            f"source_hw must have 1 or batch_size ({batch_size}) entries, "
            f"got {len(source_hw)}")
    boxes = np.zeros((batch_size, 4), dtype=np.float32)
    if crop_area == (1.0, 1.0):
        # identity fast path: callers with pre-cropped inputs (the engines)
        # skip the per-sample rejection sampling entirely
        for b in range(batch_size):
            h, w = source_hw[b] if len(source_hw) > 1 else source_hw[0]
            boxes[b] = (0, 0, h, w)
    else:
        for b in range(batch_size):
            h, w = source_hw[b] if len(source_hw) > 1 else source_hw[0]
            boxes[b] = _sample_crop_box(rng, h, w, crop_area)

    flip = rng.random(batch_size) < h_flip
    gray = rng.random(batch_size) < gray_p
    blur = rng.random(batch_size) < blur_p

    jb, jc, js, jh = jitter
    factors = np.ones((batch_size, 4), dtype=np.float32)
    factors[:, 3] = 0.0
    apply_jitter = rng.random(batch_size) < jitter_p
    for b in range(batch_size):
        if not apply_jitter[b]:
            continue
        if jb > 0:
            factors[b, 0] = rng.uniform(max(0.0, 1.0 - jb), 1.0 + jb)
        if jc > 0:
            factors[b, 1] = rng.uniform(max(0.0, 1.0 - jc), 1.0 + jc)
        if js > 0:
            factors[b, 2] = rng.uniform(max(0.0, 1.0 - js), 1.0 + js)
        if jh > 0:
            factors[b, 3] = rng.uniform(-jh, jh)

    order = np.stack([rng.permutation(4) for _ in range(batch_size)]
                     ).astype(np.int32)
    return AugmentParams(boxes=boxes, flip=flip, jitter=factors, order=order,
                         gray=gray, blur=blur)


def center_crop_params(batch_size: int,
                       source_hw: Sequence[Tuple[int, int]],
                       ratio: float = 1.0) -> AugmentParams:
    """Deterministic eval params: center max crop, no color ops."""
    if len(source_hw) not in (1, batch_size):
        raise ValueError(
            f"source_hw must have 1 or batch_size ({batch_size}) entries, "
            f"got {len(source_hw)}")
    boxes = np.zeros((batch_size, 4), dtype=np.float32)
    for b in range(batch_size):
        h, w = source_hw[b] if len(source_hw) > 1 else source_hw[0]
        boxes[b] = _center_max_box(h, w, ratio)
    factors = np.ones((batch_size, 4), dtype=np.float32)
    factors[:, 3] = 0.0
    return AugmentParams(
        boxes=boxes,
        flip=np.zeros(batch_size, dtype=bool),
        jitter=factors,
        order=np.tile(np.arange(4, dtype=np.int32), (batch_size, 1)),
        gray=np.zeros(batch_size, dtype=bool),
        blur=np.zeros(batch_size, dtype=bool),
    )


# ---------------------------------------------------------------------------
# Device-side fused pipeline
# ---------------------------------------------------------------------------

def _interp_weights(coords: jnp.ndarray, n: int) -> jnp.ndarray:
    """[S] fractional source coords -> [S, n] bilinear weight rows.

    Row s holds max(0, 1 - |coords[s] - k|) over source positions k: the
    two-neighbor bilinear kernel (one neighbor with weight 1 when the coord
    is integral). Rows always sum to 1 for coords inside [0, n-1].
    """
    grid = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - grid[None, :]))


def crop_resize(clip: jnp.ndarray, box: jnp.ndarray, size: Tuple[int, int]
                ) -> jnp.ndarray:
    """Crop (i,j,h,w) then bilinear-resize to `size`, as two matmuls.

    Equivalent to clip[..., i:i+h, j:j+w, :] followed by
    F.interpolate(mode='bilinear', align_corners=False): output pixel centers
    map to source coords i + (y+0.5)*h/S - 0.5 (half-pixel convention),
    clamped inside the crop (edge behavior of resizing the cropped tensor).

    The interpolation is applied as dense [S, H]/[S, W] weight matrices
    contracted on the MXU rather than gathers: under vmap, XLA fused the
    per-axis gathers into ONE element-level gather whose [B*T*S*S, 3] index
    tensor tiles to 128 lanes on TPU — 42x memory blowup, OOM at batch 128
    (19.7 GB for the indices alone). Two matmuls use no index tensors at
    all and ride the systolic array. clip: [T, H, W, C] float32.
    Returns [T, S_h, S_w, C].
    """
    t, H, W, c = clip.shape
    out_h, out_w = size
    i, j, h, w = box[0], box[1], box[2], box[3]

    ys = i + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * h / out_h - 0.5
    xs = j + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * w / out_w - 0.5
    ys = jnp.clip(ys, i, i + h - 1.0)
    xs = jnp.clip(xs, j, j + w - 1.0)

    my = _interp_weights(ys, H)                  # [S_h, H]
    mx = _interp_weights(xs, W)                  # [S_w, W]
    x = jnp.einsum("sh,thwc->tswc", my, clip)    # rows:    [T, S_h, W, C]
    return jnp.einsum("rw,tswc->tsrc", mx, x)    # columns: [T, S_h, S_w, C]


def _apply_jitter(clip: jnp.ndarray, factors: jnp.ndarray,
                  order: jnp.ndarray) -> jnp.ndarray:
    """Apply brightness/contrast/saturation/hue in the given order."""
    branches = [
        lambda c: color.adjust_brightness(c, factors[0]),
        lambda c: color.adjust_contrast(c, factors[1]),
        lambda c: color.adjust_saturation(c, factors[2]),
        lambda c: color.adjust_hue(c, factors[3]),
    ]

    def step(k, c):
        return jax.lax.switch(order[k], branches, c)

    return jax.lax.fori_loop(0, 4, step, clip)


def _augment_one(clip: jnp.ndarray, box, flip, jitter, order, gray, blur,
                 *, size, mean, std, gray_before_jitter, use_blur,
                 identity_geometry=False):
    """[T, H, W, C] uint8 -> [T, S, S, C] float32 normalized."""
    x = clip.astype(jnp.float32) / 255.0
    if not identity_geometry:
        x = crop_resize(x, box, size)

    def do_gray(c):
        return jnp.where(gray, color.rgb_to_grayscale(c), c)

    if gray_before_jitter:
        x = do_gray(x)
        x = _apply_jitter(x, jitter, order)
    else:
        x = _apply_jitter(x, jitter, order)
        x = do_gray(x)

    if use_blur:
        x = jnp.where(blur, color.gaussian_blur(x), x)

    x = jnp.where(flip, color.hflip(x), x)
    return color.normalize(x, mean, std)


@partial(jax.jit, static_argnames=("size", "mean", "std",
                                   "gray_before_jitter", "use_blur",
                                   "identity_geometry"))
def augment_batch(batch: jnp.ndarray, boxes, flip, jitter, order, gray, blur,
                  *, size: Tuple[int, int],
                  mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
                  std: Tuple[float, ...] = (0.229, 0.224, 0.225),
                  gray_before_jitter: bool = True,
                  use_blur: bool = False,
                  identity_geometry: bool = False) -> jnp.ndarray:
    """Vectorized train augmentation.

    batch: uint8 [B, T, H, W, C]; returns float32 [B, T, S, S, C].
    `gray_before_jitter=True` matches the standard MoCo/finetune stacks
    (reference: datasets/classification/__init__.py:186-199, 243-254);
    False + use_blur matches aug_plus (:201-216). `identity_geometry=True`
    statically skips crop_resize when the host already cropped+resized to
    `size` — boxes are runtime values, so XLA cannot elide the identity
    resample itself (two full-batch interpolation contractions saved per
    clip in the hot loop).
    """
    if identity_geometry:
        assert batch.shape[2:4] == tuple(size), (batch.shape, size)
    fn = partial(_augment_one, size=size, mean=mean, std=std,
                 gray_before_jitter=gray_before_jitter, use_blur=use_blur,
                 identity_geometry=identity_geometry)
    return jax.vmap(fn)(batch, boxes, flip, jitter, order, gray, blur)


@partial(jax.jit, static_argnames=("size", "mean", "std"))
def eval_preprocess(batch: jnp.ndarray, boxes,
                    *, size: Tuple[int, int],
                    mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
                    std: Tuple[float, ...] = (0.229, 0.224, 0.225)
                    ) -> jnp.ndarray:
    """Center-crop + resize + normalize (validation path)."""

    def one(clip, box):
        x = clip.astype(jnp.float32) / 255.0
        x = crop_resize(x, box, size)
        return color.normalize(x, mean, std)

    return jax.vmap(one)(batch, boxes)
