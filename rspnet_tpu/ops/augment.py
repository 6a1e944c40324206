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


def crop_resize(clip: jnp.ndarray, box: jnp.ndarray, size: Tuple[int, int],
                flip=None) -> jnp.ndarray:
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
    if flip is not None:
        # Horizontal flip folded into the column-interp matrix: reversing
        # the ROWS of mx computes output column r with exactly the weight
        # row the unflipped resample uses for column S_w-1-r — the same
        # multiplies and adds, reordered across output elements, i.e.
        # bitwise hflip(crop_resize(...)). A bare lax.rev of the full
        # [B, T, S, S, C] output measured 3.3 ms/batch-128 (plus a ~3 ms
        # select pass) on v5e — reversing the tiny [S_w, W] matrix under a
        # per-sample where is free. Color jitter is per-pixel so applying
        # flip before it is exact up to the contrast mean's f32 reduction
        # order over the permuted tensor (same multiset of values).
        mx = jnp.where(flip, mx[::-1, :], mx)
    x = jnp.einsum("sh,thwc->tswc", my, clip)    # rows:    [T, S_h, W, C]
    return jnp.einsum("rw,tswc->tsrc", mx, x)    # columns: [T, S_h, S_w, C]


def _apply_jitter_hsplit(clip: jnp.ndarray, factors: jnp.ndarray,
                         order: jnp.ndarray) -> jnp.ndarray:
    """Apply brightness/contrast/saturation/hue in the given order.

    Hue-split formulation (RSPNET_JITTER=hsplit, the DEFAULT — it beat
    the contrast-split rewrite 33.0 vs 66.2 ms/clip-batch in the
    2026-08-21 chip A/B; see _apply_jitter_csplit's status note).
    NOT a loop of switches: under vmap,
    a per-sample `order` makes every switch compute ALL four branches and
    select — hue's HSV round-trip (the expensive op) ran 4x, and the
    fori_loop carrier materialized in HBM each iteration (measured
    45 ms/batch-128; statically unrolling the switches was WORSE, 57 ms —
    16 branch evaluations either way).

    Instead, exploit that `order` is a permutation so hue appears exactly
    once: run (blend ops before hue) -> hue ONCE -> (blend ops after hue).
    The three blend ops share one functional form
        x <- clip(f*x + (1-f)*c),  c in {0 (brightness), mean(gray)
        (contrast), gray (saturation)},
    so a "slot" needs no branches at all — select the per-sample factor f
    and blend target c and evaluate one fused elementwise pass (plus the
    gray/mean computed from the CURRENT x, preserving the reference's
    state-dependent contrast mean). Six slots x (<=2 HBM passes) + one hue
    beats 16 branch evaluations ~3x. Per-sample op sequence is unchanged,
    and each active slot evaluates the exact same float expressions as the
    reference formulas => bit-identical output; inactive slots pass x
    through untouched (jnp.where), adding no extra clips.

    Remaining cost this formulation cannot shed: every slot computes
    ``mean = jnp.mean(grey)`` — a full reduce over the current tensor —
    because ANY slot might be the contrast op for SOME sample. Each reduce
    is a fusion barrier, so the six slots lower to ~6 materialized
    elementwise passes plus 6 reduce reads (~2 HBM round-trips per slot).
    """
    # hue position and the 3 non-hue ops in their original relative order
    (pos,) = jnp.nonzero(order != 3, size=3)
    blend_ops = order[pos]                     # [3] values in {0, 1, 2}
    pre_count = jnp.argmax(order == 3)         # ops before hue = hue's index

    def blend_slot(x, op, active):
        # ARITHMETIC gating, no tensor-valued selects: the slot is one fused
        # multiply-add-clamp HBM pass plus the mean's read pass. A per-op
        # profile of the where/select formulation showed each full-tensor
        # select_n and each broadcast of the scalar blend target
        # materializing as its OWN ~1ms pass (6 bare broadcast_in_dim
        # fusions + 3 copy_select fusions ~ 14 ms/batch-128).
        #   y = clip(cf*x + cg*gray + off)
        #   active brightness: cf=f, cg=0,   off=0        == clip(f*x + 0)
        #   active contrast:   cf=f, cg=0,   off=(1-f)*m  == clip(f*x+(1-f)m)
        #   active saturation: cf=f, cg=1-f, off=0        == clip(f*x+(1-f)g)
        #   inactive:          cf=1, cg=0,   off=0        == clip(x) == x
        # Bitwise-exact vs color._blend: x >= 0 throughout, so x*1 == x,
        # a + 0.0 == a, and clip to [0,1] of an in-range value is identity;
        # the +0.0*gray term adds to f*x BEFORE off, preserving the
        # reference's mul-mul-add order for the active ops.
        # single-channel grey: the mean over rgb_to_grayscale's [..., 3]
        # broadcast materialized the broadcast as its own full-tensor pass
        # (~1 ms x 6 slots measured); the mean over one channel is the
        # same value up to f32 reduction order (the 3 channels are
        # identical copies), and the broadcast in the blend term below
        # fuses into the elementwise pass.
        grey = (color._LUMA[0] * x[..., 0] + color._LUMA[1] * x[..., 1]
                + color._LUMA[2] * x[..., 2])
        g3 = grey[..., None]                   # broadcasts in the blend
        mean = jnp.mean(grey)                  # (contrast: functional:143)
        f = jnp.where(op == 0, factors[0],
                      jnp.where(op == 1, factors[1], factors[2]))
        is_con = op == 1
        is_sat = op == 2
        cf = jnp.where(active, f, 1.0)
        cg = jnp.where(active & is_sat, 1.0 - f, 0.0)
        off = jnp.where(active & is_con, (1.0 - f) * mean, 0.0)
        return jnp.clip(cf * x + cg * g3 + off, 0.0, 1.0)

    x = clip
    for j in range(3):
        x = blend_slot(x, blend_ops[j], j < pre_count)
    x = color.adjust_hue(x, factors[3])
    for j in range(3):
        x = blend_slot(x, blend_ops[j], j >= pre_count)
    return x


def _apply_jitter_csplit(clip: jnp.ndarray, factors: jnp.ndarray,
                         order: jnp.ndarray) -> jnp.ndarray:
    """Contrast-split jitter (RSPNET_JITTER=csplit).

    STATUS: measured dead end — kept opt-in; hsplit stays default. Chip
    A/B (2026-08-21, same session, b128): csplit 66.2 ms/clip-batch vs
    hsplit 33.0 (e2e_cached 539 vs 742 clips/s/chip). The reduce-barrier
    arithmetic below is real but the augment is NOT barrier-bound: hue's
    HSV round-trip is the dominant cost and this schedule *evaluates it
    at two masked sites* (both evaluated for every sample under vmap —
    a where-select, not a branch), doubling the VPU work and/or blowing
    up the fused loop bodies. Lesson paired with the pool "sep" variant:
    collapsing fusion barriers is only a win when the saved HBM passes
    outweigh the duplicated producer compute.

    Design (why it LOOKED right): the hue-split form above pays 6 full
    reduces (one ``jnp.mean`` per slot) because any slot might be
    contrast for some sample — each reduce is a fusion barrier, ~2 HBM
    round-trips per slot. But CONTRAST is the only op that needs the
    mean, and a permutation contains it exactly once; brightness,
    saturation AND hue are purely elementwise. So split the program at
    the contrast op instead:

        [<=2 b/s slots] -> hue site 1 -> [<=2 b/s slots]
            -> CONTRAST (the one mean reduce)
        [<=2 b/s slots] -> hue site 2 -> [<=2 b/s slots]

    Only two ops ({brightness, saturation}) ever occupy the b/s slots, and
    hue is before or after contrast, never both, so one masked hue site on
    each side covers every permutation (exactly one site is active per
    sample).

    Exactness: an active slot computes the identical float expression as
    the reference op (same mul-add-clip order, saturation's grey and
    contrast's mean taken from the CURRENT tensor), inactive slots are
    arithmetic identities (cf=1, cg=0: x*1 + 0*g == x for finite g, and
    clip of an in-range value is the identity), and the inactive hue site
    is a where-select. Pinned against the sequential oracle over all 24
    permutations (tests/test_ops_augment.py).
    """
    pb = jnp.argmax(order == 0)
    pc = jnp.argmax(order == 1)
    ps = jnp.argmax(order == 2)
    ph = jnp.argmax(order == 3)

    def luma(x):
        # single-channel grey (see hsplit notes: the [..., 3] broadcast of
        # rgb_to_grayscale materialized as its own pass; the one-channel
        # value broadcasts for free inside the fused blend)
        return (color._LUMA[0] * x[..., 0] + color._LUMA[1] * x[..., 1]
                + color._LUMA[2] * x[..., 2])

    def bs_slot(x, want_b, want_s):
        # brightness/saturation slot, arithmetic identity when inactive:
        #   brightness: clip(f*x + 0*g)   == clip(f*x + (1-f)*0)  (ref form)
        #   saturation: clip(f*x + (1-f)*g)
        f = jnp.where(want_b, factors[0], factors[2])
        active = want_b | want_s
        cf = jnp.where(active, f, 1.0)
        cg = jnp.where(want_s, 1.0 - f, 0.0)
        return jnp.clip(cf * x + cg * luma(x)[..., None], 0.0, 1.0)

    def segment(x, g):
        # the (<=2) b/s ops falling in quarter g, in their original order.
        # Quarters split by contrast then hue: 0 = pre-c/pre-h,
        # 1 = pre-c/post-h, 2 = post-c/pre-h, 3 = post-c/post-h.
        b_in = ((pb > pc).astype(jnp.int32) * 2
                + (pb > ph).astype(jnp.int32)) == g
        s_in = ((ps > pc).astype(jnp.int32) * 2
                + (ps > ph).astype(jnp.int32)) == g
        b_first = pb < ps
        x = bs_slot(x, b_in & (~s_in | b_first), s_in & (~b_in | ~b_first))
        x = bs_slot(x, b_in & s_in & ~b_first, b_in & s_in & b_first)
        return x

    def hue_site(x, active):
        return jnp.where(active, color.adjust_hue(x, factors[3]), x)

    x = segment(clip, 0)
    x = hue_site(x, ph < pc)
    x = segment(x, 1)
    # contrast: exactly once per permutation — the program's ONE reduce
    mean = jnp.mean(luma(x))
    x = jnp.clip(factors[1] * x + (1.0 - factors[1]) * mean, 0.0, 1.0)
    x = segment(x, 2)
    x = hue_site(x, ph > pc)
    x = segment(x, 3)
    return x


def _apply_jitter(clip: jnp.ndarray, factors: jnp.ndarray,
                  order: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on RSPNET_JITTER (hsplit default — won the 2026-08-21
    chip A/B 33.0 vs 66.2 ms; csplit kept as the measured dead end) —
    read at trace time, same pattern as RSPNET_POOL."""
    import os

    choice = os.environ.get("RSPNET_JITTER", "hsplit")
    if choice == "hsplit":
        return _apply_jitter_hsplit(clip, factors, order)
    if choice == "csplit":
        return _apply_jitter_csplit(clip, factors, order)
    raise ValueError(f"RSPNET_JITTER={choice!r}: expected csplit|hsplit")


def _augment_one(clip: jnp.ndarray, box, flip, jitter, order, gray, blur,
                 *, size, mean, std, gray_before_jitter, use_blur,
                 identity_geometry=False):
    """[T, H, W, C] uint8 -> [T, S, S, C] float32 normalized."""
    x = clip.astype(jnp.float32) / 255.0
    flip_in_geometry = not identity_geometry
    if flip_in_geometry:
        # flip rides the resize matmul (see crop_resize): per-pixel color
        # ops commute with it, so the late `where(flip, hflip(x), x)` —
        # a 3.3 ms bare reverse plus a full-tensor select on v5e — is
        # replaced by a row reorder of the [S, W] interp matrix.
        x = crop_resize(x, box, size, flip=flip)

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

    if not flip_in_geometry:
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
