"""Color math for video augmentation, in JAX.

Formulas follow the reference's jit-scripted torch ops exactly so augmented
pixels match bit-for-bit up to float assoc (reference: datasets/
transforms_video/functional_tensor.py: rgb_to_grayscale:88, _blend:103,
adjust_*:109-162, rgb_to_hsv/hsv_to_rgb:253-345, adjust_hue:375, gaussian
kernels:420-498).

Layout: clips are channel-last ``[..., H, W, 3]`` float32 in [0, 1] — the
TPU-native layout (lane dim = channels broadcast cheaply; torch used [C,T,H,W]).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# ITU-R 601-2 luma weights (reference: functional_tensor.py:98)
_LUMA = (0.2989, 0.5870, 0.1140)


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3] with r == g == b (luma)."""
    grey = (_LUMA[0] * img[..., 0] + _LUMA[1] * img[..., 1]
            + _LUMA[2] * img[..., 2])
    return jnp.broadcast_to(grey[..., None], img.shape).astype(img.dtype)


def _blend(img1: jnp.ndarray, img2: jnp.ndarray, ratio) -> jnp.ndarray:
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def adjust_brightness(img: jnp.ndarray, factor) -> jnp.ndarray:
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img: jnp.ndarray, factor) -> jnp.ndarray:
    # Mean over the whole clip's grayscale (reference: functional_tensor.py:143)
    mean = jnp.mean(rgb_to_grayscale(img))
    return _blend(img, mean, factor)


def adjust_saturation(img: jnp.ndarray, factor) -> jnp.ndarray:
    return _blend(img, rgb_to_grayscale(img), factor)


def rgb_to_hsv(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB in [0,1] -> [..., 3] HSV (h in [0,1))."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    # ELEMENTWISE maximum/minimum chains, not jnp.max/min(axis=-1): a
    # reduce over the minor (lane) dim of [..., 3] lowers to a standalone
    # reduce fusion on TPU (~2 ms each over a batch-128 clip) while the
    # maximum chain fuses into the surrounding elementwise pass for free.
    # Bitwise identical (max/min are exact, and the where-chain below ties
    # to the FIRST maximal channel exactly like jnp.argmax).
    maxc = jnp.maximum(r, jnp.maximum(g, b))
    minc = jnp.minimum(r, jnp.minimum(g, b))
    v = maxc
    deltac = maxc - minc
    safe_delta = jnp.where(deltac == 0, 1.0, deltac)
    s = jnp.where(v == 0, 0.0, deltac / jnp.where(v == 0, 1.0, v))

    # hue selection by argmax channel (matches the reference gather), via
    # PAIRWISE comparisons on the primary channels — NOT `g == maxc`.
    # Under jit, XLA duplicates producer expressions into multiple
    # consumer fusions with different FMA contraction, so the g that
    # feeds the comparison and the maxc it is compared against can
    # differ by 1 ulp: `g == maxc` then selects h_b while g is the true
    # max, a 2/6 hue jump (measured 0.76 abs output error in the fused
    # augment). The pairwise chain routes ties to the FIRST maximal
    # channel exactly like argmax, and every decision boundary is
    # continuous (at g == b: h_g == h_b == 3; at r == g: h_r == h_g == 1;
    # at r == b: both select 5/6), so duplicated-evaluation ulps can only
    # move the output by ulps.
    h_r = (g - b) / safe_delta
    h_g = (b - r) / safe_delta + 2.0
    h_b = (r - g) / safe_delta + 4.0
    r_is_max = (r >= g) & (r >= b)
    h = jnp.where(r_is_max, h_r, jnp.where(g >= b, h_g, h_b))
    h = jnp.where(deltac == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] HSV -> [..., 3] RGB (same vtpq table as the reference).

    The reference selects channels by gathering from a [3, 6] channel map
    (functional_tensor.py:295-299). Per-pixel gathers are poison on TPU:
    XLA materializes an element-index tensor whose minor dim tiles to 128
    lanes (42x memory; the [B*T*S*S, 3] indices alone OOMed the fused
    augment at batch 128). A branchless 6-way where-chain is the same
    selection as pure elementwise arithmetic and fuses into the pipeline.
    """
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    hi = jnp.floor(h * 6.0)
    f = h * 6.0 - hi
    p = v * (1.0 - s)
    t = v * (1.0 - (1.0 - f) * s)
    q = v * (1.0 - f * s)
    hi = hi.astype(jnp.int32) % 6

    def pick(cases):
        # cases[k] is the channel value when hi == k (vtpq columns of the
        # reference's channel map, rows below match cmap rows r/g/b)
        out = cases[5]
        for k in range(4, -1, -1):
            out = jnp.where(hi == k, cases[k], out)
        return out

    r = pick([v, q, p, p, t, v])
    g = pick([t, v, v, q, p, p])
    b = pick([p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img: jnp.ndarray, factor) -> jnp.ndarray:
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] + factor) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def gaussian_kernel1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(kernel_size, dtype=jnp.float32)
    g = jnp.exp(-((x - kernel_size // 2) ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def gaussian_kernel2d(kernel_size: Tuple[int, int],
                      sigma: Tuple[float, float]) -> jnp.ndarray:
    kx = gaussian_kernel1d(kernel_size[0], sigma[0])
    ky = gaussian_kernel1d(kernel_size[1], sigma[1])
    return kx[:, None] * ky[None, :]


@partial(jax.jit, static_argnames=("kernel_size", "sigma"))
def gaussian_blur(clip: jnp.ndarray, kernel_size: Tuple[int, int] = (3, 3),
                  sigma: Tuple[float, float] = (1.5, 1.5)) -> jnp.ndarray:
    """Depthwise gaussian blur over [T, H, W, C] (T rides the batch dim)."""
    t, h, w, c = clip.shape
    kernel = gaussian_kernel2d(kernel_size, sigma)
    kernel = jnp.broadcast_to(kernel[:, :, None, None],
                              (*kernel.shape, 1, c))  # HWIO, depthwise
    pad = ((kernel_size[0] - 1) // 2, (kernel_size[0] - 1) // 2)
    pad_w = ((kernel_size[1] - 1) // 2, (kernel_size[1] - 1) // 2)
    return jax.lax.conv_general_dilated(
        clip, kernel,
        window_strides=(1, 1),
        padding=(pad, pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def normalize(clip: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Channel-last normalize (reference uses torchvision NormalizeVideo)."""
    mean = jnp.asarray(mean, dtype=clip.dtype)
    std = jnp.asarray(std, dtype=clip.dtype)
    return (clip - mean) / std


def hflip(clip: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip of [..., H, W, C]."""
    return clip[..., :, ::-1, :]
