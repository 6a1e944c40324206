"""Fused Pallas color-augment kernel: correctness vs the f32 ops.color path
(interpret mode on CPU; the compiled path is exercised on real TPU in
bench/verification runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspnet_tpu.ops import color
from rspnet_tpu.ops.pallas_augment import (fused_color_augment,
                                           pallas_supported)


def _reference(batch, order, factors, flags, gray_first=True):
    outs = []
    for i in range(batch.shape[0]):
        x = jnp.asarray(batch[i].astype(np.float32) / 255.0)
        if gray_first and flags[i, 0]:
            x = color.rgb_to_grayscale(x)
        ops = [lambda c: color.adjust_brightness(c, factors[i, 0]),
               lambda c: color.adjust_contrast(c, factors[i, 1]),
               lambda c: color.adjust_saturation(c, factors[i, 2]),
               lambda c: color.adjust_hue(c, factors[i, 3])]
        for k in order[i]:
            x = ops[k](x)
        if not gray_first and flags[i, 0]:
            x = color.rgb_to_grayscale(x)
        if flags[i, 1]:
            x = color.hflip(x)
        outs.append(np.asarray(color.normalize(
            x, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))))
    return np.stack(outs)


def test_fused_kernel_matches_f32_path():
    rng = np.random.RandomState(0)
    B, T, S = 4, 4, 16
    batch = (rng.rand(B, T, S, S, 3) * 255).astype(np.uint8)
    order = np.stack([np.random.RandomState(i).permutation(4)
                      for i in range(B)]).astype(np.int32)
    factors = np.array([[1.2, 0.8, 1.3, 0.1],
                        [1.0, 1.0, 1.0, 0.0],
                        [0.7, 1.1, 0.9, -0.2],
                        [1.4, 0.6, 1.0, 0.4]], np.float32)
    flags = np.array([[0, 1], [1, 0], [0, 0], [1, 1]], np.int32)

    out = np.asarray(fused_color_augment(
        jnp.asarray(batch), jnp.asarray(order), jnp.asarray(factors),
        jnp.asarray(flags), interpret=True))
    ref = _reference(batch, order, factors, flags)
    # kernel computes in bf16: tolerance is bf16 rounding over the chain
    np.testing.assert_allclose(out, ref, atol=0.12)
    # and the bulk of pixels should be much closer than the worst case
    assert np.median(np.abs(out - ref)) < 0.02


def test_neutral_params_identity():
    rng = np.random.RandomState(1)
    batch = (rng.rand(2, 2, 8, 8, 3) * 255).astype(np.uint8)
    order = np.tile(np.arange(4, dtype=np.int32), (2, 1))
    factors = np.ones((2, 4), np.float32)
    factors[:, 3] = 0.0
    flags = np.zeros((2, 2), np.int32)
    out = np.asarray(fused_color_augment(
        jnp.asarray(batch), jnp.asarray(order), jnp.asarray(factors),
        jnp.asarray(flags), mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
        interpret=True))
    ref = batch.astype(np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=0.01)


def test_pallas_supported_budget():
    assert pallas_supported((8, 16, 112, 112, 3))
    assert not pallas_supported((8, 64, 224, 224, 3))  # 38MB clip > VMEM
