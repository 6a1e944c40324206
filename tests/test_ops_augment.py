"""Fused augmentation pipeline tests: crop+resize golden vs torch, parameter
distributions, end-to-end shapes."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rspnet_tpu.ops.augment import (
    AugmentParams, augment_batch, center_crop_params, crop_resize,
    eval_preprocess, sample_train_params,
)

RNG = np.random.RandomState(7)


def torch_crop_resize(clip_thwc, i, j, h, w, size):
    """Reference path: slice then F.interpolate(bilinear, align_corners=False)."""
    x = torch.from_numpy(clip_thwc).permute(0, 3, 1, 2)  # [T, C, H, W]
    x = x[:, :, i:i + h, j:j + w]
    y = torch.nn.functional.interpolate(x, size=size, mode="bilinear",
                                        align_corners=False)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("box,size", [
    ((0, 0, 32, 32), (16, 16)),
    ((5, 3, 20, 25), (16, 16)),
    ((2, 2, 28, 28), (32, 32)),   # upscale
    ((0, 0, 32, 16), (8, 8)),     # non-square crop to square
])
def test_crop_resize_matches_torch(box, size):
    clip = RNG.rand(3, 32, 32, 3).astype(np.float32)
    i, j, h, w = box
    ours = np.asarray(crop_resize(jnp.asarray(clip),
                                  jnp.asarray(box, dtype=jnp.float32), size))
    ref = torch_crop_resize(clip, i, j, h, w, size)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_crop_resize_identity():
    clip = RNG.rand(2, 16, 16, 3).astype(np.float32)
    out = crop_resize(jnp.asarray(clip),
                      jnp.asarray([0, 0, 16, 16], dtype=jnp.float32), (16, 16))
    np.testing.assert_allclose(np.asarray(out), clip, atol=1e-5)


def test_sample_train_params_distributions():
    rng = np.random.default_rng(0)
    p = sample_train_params(
        rng, 256, [(128, 160)], crop_area=(0.25, 1.0), h_flip=0.5,
        gray_p=0.2, jitter=(0.4, 0.4, 0.4, 0.4))
    assert p.boxes.shape == (256, 4)
    # crop areas within the configured range
    areas = p.boxes[:, 2] * p.boxes[:, 3] / (128 * 160)
    assert areas.min() >= 0.2 and areas.max() <= 1.01
    # boxes in bounds
    assert np.all(p.boxes[:, 0] >= 0) and np.all(p.boxes[:, 1] >= 0)
    assert np.all(p.boxes[:, 0] + p.boxes[:, 2] <= 128)
    assert np.all(p.boxes[:, 1] + p.boxes[:, 3] <= 160)
    # flip/gray rates in a plausible band
    assert 0.35 < p.flip.mean() < 0.65
    assert 0.08 < p.gray.mean() < 0.35
    # jitter factor ranges (b/c/s in [0.6, 1.4], hue in [-0.4, 0.4])
    assert p.jitter[:, :3].min() >= 0.6 - 1e-6
    assert p.jitter[:, :3].max() <= 1.4 + 1e-6
    assert np.abs(p.jitter[:, 3]).max() <= 0.4 + 1e-6
    # orders are permutations
    assert np.all(np.sort(p.order, axis=1) == np.arange(4))


def test_sample_disabled_jitter_is_neutral():
    rng = np.random.default_rng(0)
    p = sample_train_params(rng, 16, [(64, 64)], jitter=(0, 0, 0, 0),
                            h_flip=0.0, gray_p=0.0)
    np.testing.assert_array_equal(p.jitter[:, :3], 1.0)
    np.testing.assert_array_equal(p.jitter[:, 3], 0.0)
    assert not p.flip.any() and not p.gray.any()


def test_center_crop_params():
    p = center_crop_params(2, [(100, 80)])
    # max square centered crop of 100x80 -> 80x80 at i=10, j=0
    np.testing.assert_array_equal(p.boxes[0], [10, 0, 80, 80])


def test_augment_batch_end_to_end():
    rng = np.random.default_rng(1)
    batch = (RNG.rand(4, 8, 64, 48, 3) * 255).astype(np.uint8)
    p = sample_train_params(rng, 4, [(64, 48)], crop_area=(0.4, 1.0),
                            gray_p=0.5, jitter=(0.4, 0.4, 0.4, 0.4))
    out = augment_batch(jnp.asarray(batch), p.boxes, p.flip, p.jitter,
                        p.order, p.gray, p.blur, size=(32, 32))
    assert out.shape == (4, 8, 32, 32, 3)
    assert out.dtype == jnp.float32
    # normalized output: roughly zero-centered
    assert abs(float(jnp.mean(out))) < 2.0


def test_augment_neutral_params_is_pure_preprocess():
    """With neutral params, augment == crop/resize/normalize only."""
    batch = (RNG.rand(2, 4, 32, 32, 3) * 255).astype(np.uint8)
    p = center_crop_params(2, [(32, 32)])
    out = augment_batch(jnp.asarray(batch), p.boxes, p.flip, p.jitter,
                        p.order, p.gray, p.blur, size=(32, 32))
    ref = eval_preprocess(jnp.asarray(batch), p.boxes, size=(32, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gray_flag_produces_gray_frames():
    batch = (RNG.rand(1, 2, 16, 16, 3) * 255).astype(np.uint8)
    p = center_crop_params(1, [(16, 16)])
    p.gray[:] = True
    out = augment_batch(jnp.asarray(batch), p.boxes, p.flip, p.jitter,
                        p.order, p.gray, p.blur, size=(16, 16),
                        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
    out = np.asarray(out)
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-6)


def test_flip_flag():
    batch = (RNG.rand(1, 2, 16, 16, 3) * 255).astype(np.uint8)
    p = center_crop_params(1, [(16, 16)])
    p.flip[:] = True
    out = augment_batch(jnp.asarray(batch), p.boxes, p.flip, p.jitter,
                        p.order, p.gray, p.blur, size=(16, 16),
                        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
    ref = eval_preprocess(jnp.asarray(batch), p.boxes, size=(16, 16),
                          mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref)[:, :, :, ::-1, :], atol=1e-5)


def test_blur_path_runs():
    batch = (RNG.rand(2, 2, 16, 16, 3) * 255).astype(np.uint8)
    p = center_crop_params(2, [(16, 16)])
    p.blur[0] = True
    out = augment_batch(jnp.asarray(batch), p.boxes, p.flip, p.jitter,
                        p.order, p.gray, p.blur, size=(16, 16),
                        gray_before_jitter=False, use_blur=True)
    assert out.shape == (2, 2, 16, 16, 3)
    # blurred sample differs from unblurred processing of same pixels
    ref = eval_preprocess(jnp.asarray(batch), p.boxes, size=(16, 16))
    assert not np.allclose(np.asarray(out)[0], np.asarray(ref)[0])
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(ref)[1], atol=1e-5)


def test_augment_compiles_without_gathers():
    """Regression guard for the batch-128 OOM class: XLA fuses per-pixel
    take/take_along_axis in the augment into element-level gathers whose
    [N, 3] index tensors tile to 128 lanes on TPU (42x memory). The fused
    augment must lower to zero gather ops — crop+resize is interpolation
    matmuls, hsv selection is a where-chain."""
    import jax
    from functools import partial
    from rspnet_tpu.ops.augment import augment_batch

    batch = jnp.zeros((2, 3, 32, 40, 3), jnp.uint8)
    p = center_crop_params(2, [(32, 40)])
    # force every branch that could gather: jitter incl. hue, gray, blur
    p.jitter[:] = (1.1, 0.9, 1.2, 0.05)
    p.gray[0] = True
    p.blur[1] = True
    fn = partial(augment_batch, size=(16, 16), gray_before_jitter=False,
                 use_blur=True)
    hlo = jax.jit(fn).lower(jnp.asarray(batch), p.boxes, p.flip, p.jitter,
                            p.order, p.gray, p.blur).as_text()
    assert " gather(" not in hlo and "gather(" not in hlo.replace(
        "all_gather", ""), "augment lowering reintroduced a gather"


def test_augment_matches_naive_reference_order():
    """Full fused augment == naive reference-order composition.

    Pins the fusion restructures (flip folded into the interp matrix,
    arithmetic-gated jitter slots) against the straightforward pipeline
    the reference runs: crop/resize -> gray -> jitter (sequential, in
    `order`) -> hflip -> normalize (datasets/classification/__init__.py:
    186-199). Random per-sample flip/gray/jitter/boxes.
    """
    import jax

    from rspnet_tpu.ops import color
    from rspnet_tpu.ops.augment import crop_resize

    rng = np.random.default_rng(7)
    B = 16
    batch = (RNG.rand(B, 3, 40, 56, 3) * 255).astype(np.uint8)
    p = sample_train_params(rng, B, [(40, 56)], crop_area=(0.4, 1.0),
                            h_flip=0.5, gray_p=0.5,
                            jitter=(0.4, 0.4, 0.4, 0.4))
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    out = augment_batch(jnp.asarray(batch), p.boxes, p.flip, p.jitter,
                        p.order, p.gray, p.blur, size=(24, 24),
                        mean=mean, std=std)

    fns = [color.adjust_brightness, color.adjust_contrast,
           color.adjust_saturation, color.adjust_hue]
    for b in range(B):
        x = jnp.asarray(batch[b], jnp.float32) / 255.0
        x = crop_resize(x, jnp.asarray(p.boxes[b]), (24, 24))
        if p.gray[b]:
            x = color.rgb_to_grayscale(x)
        for op in p.order[b]:
            x = fns[op](x, p.jitter[b, op])
        if p.flip[b]:
            x = color.hflip(x)
        x = color.normalize(x, mean, std)
        # atol: the batched (vmap) and single-sample crop matmuls
        # accumulate in different orders (~1 ulp), which hue's
        # delta-quotient where-chains amplify to ~1e-5 — measured with
        # the pre-restructure jitter too. Structural errors (wrong op
        # order, misrouted flip) give O(1e-2) diffs.
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(x),
                                   atol=1e-4, err_msg=f"sample {b}")


@pytest.mark.parametrize("impl", ["csplit", "hsplit"])
def test_apply_jitter_matches_sequential_oracle(impl):
    """Both fused jitter schedules == naive sequential op application.

    csplit (default: split at the single contrast reduce, two masked hue
    sites) and hsplit (round-4: blend ops before hue -> hue once -> blend
    ops after) restructure the per-sample random-order jitter for TPU
    fusion; this pins each, over ALL 24 permutations, against the obvious
    oracle that applies color.adjust_* one-by-one in `order` (the
    reference semantics, transforms_tensor.py:107-126).
    """
    from itertools import permutations

    import jax

    from rspnet_tpu.ops import color
    from rspnet_tpu.ops.augment import (_apply_jitter_csplit,
                                        _apply_jitter_hsplit)

    fn = {"csplit": _apply_jitter_csplit,
          "hsplit": _apply_jitter_hsplit}[impl]

    orders = np.asarray(list(permutations(range(4))), dtype=np.int32)  # 24
    B = len(orders)
    clips = RNG.rand(B, 2, 8, 8, 3).astype(np.float32)
    factors = np.stack([
        RNG.uniform(0.6, 1.4, B), RNG.uniform(0.6, 1.4, B),
        RNG.uniform(0.6, 1.4, B), RNG.uniform(-0.4, 0.4, B),
    ], axis=1).astype(np.float32)

    ours = jax.vmap(fn)(jnp.asarray(clips), jnp.asarray(factors),
                        jnp.asarray(orders))

    fns = [color.adjust_brightness, color.adjust_contrast,
           color.adjust_saturation, color.adjust_hue]
    for b in range(B):
        x = jnp.asarray(clips[b])
        for op in orders[b]:
            x = fns[op](x, factors[b, op])
        np.testing.assert_allclose(np.asarray(ours[b]), np.asarray(x),
                                   atol=1e-6, err_msg=f"order={orders[b]}")
