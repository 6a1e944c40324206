"""Color-op equivalence tests: jax ops vs the reference torch formulas
(reference: datasets/transforms_video/functional_tensor.py). The torch side
is re-derived here from the documented formulas using plain torch ops."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rspnet_tpu.ops import color

# Random clips: [T, H, W, C] in [0, 1]
RNG = np.random.RandomState(42)
CLIP = RNG.rand(2, 8, 8, 3).astype(np.float32)


def torch_grayscale(img_chw: torch.Tensor) -> torch.Tensor:
    # reference functional_tensor.py:98 (ITU-R 601-2)
    grey = 0.2989 * img_chw[0] + 0.5870 * img_chw[1] + 0.1140 * img_chw[2]
    return grey.unsqueeze(0).expand_as(img_chw)


def torch_blend(a, b, ratio):
    return (ratio * a + (1 - ratio) * b).clamp(0, 1)


def to_torch_cthw(clip_thwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(clip_thwc).permute(3, 0, 1, 2).contiguous()


def from_torch_cthw(t: torch.Tensor) -> np.ndarray:
    return t.permute(1, 2, 3, 0).numpy()


def test_grayscale_matches():
    ours = np.asarray(color.rgb_to_grayscale(jnp.asarray(CLIP)))
    ref = from_torch_cthw(torch_grayscale(to_torch_cthw(CLIP)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("factor", [0.0, 0.6, 1.0, 1.4])
def test_brightness_matches(factor):
    ours = np.asarray(color.adjust_brightness(jnp.asarray(CLIP), factor))
    t = to_torch_cthw(CLIP)
    ref = from_torch_cthw(torch_blend(t, torch.zeros_like(t), factor))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("factor", [0.6, 1.0, 1.4])
def test_contrast_matches(factor):
    ours = np.asarray(color.adjust_contrast(jnp.asarray(CLIP), factor))
    t = to_torch_cthw(CLIP)
    mean = torch_grayscale(t).float().mean()
    ref = from_torch_cthw(torch_blend(t, mean, factor))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("factor", [0.6, 1.0, 1.4])
def test_saturation_matches(factor):
    ours = np.asarray(color.adjust_saturation(jnp.asarray(CLIP), factor))
    t = to_torch_cthw(CLIP)
    ref = from_torch_cthw(torch_blend(t, torch_grayscale(t), factor))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_hsv_roundtrip_identity():
    rgb = jnp.asarray(CLIP)
    back = color.hsv_to_rgb(color.rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), CLIP, atol=1e-5)


def test_rgb_to_hsv_matches_matplotlib():
    try:
        from matplotlib.colors import rgb_to_hsv as mpl_rgb_to_hsv
    except ImportError:
        pytest.skip("matplotlib unavailable")
    ours = np.asarray(color.rgb_to_hsv(jnp.asarray(CLIP)))
    ref = mpl_rgb_to_hsv(CLIP)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("factor", [-0.5, -0.2, 0.0, 0.3, 0.5])
def test_adjust_hue_matches_matplotlib(factor):
    try:
        from matplotlib.colors import hsv_to_rgb, rgb_to_hsv
    except ImportError:
        pytest.skip("matplotlib unavailable")
    ours = np.asarray(color.adjust_hue(jnp.asarray(CLIP), factor))
    hsv = rgb_to_hsv(CLIP)
    hsv[..., 0] = (hsv[..., 0] + factor) % 1.0
    ref = hsv_to_rgb(hsv)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_hue_zero_is_near_identity():
    out = np.asarray(color.adjust_hue(jnp.asarray(CLIP), 0.0))
    np.testing.assert_allclose(out, CLIP, atol=1e-5)


def test_gaussian_kernel_matches_reference_values():
    # reference docstring values (functional_tensor.py:447-449, 487-495)
    k = np.asarray(color.gaussian_kernel1d(3, 2.5))
    np.testing.assert_allclose(k, [0.3243, 0.3513, 0.3243], atol=1e-4)
    k5 = np.asarray(color.gaussian_kernel1d(5, 1.5))
    np.testing.assert_allclose(k5, [0.1201, 0.2339, 0.2921, 0.2339, 0.1201],
                               atol=1e-4)
    k2d = np.asarray(color.gaussian_kernel2d((3, 3), (1.5, 1.5)))
    np.testing.assert_allclose(
        k2d,
        [[0.0947, 0.1183, 0.0947],
         [0.1183, 0.1478, 0.1183],
         [0.0947, 0.1183, 0.0947]], atol=1e-4)


def test_gaussian_blur_matches_torch_conv():
    ours = np.asarray(color.gaussian_blur(jnp.asarray(CLIP), (3, 3), (1.5, 1.5)))
    kernel = np.asarray(color.gaussian_kernel2d((3, 3), (1.5, 1.5)))
    tk = torch.from_numpy(kernel)[None, None].repeat(3, 1, 1, 1)
    x = torch.from_numpy(CLIP).permute(0, 3, 1, 2)  # [T, C, H, W]
    ref = torch.nn.functional.conv2d(x, tk, padding=1, groups=3)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_normalize_and_flip():
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = np.asarray(color.normalize(jnp.asarray(CLIP), mean, std))
    ref = (CLIP - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(out, ref, atol=1e-6)

    flipped = np.asarray(color.hflip(jnp.asarray(CLIP)))
    np.testing.assert_array_equal(flipped, CLIP[:, :, ::-1, :])
