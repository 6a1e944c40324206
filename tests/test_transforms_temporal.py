"""Temporal index transform tests: exact reference semantics incl. fallbacks
(reference: datasets/transforms_video/transforms_temporal.py)."""
import numpy as np
import pytest

from rspnet_tpu.data.transforms_temporal import (
    Cover, EvenNCrop, RandomStrideCrop, calc_needed_frames, fallback_select,
    resample_index,
)


def test_calc_needed_frames():
    assert calc_needed_frames(16, 1) == 16
    assert calc_needed_frames(16, 2) == 31
    assert calc_needed_frames(32, 4) == 125


class TestFallbackSelect:
    def test_long_video_returns_none(self):
        assert fallback_select(16, 1, 100) is None
        assert fallback_select(16, 2, 31) is None

    def test_short_video_tiles(self):
        sel = fallback_select(16, 1, 5)
        np.testing.assert_array_equal(sel, np.arange(16) % 5)

    def test_medium_video_linspace(self):
        # 16 < 20 < needed(16, 2)=31 -> rounded linspace over all frames
        sel = fallback_select(16, 2, 20)
        expected = np.linspace(0, 19, num=16).round().astype(int)
        np.testing.assert_array_equal(sel, expected)

    def test_empty_video_raises(self):
        with pytest.raises(ValueError):
            fallback_select(16, 1, 0)


class TestRandomStrideCrop:
    def test_output_size_and_stride(self):
        rng = np.random.default_rng(0)
        crop = RandomStrideCrop(16, [{"stride": 2, "weight": 1}], rng=rng)
        out = crop(np.arange(100))
        assert len(out) == 16
        assert np.all(np.diff(out) == 2)

    def test_window_in_range(self):
        rng = np.random.default_rng(1)
        crop = RandomStrideCrop(8, [{"stride": 1, "weight": 1}], rng=rng)
        for _ in range(50):
            out = crop(np.arange(30))
            assert out.min() >= 0 and out.max() <= 29
            assert len(out) == 8

    def test_weighted_stride_distribution(self):
        rng = np.random.default_rng(2)
        crop = RandomStrideCrop(4, [{"stride": 1, "weight": 8},
                                    {"stride": 2, "weight": 1},
                                    {"stride": 4, "weight": 1}], rng=rng)
        strides = []
        for _ in range(500):
            out = crop(np.arange(1000))
            strides.append(out[1] - out[0])
        counts = {s: strides.count(s) for s in (1, 2, 4)}
        # ~8:1:1
        assert counts[1] > 300
        assert 20 < counts[2] < 130
        assert 20 < counts[4] < 130

    def test_short_video_fallback(self):
        crop = RandomStrideCrop(16, rng=np.random.default_rng(0))
        out = crop(np.arange(5))
        np.testing.assert_array_equal(out, np.arange(16) % 5)

    def test_does_not_mutate_strides_input(self):
        strides = [{"stride": 1, "weight": 8}, {"stride": 2, "weight": 2}]
        RandomStrideCrop(4, strides)
        assert strides[0]["weight"] == 8  # reference mutates; we must not


class TestEvenNCrop:
    def test_center_crop_n1(self):
        out = EvenNCrop(16, stride=1, n=1)(np.arange(100))
        start = (100 - 16) // 2
        np.testing.assert_array_equal(out, np.arange(start, start + 16))

    def test_n_crops_even_spacing(self):
        out = EvenNCrop(8, stride=1, n=3)(np.arange(100))
        assert len(out) == 24
        starts = np.linspace(0, 100 - 8, num=3).round().astype(int)
        expected = np.concatenate([np.arange(s, s + 8) for s in starts])
        np.testing.assert_array_equal(out, expected)

    def test_short_video_tiled_n(self):
        out = EvenNCrop(16, stride=1, n=2)(np.arange(10))
        np.testing.assert_array_equal(out, np.tile(np.arange(16) % 10, 2))

    def test_strided(self):
        out = EvenNCrop(8, stride=2, n=1)(np.arange(50))
        assert np.all(np.diff(out) == 2)
        assert len(out) == 8


class TestCover:
    def test_train_random_offset_covers(self):
        cover = Cover(16, rng=np.random.default_rng(0))
        out = cover(np.arange(160))
        assert len(out) == 16
        # stride = 10: indices land one per bucket of 10
        assert np.all(np.diff(out) >= 9)

    def test_val_single_crop_centered_phase(self):
        out = Cover(16, n_crop=1)(np.arange(160))
        expected = np.floor(np.arange(16) * 10 + 5).astype(int)
        np.testing.assert_array_equal(out, expected)

    def test_val_multi_crop_phases(self):
        out = Cover(8, n_crop=2)(np.arange(80))
        assert len(out) == 16
        # phase offsets 0 and stride/2=5
        np.testing.assert_array_equal(out[:8], np.arange(8) * 10)
        np.testing.assert_array_equal(out[8:], np.arange(8) * 10 + 5)

    def test_short_video(self):
        out = Cover(16, n_crop=3)(np.arange(4))
        np.testing.assert_array_equal(out, np.tile(np.arange(16) % 4, 3))

    def test_no_overflow(self):
        cover = Cover(16, rng=np.random.default_rng(3))
        for _ in range(50):
            out = cover(np.arange(17))
            assert out.max() <= 16


class TestResample:
    def test_integer_step(self):
        out = resample_index(np.arange(100), original_fps=50, new_fps=25)
        np.testing.assert_array_equal(out, np.arange(0, 100, 2))

    def test_fractional_step(self):
        out = resample_index(np.arange(100), original_fps=30, new_fps=25)
        step = 30 / 25
        n = int(np.floor(100 / step))
        expected = np.floor(np.arange(n) * step).astype(int)
        np.testing.assert_array_equal(out, expected)

    def test_none_fps_passthrough(self):
        x = np.arange(10)
        assert resample_index(x, None, 25) is x
        assert resample_index(x, 30, None) is x
