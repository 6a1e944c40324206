"""C++ FFmpeg decoder tests (skipped when the toolchain can't build it)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "t.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (64, 48))
    for t in range(60):
        f = np.zeros((48, 64, 3), np.uint8)
        f[:, :, 1] = t * 4
        w.write(f[..., ::-1])
    w.release()
    return path


@pytest.fixture(scope="module")
def native():
    from rspnet_tpu.native import video_decode
    if not video_decode.is_available():
        pytest.skip("native decoder unavailable")
    return video_decode


def test_open_metadata(native, test_video):
    r = native.RspVideoReader(test_video)
    assert r.num_frames == 60
    assert r.fps == pytest.approx(25.0)
    assert (r.height, r.width) == (48, 64)
    r.close()


def test_get_batch_content_and_order(native, test_video):
    r = native.RspVideoReader(test_video)
    idx = [5, 50, 0, 20]  # unsorted on purpose
    batch = r.get_batch(idx)
    assert batch.shape == (4, 48, 64, 3)
    for i, t in enumerate(idx):
        assert abs(float(batch[i, :, :, 1].mean()) - t * 4) < 10
    r.close()


def test_matches_cv2_backend(native, test_video):
    from rspnet_tpu.data.video_reader import CvVideoReader
    r = native.RspVideoReader(test_video)
    c = CvVideoReader(test_video)
    idx = [0, 7, 33, 59]
    diff = np.abs(r.get_batch(idx).astype(int)
                  - c.get_batch(idx).astype(int)).max()
    assert diff <= 2  # identical decode, allow colorspace rounding
    r.close()
    c.close()


def test_backward_then_forward_seek(native, test_video):
    r = native.RspVideoReader(test_video)
    b1 = r.get_batch([40, 45])
    b2 = r.get_batch([1, 2])   # requires backward seek
    assert abs(float(b2[0, :, :, 1].mean()) - 4) < 10
    b3 = r.get_batch([55])
    assert abs(float(b3[0, :, :, 1].mean()) - 220) < 10
    r.close()


def test_missing_file_raises(native):
    with pytest.raises(IOError):
        native.RspVideoReader("/nonexistent/video.mp4")


def test_repeated_past_eof_batches_pad(native, test_video):
    """Metadata can overestimate num_frames; a request at/past real EOF
    pads with the last decoded frame AND must leave the reader usable —
    a drained demuxer+codec previously made the NEXT past-EOF batch fail
    with 'EOF before any requested frame' instead of padding."""
    r = native.RspVideoReader(test_video)
    b1 = r.get_batch([58, 59, 60, 65])      # crosses EOF: pads 60/65
    assert abs(float(b1[1, :, :, 1].mean()) - 236) < 10
    np.testing.assert_array_equal(b1[2], b1[3])
    b2 = r.get_batch([62, 70])              # entirely past EOF, drained
    np.testing.assert_array_equal(b2[0], b2[1])
    assert abs(float(b2[0, :, :, 1].mean()) - 236) < 10
    b3 = r.get_batch([0, 1])                # and normal reads still work
    assert abs(float(b3[0, :, :, 1].mean()) - 0) < 10
    r.close()


def test_use_after_close_raises(native, test_video):
    r = native.RspVideoReader(test_video)
    r.get_batch([0])
    r.close()
    with pytest.raises(Exception):
        r.get_batch([0])


@pytest.fixture(scope="module")
def odd_width_videos(tmp_path_factory):
    """Width 170 -> RGB24 row of 510 bytes, NOT a SIMD-register multiple.

    Regression guard: sws_scale's vector stores spill past unaligned row
    ends, so scaling directly into the tightly-packed output buffer
    corrupted the heap (crashed 'corrupted size vs. prev_size' under
    concurrency). The decoder must stage through an aligned buffer.
    """
    d = tmp_path_factory.mktemp("oddvids")
    paths = []
    for v in range(4):
        path = str(d / f"v{v}.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25,
                            (170, 128))
        for t in range(64):
            f = np.zeros((128, 170, 3), np.uint8)
            f[:, :, 0] = t * 3
            f[:, :, 2] = v * 50
            w.write(f[..., ::-1])
        w.release()
        paths.append(path)
    return paths


def test_odd_width_matches_cv2(native, odd_width_videos):
    from rspnet_tpu.data.video_reader import CvVideoReader
    r = native.RspVideoReader(odd_width_videos[0])
    c = CvVideoReader(odd_width_videos[0])
    idx = [0, 13, 40, 63]
    diff = np.abs(r.get_batch(idx).astype(int)
                  - c.get_batch(idx).astype(int)).max()
    assert diff <= 2
    r.close()
    c.close()


def test_concurrent_decode_threads(native, odd_width_videos):
    """Six threads, each with its own reader, decoding odd-width video.

    Before the aligned-staging fix this aborted the process with heap
    corruption; readers must be safe when used from independent threads.
    """
    import threading

    errors = []

    def work(i):
        try:
            for _ in range(4):
                r = native.RspVideoReader(odd_width_videos[i % 4])
                batch = r.get_batch(list(range(0, 60, 2)))
                assert batch.shape == (30, 128, 170, 3)
                # content check: blue channel encodes the video id
                assert abs(float(batch[:, :, :, 2].mean()) - (i % 4) * 50) < 8
                r.close()
        except Exception as e:  # pragma: no cover - failure path
            errors.append((i, e))

    threads = [threading.Thread(target=work, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_pipeline_uses_native_backend(native, test_video):
    from rspnet_tpu.data.video_reader import open_video
    r = open_video(test_video)
    assert type(r).__name__ == "RspVideoReader"
    r.close()


# -- decode-time scaling (VERDICT r2 #2) -------------------------------------

def test_scaled_decode_shape_and_content(native, test_video):
    r = native.RspVideoReader(test_video)
    idx = [5, 50, 0, 20]
    batch = r.get_batch(idx, out_wh=(32, 24))
    assert batch.shape == (4, 24, 32, 3)
    # green ramp survives the resize (content, not garbage)
    for i, t in enumerate(idx):
        assert abs(float(batch[i, :, :, 1].mean()) - t * 4) < 10
    r.close()


def test_scaled_decode_matches_cv2_resize(native, odd_width_videos):
    """sws bilinear downscale vs decode-then-cv2-resize: same image up to
    resampler differences (both bilinear, different tap placement)."""
    r = native.RspVideoReader(odd_width_videos[0])
    idx = [0, 13, 40]
    scaled = r.get_batch(idx, out_wh=(85, 64)).astype(int)
    full = r.get_batch(idx)
    r.close()
    ref = np.stack([cv2.resize(f, (85, 64), interpolation=cv2.INTER_LINEAR)
                    for f in full]).astype(int)
    assert scaled.shape == ref.shape
    assert np.abs(scaled - ref).mean() < 6
    assert np.abs(scaled.mean(axis=(1, 2)) - ref.mean(axis=(1, 2))).max() < 3


def test_scaled_decode_size_switch_rebuilds_converter(native, test_video):
    """Alternating output sizes on ONE reader exercises the sws/rgb-buffer
    cache invalidation (stale geometry would corrupt or crash)."""
    r = native.RspVideoReader(test_video)
    for w, h in [(32, 24), (64, 48), (16, 12), (64, 48)]:
        b = r.get_batch([0, 30], out_wh=(w, h))
        assert b.shape == (2, h, w, 3)
        assert abs(float(b[1, :, :, 1].mean()) - 120) < 12
    r.close()


def test_concurrent_scaled_decode_threads(native, odd_width_videos):
    """Thread-safety regression extended to the scaled path: odd OUTPUT
    width (85 -> 255-byte rows) through the aligned staging buffer."""
    import threading

    errors = []

    def work(i):
        try:
            for _ in range(3):
                r = native.RspVideoReader(odd_width_videos[i % 4])
                batch = r.get_batch(list(range(0, 60, 2)), out_wh=(85, 64))
                assert batch.shape == (30, 64, 85, 3)
                assert abs(float(batch[:, :, :, 2].mean()) - (i % 4) * 50) < 8
                r.close()
        except Exception as e:  # pragma: no cover - failure path
            errors.append((i, e))

    threads = [threading.Thread(target=work, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_pipeline_decode_size_mixes_video_sizes(native, tmp_path):
    """device_geometry + decode_size on a MIXED-size dataset (the case the
    reference transcode recipe forces: scale=w=-2:h=256 -> variable
    widths). Without decode_size the stack raises; with it every clip
    lands at one geometry during decode."""
    from rspnet_tpu.data.pipeline import PipelineConfig, VideoDataLoader

    class Sample:
        def __init__(self, p):
            self.video_path = p
            self.class_index = 0

    paths = []
    for k, (w, h) in enumerate([(64, 48), (96, 48), (80, 64), (64, 48)]):
        p = str(tmp_path / f"m{k}.avi")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 25, (w, h))
        for t in range(40):
            f = np.full((h, w, 3), t * 5, np.uint8)
            wr.write(f[..., ::-1])
        wr.release()
        paths.append(p)
    catalog = [Sample(p) for p in paths]

    cfg = PipelineConfig(clip_len=4, out_size=32, batch_size=4, train=True,
                         num_workers=2, device_geometry=True,
                         decode_size=(48, 64), seed=0)
    loader = VideoDataLoader(catalog, cfg)
    batch = next(iter(loader))
    assert batch["clips"][0].shape == (4, 4, 48, 64, 3)
