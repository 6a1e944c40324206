"""bench.py failure contract: ALWAYS exactly one JSON line, rc=0.

BENCH_r02.json was rc=1/parsed=null because bench.py:75 hit
jax.device_count() during the 2026-08-17 tunnel wedge and died with a
traceback. The guarded runner must instead emit
{"metric": ..., "value": null, "error": ...} for:
- backend-init failure (after bounded retries),
- any mid-run exception,
- a wedge (blocking C call) via the watchdog thread + os._exit(0).

The watchdog hard-exits the process, so every case runs in a subprocess.
"""
import json
import subprocess
import sys

import pytest

REPO = "/root/repo"


def _run(snippet: str, timeout: float = 60.0):
    proc = subprocess.run(
        [sys.executable, "-c", snippet], cwd=REPO, capture_output=True,
        text=True, timeout=timeout)
    return proc


def _parse_single_json_line(stdout: str):
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one line, got: {lines!r}"
    return json.loads(lines[0])


def test_backend_unavailable_emits_json_line():
    snippet = """
import bench
def boom():
    raise RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
        "setup/compile error (Unavailable).")
bench.main = boom
bench._run_guarded()
"""
    proc = _run(snippet)
    assert proc.returncode == 0, proc.stderr
    line = _parse_single_json_line(proc.stdout)
    assert line["metric"] == "s3dg_moco_pretrain_clips_per_sec_per_chip"
    assert line["value"] is None
    assert line["error"] == "tpu-backend-unavailable"


def test_generic_exception_emits_json_line():
    snippet = """
import bench
def boom():
    raise ValueError("some other failure")
bench.main = boom
bench._run_guarded()
"""
    proc = _run(snippet)
    assert proc.returncode == 0, proc.stderr
    line = _parse_single_json_line(proc.stdout)
    assert line["value"] is None
    assert line["error"] == "ValueError"
    assert "some other failure" in line["error_detail"]


def test_watchdog_escapes_a_wedged_fetch():
    # Simulate a fetch stuck in a C call with an uninterruptible sleep;
    # the watchdog thread must emit the JSON line and os._exit(0).
    snippet = """
import os, time
os.environ["RSPNET_BENCH_TIMEOUT"] = "2"
import bench
def wedge():
    time.sleep(300)
bench.main = wedge
bench._run_guarded()
print("UNREACHABLE")
"""
    proc = _run(snippet, timeout=30.0)
    assert proc.returncode == 0, proc.stderr
    line = _parse_single_json_line(proc.stdout)
    assert line["error"] == "bench-timeout"
    assert "UNREACHABLE" not in proc.stdout


def test_acquire_backend_retries_then_raises():
    snippet = """
import bench, time
calls = []
class FakeJax:
    @staticmethod
    def device_count():
        calls.append(time.time())
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")
import sys
sys.modules["jax"] = FakeJax()
try:
    bench._acquire_backend(3, wait_s=0.01)
except RuntimeError as e:
    assert "tpu-backend-unavailable after 3 attempts" in str(e), str(e)
    print(len(calls))
"""
    # FakeJax() is an instance: give it device_count via the class attr
    proc = _run(snippet)
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == "3"


def test_success_path_prints_value(monkeypatch, capsys):
    # In-process: a main() that prints a normal result line passes through
    # the guard untouched.
    sys.path.insert(0, REPO)
    try:
        import bench
        monkeypatch.setattr(
            bench, "main",
            lambda: print(json.dumps({"metric": bench.METRIC, "value": 1.0})))
        monkeypatch.setenv("RSPNET_BENCH_TIMEOUT", "0")
        bench._run_guarded()
        out = capsys.readouterr().out
        line = _parse_single_json_line(out)
        assert line["value"] == 1.0
    finally:
        sys.path.remove(REPO)


def test_preflight_timeout_maps_to_backend_unavailable(monkeypatch):
    """A wedged tunnel hangs INSIDE backend init (observed 2026-08-20), so
    the preflight subprocess must convert the hang into the contract's
    tpu-backend-unavailable error within its bound."""
    import subprocess as sp
    sys.path.insert(0, REPO)
    try:
        import bench

        def fake_run(*a, **k):
            raise sp.TimeoutExpired(cmd=a[0], timeout=k["timeout"])

        monkeypatch.setattr(sp, "run", fake_run)
        with pytest.raises(RuntimeError, match="tpu-backend-unavailable"):
            bench._preflight(3)
    finally:
        sys.path.remove(REPO)


def test_preflight_failure_maps_to_backend_unavailable(monkeypatch):
    import subprocess as sp
    sys.path.insert(0, REPO)
    try:
        import bench

        class R:
            returncode = 1
            stdout = ""
            stderr = "RuntimeError: Unable to initialize backend"

        monkeypatch.setattr(sp, "run", lambda *a, **k: R())
        with pytest.raises(RuntimeError, match="tpu-backend-unavailable"):
            bench._preflight(3)
    finally:
        sys.path.remove(REPO)


def test_preflight_succeeds_on_cpu(monkeypatch):
    """End-to-end preflight success path: the subprocess honors
    JAX_PLATFORMS=cpu (the axon plugin clobbers the env var, the probe
    code re-applies it)."""
    sys.path.insert(0, REPO)
    try:
        import bench
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        bench._preflight(120)  # raises on failure
    finally:
        sys.path.remove(REPO)


def test_bench_video_catalog_decodes_through_loader(tmp_path):
    """_encode_bench_videos -> _CyclingCatalog -> VideoDataLoader over the
    production decoder with decode-time scaling: the phase-2 real-video
    input path, minus the chip."""
    pytest.importorskip("cv2")
    import numpy as np
    sys.path.insert(0, REPO)
    try:
        import bench
        files = bench._encode_bench_videos(str(tmp_path), n=2, frames=40,
                                           wh=(96, 64))
        assert files is not None and len(files) == 2
        from rspnet_tpu.data.pipeline import PipelineConfig, VideoDataLoader
        cfg = PipelineConfig(
            clip_len=8, strides=[{"stride": 1, "weight": 1}], out_size=32,
            crop_area=(0.4, 1.0), num_clips=2, batch_size=4, train=True,
            num_workers=2, device_geometry=True, decode_size=(48, 64),
            seed=0)
        catalog = bench._CyclingCatalog(files, 8)
        assert len(catalog) == 8
        assert catalog[3].video_path == files[1].video_path
        batches = list(VideoDataLoader(catalog, cfg))
        assert len(batches) == 2
        clip = batches[0]["clips"][0]
        assert clip.shape == (4, 8, 48, 64, 3)  # decode-res uint8, scaled
        assert clip.dtype == np.uint8
        assert clip.std() > 0  # real decoded content, not padding
    finally:
        sys.path.remove(REPO)
