"""Benchmark: S3D-G MoCo dual-speed pretrain throughput, clips/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Three phases, all on the same fused sharded train step
(rspnet_tpu/moco/builder.py — EMA + dual-speed gather + 2 no-grad key
passes + 1 grad query pass + backward + SGD + queue update, the same
per-step work as the reference: moco/builder_diffspeed_diffloss.py:492-546,
pretrain.py:154):

1. **step**: device-resident inputs, 30 timed steps. This is the headline
   `value` (the model/step throughput ceiling). TIMING IS FETCH-SYNCED:
   on the axon tunnel jax.block_until_ready does NOT wait for remote
   execution (measured: a chained matmul loop "achieved" 250x chip peak),
   so every timed section ends in a dependent scalar fetch and subtracts
   the measured fetch round-trip. Numbers recorded before 2026-08-17
   (rounds 1 and early 2) used block_until_ready and measured the
   dispatch/enqueue rate — they are 4-16x too high and are not comparable.
2. **e2e**: the REAL input pipeline — decode workers over real encoded
   240p MJPG videos through the production decoder (native C++ FFmpeg or
   cv2 fallback; decode-time scaling to the ship resolution rides the sws
   pass) -> fused on-device augment (device-geometry: crop+resize on chip,
   ops/augment.py) -> H2D -> train step. Same bytes/sample as the legacy
   synthetic backend (RSPNET_BENCH_E2E_BACKEND=synthetic), so comparable
   across rounds. Reported as
   `e2e_clips_per_sec_per_chip` plus
   `e2e_vs_sustained_input_bound`: the ratio against the SUSTAINED-regime
   H2D bound measured in phase 3. NOTE the regimes differ by design: the
   e2e phase runs inside the tunnel's ~4.5 GB burst window (measuring
   pipeline software, not the relay), while phase 3's bandwidth is
   dominated by the post-burst flow-controlled regime a long training
   run would live in — so this ratio can exceed 1.0 and is context, not
   a utilization fraction.
2b. **cached e2e**: the engine loop fed from the device-resident dataset
   cache (data/device_cache.py — decode + H2D once, epochs from HBM):
   per-step host work is only augment-param sampling + dispatch, so
   `e2e_cached_clips_per_sec_per_chip` certifies the engine software
   decoupled from the tunnel. `e2e_cached_vs_step` compares against the
   bare-step ceiling; the gap between them is mostly the fused on-device
   augment (real per-step compute in this pipeline, not loop overhead),
   so the phase also measures the augment pair and reports
   `e2e_cached_vs_device_work` (~1.0 = the engine loop adds nothing over
   its step+augment device work).
3. **h2d probe**: true aggregate host->device bandwidth (K puts ordered
   through a device-side reduction of the last buffer, fetched), plus the
   relay's local-buffering enqueue burst rate for context. A real TPU
   host feeds PCIe at tens of GB/s; the tunnel is the bound here.

- Model: S3D-G (BASELINE.json headline), bf16 compute, batch sharded over
  all local chips. Input 32x112x112 raw (dual-speed subsamples to 16 frames
  on device), matching config/pretrain/s3dg.jsonnet semantics at crop 112.
- value = clips/sec/chip where a "clip" is one training sample (one q/k
  pair), i.e. samples_per_step * steps_per_sec / n_chips.
- vs_baseline: ratio against the A100 reference estimate below. The
  reference publishes no throughput (SURVEY.md §6); we use 85 clips/s/GPU as
  the PyTorch-1.6 RSPNet S3D-G estimate on A100 (batch 64, 2x16x224^2 in
  the paper config takes ~0.75 s/step on A100-40G-class hardware). The
  driver target is vs_baseline >= 4.

Env knobs: RSPNET_BENCH_PHASES=step,e2e,cached,h2d (subset selects
phases; default all), RSPNET_BENCH_SKIP_E2E=1 (phase 1 only), RSPNET_BENCH_WORKERS=n,
RSPNET_BENCH_PROCS=1 (process decode workers), RSPNET_BENCH_RETRIES=n
(backend-init attempts, default 3), RSPNET_BENCH_TIMEOUT=sec (whole-run
alarm, default 3300 — a wedged tunnel fetch otherwise hangs forever and
the driver records no JSON at all), RSPNET_BENCH_PREFLIGHT=sec (bounded
tiny-fetch probe before committing to the run, default 600, 0 disables —
a wedged tunnel otherwise hangs INSIDE backend init and only the whole-run
watchdog would fire), RSPNET_BENCH_E2E_BACKEND=real|synthetic (phase-2
input source, default real encoded videos via the production decoder).

FAILURE CONTRACT: this script ALWAYS prints exactly one JSON line. If the
TPU backend cannot initialize (the 2026-08-17 tunnel wedge: UNAVAILABLE
from the axon plugin) or the run wedges mid-flight, the line carries
"value": null plus an "error" field instead of dying with a traceback
(BENCH_r02.json was rc=1/parsed=null for exactly this reason).
"""
from __future__ import annotations

import json
import os
import time

A100_BASELINE_CLIPS_PER_SEC = 85.0
METRIC = "s3dg_moco_pretrain_clips_per_sec_per_chip"


def _emit_error(error: str, detail: str = "") -> None:
    line = {"metric": METRIC, "value": None, "unit": "clips/sec/chip",
            "vs_baseline": None, "error": error}
    if detail:
        line["error_detail"] = detail[:400]
    print(json.dumps(line))


def _preflight(timeout_s: int) -> None:
    """Bounded tiny-fetch probe in a subprocess.

    A wedged axon tunnel HANGS inside backend init (jax.devices() never
    returns — observed 2026-08-20; the 2026-08-17 wedge instead raised
    UNAVAILABLE), so the in-process retry loop never sees an exception and
    only the 3300s whole-run watchdog would fire. A subprocess with a
    bounded wait distinguishes "wedged" from "cold init" (~90s healthy) in
    minutes and lets the failure contract emit its JSON line early.
    """
    import subprocess
    import sys
    # the axon plugin force-sets jax_platforms, clobbering the env var —
    # re-apply it so a JAX_PLATFORMS=cpu run preflights on cpu too
    code = ("import os, jax\n"
            "p = os.environ.get('JAX_PLATFORMS')\n"
            "if p: jax.config.update('jax_platforms', p)\n"
            "x = jax.numpy.ones((8, 8))\n"
            "print('PREFLIGHT_OK', float((x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"tpu-backend-unavailable: preflight tiny-fetch hung "
            f">{timeout_s}s (wedged tunnel; backend init never returned)")
    if r.returncode != 0 or "PREFLIGHT_OK" not in r.stdout:
        raise RuntimeError(
            "tpu-backend-unavailable: preflight failed: "
            + (r.stderr or r.stdout).strip()[-300:])


def _acquire_backend(retries: int, wait_s: float = 30.0) -> int:
    """Init the TPU backend with bounded retries; returns device count.

    The axon plugin raises RuntimeError('Unable to initialize backend
    ...UNAVAILABLE...') when the tunnel is down; a transient blip heals
    within a retry or two, a terminal wedge does not — either way the
    caller emits one parseable JSON line instead of a traceback.
    """
    import jax
    last = None
    for attempt in range(retries):
        try:
            return jax.device_count()
        except RuntimeError as e:  # backend init failure surfaces here
            last = e
            if attempt + 1 < retries:
                time.sleep(wait_s)
    raise RuntimeError(f"tpu-backend-unavailable after {retries} attempts: "
                       f"{last}") from last


def _encode_bench_videos(out_dir: str, n: int = 16, frames: int = 80,
                         wh=(320, 240)):
    """Encode n tiny MJPG videos (moving-bar content, UCF101-native 320x240)
    and return a catalog of Samples cycling over them. Returns None if no
    encoder is available (bench then falls back to the synthetic backend)."""
    import numpy as np
    try:
        import cv2
    except ImportError:
        return None
    from rspnet_tpu.data.catalogs import Sample
    w_px, h_px = wh
    rng = np.random.default_rng(0)
    paths = []
    for v in range(n):
        path = os.path.join(out_dir, f"bench_{v:02d}.avi")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25, wh)
        if not wr.isOpened():
            return None
        phase = float(rng.uniform(0, w_px))
        speed = int(rng.integers(1, 4))
        bg = rng.integers(16, 64)
        for t in range(frames):
            f = np.full((h_px, w_px, 3), bg, np.uint8)
            x = int(phase + speed * t) % (w_px - 24)
            f[h_px // 4: 3 * h_px // 4, x:x + 24, :] = 224
            wr.write(f[..., ::-1])
        wr.release()
        paths.append(path)
    return [Sample(video_path=p, class_index=i % 10)
            for i, p in enumerate(paths)]


class _CyclingCatalog:
    """Fixed-size catalog cycling over a small list of real video files."""

    def __init__(self, samples, num_samples: int):
        self._samples = samples
        self._n = num_samples

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return self._samples[i % len(self._samples)]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from rspnet_tpu.framework import enable_persistent_jit_cache
    enable_persistent_jit_cache()  # big-batch steps compile in minutes;
    # the disk cache makes warm runs start in seconds

    from rspnet_tpu.models import get_model_class
    from rspnet_tpu.moco import (MoCoConfig, MultiTaskWrapper,
                                 init_moco_state, make_sharded_train_step,
                                 packed_frame_subset)
    from rspnet_tpu.parallel import (create_mesh, fetch_scalar as fetch,
                                     replicate_to_mesh, shard_batch)

    pf = int(os.environ.get("RSPNET_BENCH_PREFLIGHT", "600"))
    if pf > 0:
        _preflight(pf)
    n_chips = _acquire_backend(int(os.environ.get("RSPNET_BENCH_RETRIES", "3")))
    mesh = create_mesh()

    # fetch-synced sweep (same-session A/B via RSPNET_BENCH_BATCH,
    # 2026-08-17): b32 840, b128 1049 clips/s/chip (+25%). The b128 step
    # compiles in ~15min cold; the persistent jit cache makes warm runs
    # start in seconds.
    batch_per_chip = int(os.environ.get("RSPNET_BENCH_BATCH", "128"))
    b_global = batch_per_chip * n_chips
    T, S = 32, 112
    # packed dual-speed loading: only the 24 of 32 window positions either
    # speed can touch are decoded/shipped (bit-identical math, 25% less
    # decode + H2D; tests/test_packed_frames.py)
    subset = packed_frame_subset(T, (2,))
    P = len(subset)

    from rspnet_tpu.utils.moco import trim_moco_k
    k = trim_moco_k(16384, b_global)
    if k <= 0:
        raise SystemExit(f"global batch {b_global} exceeds the 16384-slot "
                         f"queue; lower RSPNET_BENCH_BATCH")
    cfg = MoCoConfig(dim=128, k=k, m=0.999, t=0.07,
                     diff_speed=(2,), packed_frames=True, t_load=T)
    model = MultiTaskWrapper(
        encoder_factory=get_model_class("s3dg"),
        num_classes=cfg.dim, finetune=False, fc_type="linear",
        dtype=jnp.bfloat16, axis_name="data")
    optimizer = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.sgd(0.05, momentum=0.9))

    state = init_moco_state(model, cfg, optimizer, jax.random.PRNGKey(0),
                            (1, 16, S, S, 3))
    step = make_sharded_train_step(model, optimizer, cfg, mesh)

    rng = np.random.RandomState(0)
    im_q = jnp.asarray(rng.rand(b_global, P, S, S, 3), jnp.float32)
    im_k = jnp.asarray(rng.rand(b_global, P, S, S, 3), jnp.float32)

    # phase selection: RSPNET_BENCH_PHASES=step,e2e,cached,h2d (default all;
    # RSPNET_BENCH_SKIP_E2E=1 is the legacy phase-1-only switch). Lets A/B
    # sessions time one phase without spending the tunnel's burst window
    # on the others. The warmup + RTT calibration always run (every later
    # phase needs the compiled step and the fetch RTT); only the phase-1
    # 30-step timed loop is gated.
    phases = set(os.environ.get("RSPNET_BENCH_PHASES",
                                "step,e2e,cached,h2d").split(","))
    if os.environ.get("RSPNET_BENCH_SKIP_E2E"):
        phases = {"step"}

    # ---- phase 1: device-resident step throughput ---------------------------
    # SYNC CONTRACT (measured 2026-08-17): on the axon tunnel
    # jax.block_until_ready returns WITHOUT waiting for remote execution —
    # timing loops "synced" with it measure the dispatch/enqueue rate, not
    # compute (a chained 8k matmul loop reported 50,000 TFLOP/s, 250x the
    # chip's peak). The only real synchronization is a dependent VALUE
    # FETCH (rspnet_tpu.parallel.fetch_scalar); every timed section below
    # ends in one and subtracts the measured fetch round-trip.
    with mesh:
        state = replicate_to_mesh(state, mesh)
        im_q = shard_batch(im_q, mesh)
        im_k = shard_batch(im_k, mesh)

        # warmup / compile
        state, metrics = step(state, im_q, im_k, jax.random.PRNGKey(1))
        fetch(metrics["loss"])               # settle the chain

        # fetch RTT: further scalars off the already-completed step
        rtts = []
        for key in ("loss_A", "loss_M", "acc1_M"):
            t0 = time.perf_counter()
            fetch(metrics[key])
            rtts.append(time.perf_counter() - t0)
        rtt = min(rtts)

        if "step" in phases:
            n_steps = 30  # tunneled-chip timing variance ~±10% at 10 steps
            t0 = time.perf_counter()
            for i in range(n_steps):
                state, metrics = step(state, im_q, im_k,
                                      jax.random.PRNGKey(2 + i))
            fetch(metrics["loss"])           # dependent fetch = completion
            dt = time.perf_counter() - t0 - rtt

    result = {
        "metric": METRIC,
        "value": None,
        "unit": "clips/sec/chip",
        "n_chips": n_chips,
        "host_cpus": os.cpu_count(),
        "fetch_rtt_ms": round(rtt * 1e3, 1),
    }
    if "step" in phases:
        step_per_chip = b_global * n_steps / dt / n_chips
        result["value"] = round(step_per_chip, 2)
        result["vs_baseline"] = round(
            step_per_chip / A100_BASELINE_CLIPS_PER_SEC, 3)

    if phases <= {"step"}:
        print(json.dumps(result))
        return

    # ---- phase 2: data-fed end-to-end ----------------------------------------
    # Runs BEFORE the bandwidth probe so it executes inside the tunnel's
    # burst window (see phase 3) — this measures what the pipeline software
    # can sustain when bandwidth allows, which is the portable number.
    # No prefetch wrapper: on this 1-vCPU host the producer thread starves
    # dispatch (prefetch_iterator auto-disables; the loader's own decode
    # worker threads still prefetch samples).
    from rspnet_tpu.data.catalogs import Synthetic
    from rspnet_tpu.data.pipeline import PipelineConfig, VideoDataLoader
    from rspnet_tpu.ops.augment import augment_batch, sample_train_params

    DH, DW = 128, 171     # decode resolution (device-geometry pipeline)
    sample_mb = 2 * P * DH * DW * 3 / 1e6   # uint8 H2D bytes per sample
    # keep the whole phase inside the tunnel's ~4.5 GB H2D burst window
    # (phase 1 already spent ~1 GB of it): a fixed batch count at large
    # b_global would run half the timed batches in the ~0.1 GB/s
    # flow-controlled regime and measure the relay, not the pipeline
    n_warm = 2
    n_meas = max(4, min(16, int(3400 / (sample_mb * b_global)) - n_warm))
    n_batches = n_warm + n_meas
    loader_cfg = PipelineConfig(
        clip_len=T, strides=[{"stride": 1, "weight": 1}],
        out_size=S, crop_area=(0.4, 1.0), num_clips=2,
        batch_size=b_global, train=True,
        num_workers=int(os.environ.get("RSPNET_BENCH_WORKERS", "2")),
        use_processes=os.environ.get("RSPNET_BENCH_PROCS", "")
        not in ("", "0", "false"),
        device_geometry=True, frame_subset=subset, seed=0)
    aug_rng = np.random.default_rng(0)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    def device_batch(clip_u8):
        p = sample_train_params(
            aug_rng, clip_u8.shape[0], [(DH, DW)], crop_area=(0.4, 1.0),
            h_flip=0.5, gray_p=0.2, jitter=(0.4, 0.4, 0.4, 0.4))
        x = augment_batch(jnp.asarray(clip_u8), p.boxes, p.flip, p.jitter,
                          p.order, p.gray, p.blur, size=(S, S),
                          mean=mean, std=std)
        return shard_batch(x, mesh)

    if "e2e" in phases:
      # Phase 2 runs over REAL encoded videos through the production decode
      # path by default (native C++ FFmpeg decoder if built, cv2 fallback),
      # with decode-time scaling 240p -> (DH, DW) riding the sws pass —
      # the reference's default dataset path (datasets/classification/
      # video.py:55-80) as the certified artifact exercises it. Byte volume
      # per sample over the tunnel is identical to the synthetic backend,
      # so the number stays comparable across rounds;
      # RSPNET_BENCH_E2E_BACKEND=synthetic restores the old backend for A/B.
      e2e_backend = os.environ.get("RSPNET_BENCH_E2E_BACKEND", "real")
      catalog = None
      if e2e_backend == "real":
          import tempfile
          vdir = tempfile.mkdtemp(prefix="rspnet_bench_vids_")
          files = _encode_bench_videos(vdir)
          if files is None:
              e2e_backend = "synthetic"  # no encoder on this host
          else:
              catalog = _CyclingCatalog(files, n_batches * b_global)
              from rspnet_tpu.data.video_reader import _try_native
              from dataclasses import replace as _dc_replace
              e2e_loader_cfg = _dc_replace(loader_cfg, decode_size=(DH, DW))
              result["e2e_backend"] = ("real-video-native" if _try_native()
                                       else "real-video-cv2")
      if catalog is None:
          catalog = Synthetic(num_samples=n_batches * b_global,
                              num_classes=10, num_frames=64,
                              height=DH, width=DW)
          e2e_loader_cfg = loader_cfg
          result["e2e_backend"] = "synthetic"
      loader = VideoDataLoader(catalog, e2e_loader_cfg)
      with mesh:
        key = jax.random.PRNGKey(100)
        t_start = None
        done = 0
        for i, batch in enumerate(loader):
            clip_q = device_batch(batch["clips"][0])
            clip_k = device_batch(batch["clips"][1])
            key, sub = jax.random.split(key)
            state, metrics = step(state, clip_q, clip_k, sub)
            if i + 1 == n_warm:
                fetch(metrics["loss"])       # real sync (see phase 1 note)
                t_start = time.perf_counter()
            elif i + 1 > n_warm:
                done += b_global
        fetch(metrics["loss"])               # dependent fetch = completion
        e2e_dt = time.perf_counter() - t_start - rtt

      e2e_per_chip = done / e2e_dt / n_chips
      result["e2e_clips_per_sec_per_chip"] = round(e2e_per_chip, 2)
      result["e2e_vs_baseline"] = round(
          e2e_per_chip / A100_BASELINE_CLIPS_PER_SEC, 3)

    # ---- phase 2b: engine loop fed from the device-resident cache ------------
    # The phase-2 number certifies the tunnel (the software sits at the
    # relay's H2D ceiling, e2e_vs_sustained_input_bound ~= 1); this phase
    # certifies the ENGINE LOOP itself: decode + H2D once into HBM
    # (data/device_cache.py), then every epoch is a batch-axis gather, so
    # per-step host work is only augment-param sampling + dispatch. On a
    # real TPU host (PCIe, not a tunnel) the live pipeline looks like this.
    from rspnet_tpu.data.device_cache import DeviceCachedLoader

    if "cached" in phases:
      n_cache_batches = 2   # 2*b_global samples: fits HBM + one slow H2D pass
      cache_catalog = Synthetic(
          num_samples=n_cache_batches * b_global, num_classes=10,
          num_frames=64, height=DH, width=DW)
      t_build = time.perf_counter()
      cache_loader = DeviceCachedLoader(
          VideoDataLoader(cache_catalog, loader_cfg), mesh=mesh)
      result["cache_build_sec"] = round(time.perf_counter() - t_build, 1)

      with mesh:
        key = jax.random.PRNGKey(200)
        n_warm_c, n_meas_c = 2, 16
        t_start = None
        done = 0
        i = 0
        for ep in range(100):
            cache_loader.set_epoch(ep)
            stop = False
            for batch in cache_loader:
                clip_q = device_batch(batch["clips"][0])
                clip_k = device_batch(batch["clips"][1])
                key, sub = jax.random.split(key)
                state, metrics = step(state, clip_q, clip_k, sub)
                i += 1
                if i == n_warm_c:
                    fetch(metrics["loss"])   # real sync (see phase 1 note)
                    t_start = time.perf_counter()
                elif i > n_warm_c:
                    done += b_global
                if i >= n_warm_c + n_meas_c:
                    stop = True
                    break
            if stop:
                break
        fetch(metrics["loss"])               # dependent fetch = completion
        cached_dt = time.perf_counter() - t_start - rtt

      cached_per_chip = done / cached_dt / n_chips
      result["e2e_cached_clips_per_sec_per_chip"] = round(cached_per_chip, 2)
      if "step" in phases:
          # the honest "can the engine loop feed its own step" fraction
          result["e2e_cached_vs_step"] = round(
              cached_per_chip / step_per_chip, 3)

      # Decompose the gap: the cached loop's per-batch DEVICE work is
      # step + 2x fused augment (+ the cache's take-gather) — augment is
      # real compute (jitter/hue/geometry over decode-res uint8), not
      # engine overhead. Measure the augment pair fetch-synced and report
      # the loop's efficiency against the step+augment device ceiling;
      # ~1.0 means the engine software (param sampling, dispatch, metric
      # spooling) adds nothing and the remaining e2e_cached_vs_step gap
      # is device augment compute.
      from rspnet_tpu.parallel.mesh import time_enqueued
      one_u8 = next(iter(cache_loader))["clips"][0]
      with mesh:
          t_aug = time_enqueued(
              lambda u8=one_u8: jnp.sum(device_batch(u8)), iters=5)
      result["augment_ms_per_clipbatch"] = round(t_aug * 1e3, 1)
      if "step" in phases:   # needs the phase-1 step rate for the ceiling
          t_batch_step = b_global / (step_per_chip * n_chips)
          dev_ceiling = b_global / (t_batch_step + 2 * t_aug) / n_chips
          result["e2e_cached_vs_device_work"] = round(
              cached_per_chip / dev_ceiling, 3)

    # ---- phase 3: H2D bandwidth probe ----------------------------------------
    # device_put is asynchronous and block_until_ready does not wait on this
    # tunnel (see phase 1 note), so per-put "rates" only show the relay's
    # local-buffering burst (~1.5 GB/s for the first ~4.5 GB) collapsing to
    # its flow-controlled enqueue rate. TRUE aggregate bandwidth comes from
    # timing K puts through to a device-side reduction of the LAST buffer
    # (transfers to one device complete in order) fetched to the host.
    if "h2d" in phases:
      buf = np.random.randint(0, 255, (b_global, P, DH, DW, 3), np.uint8)
      checksum = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
      fetch(checksum(jax.device_put(buf)))        # warm path + compile
      rates = []
      n_iter = max(10, int(4.0e9 / buf.nbytes))
      t_all = time.perf_counter()
      for i in range(n_iter):
          buf[0, 0, 0, 0, 0] += 1
          t0 = time.perf_counter()
          dev = jax.device_put(buf)
          rates.append(buf.nbytes / 1e6 / (time.perf_counter() - t0))
      fetch(checksum(dev))                        # orders after every put
      true_mb = n_iter * buf.nbytes / 1e6 / (time.perf_counter() - t_all - rtt)
      enqueue_burst = max(np.mean(rates[:8]), np.mean(rates[:4]))
      result["h2d_true_mb_per_sec"] = round(float(true_mb), 1)
      result["h2d_enqueue_burst_mb_per_sec"] = round(float(enqueue_burst), 1)
      # sustained-regime bound: what a LONG run is limited to once the
      # burst window is spent. The e2e phase deliberately ran INSIDE the
      # window, so the ratio can exceed 1.0 — see the module docstring.
      result["e2e_input_bound_sustained_clips_per_sec"] = round(
          true_mb / sample_mb, 1)
      if "e2e" in phases:
          result["e2e_vs_sustained_input_bound"] = round(
              e2e_per_chip * n_chips / (true_mb / sample_mb), 3)
    print(json.dumps(result))


def _run_guarded():
    # A wedged tunnel fetch blocks INSIDE a C call, so SIGALRM handlers and
    # Python-level timeouts never run — only a watchdog thread that emits
    # the JSON line itself and hard-exits can guarantee the output contract.
    import threading
    timeout = int(os.environ.get("RSPNET_BENCH_TIMEOUT", "3300"))
    if timeout > 0:
        def _watchdog():
            _emit_error("bench-timeout",
                        f"bench exceeded {timeout}s — tunnel wedge?")
            os._exit(0)  # rc=0: the JSON line IS the result
        timer = threading.Timer(timeout, _watchdog)
        timer.daemon = True
        timer.start()
    try:
        main()
    except RuntimeError as e:
        msg = str(e)
        if "tpu-backend-unavailable" in msg or "UNAVAILABLE" in msg:
            _emit_error("tpu-backend-unavailable", msg)
        else:
            _emit_error("runtime-error", msg)
    except Exception as e:  # never die with a traceback: one JSON line always
        _emit_error(type(e).__name__, str(e))
    finally:
        if timeout > 0:
            timer.cancel()


if __name__ == "__main__":
    _run_guarded()
