"""Synthetic transfer-evidence experiment: does MoCo+RSP pretraining help?

Runs, on the synthetic *speed-class* dataset (class = movement speed, the
exact invariant RSP pretraining learns; color/direction are instance noise):

  1. MoCo dual-speed pretraining (pretrain.py)
  2. linear probe (only_train_fc) from the MoCo checkpoint (finetune.py --mc)
  3. linear probe from random init (same config, no --mc)

and prints one JSON line {"moco_acc1", "random_acc1", "gain"}. A positive
gain is the in-environment stand-in for the reference's UCF101/HMDB51
transfer results (BASELINE.md accuracy targets need real video datasets).

Round-1 context: with *direction+color*-coded classes the MoCo probe showed
no gain — MoCo's gray/jitter augmentation deliberately destroys color
signal. Speed classes survive every augmentation, so this isolates what
RSP is supposed to learn (reference paper's core claim).

Usage: python utils/transfer_probe.py [--out DIR] [--epochs N] [--probe-epochs N]
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_DATA = ('dataset: {name: "synthetic", num_samples: 512, num_classes: 10, '
         'num_frames: 64, class_mode: "speed"}, device_geometry: true, '
         'num_workers: 2')

# per-arch configs + probe-scale overrides. s3dg's shipped configs train
# at 224^2 x 64 frames; the probe doesn't need that resolution, and the
# small eval n_crop keeps a cache_device final-validate inside the HBM
# budget (device_cache.py).
_ARCHES = {
    "c3d": {
        # BASELINE.md quotes C3D (76.71% UCF101); default 112^2 x 16
        # geometry matches the probe scale already. C3D's BN momentum is
        # the torch default (0.1), so no recalibration is needed (cf.
        # s3dg's 0.001 — see --bn-recalib).
        "pretrain": "config/pretrain/c3d.jsonnet",
        "finetune": "config/finetune/ucf101_c3d.jsonnet",
        "pre_extra": "",
        "probe_temporal": "{frame_rate: null}",
        "probe_extra": "",
    },
    "resnet18": {
        "pretrain": "config/pretrain/resnet18.jsonnet",
        "finetune": "config/finetune/ucf101_resnet18.jsonnet",
        "pre_extra": "",
        "probe_temporal": "{frame_rate: null}",
        "probe_extra": "",
    },
    "s3dg": {
        "pretrain": "config/pretrain/s3dg.jsonnet",
        "finetune": "config/finetune/ucf101_s3dg.jsonnet",
        "pre_extra": ", spatial_transforms+: {size: 112}",
        "probe_temporal": ("{frame_rate: null, size: 32, "
                           "validate: {stride: 1, n_crop: 1, "
                           "final_n_crop: 2}}"),
        "probe_extra": ", spatial_transforms+: {size: 112}",
    },
}


def run(cmd):
    print("+", " ".join(cmd), file=sys.stderr, flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def final_acc(exp_dir: Path) -> float:
    """Parse the final-validate acc1 from the finetune experiment log."""
    best = None
    for run_dir in sorted(exp_dir.glob("run_*")):
        log = run_dir / "experiment.log"
        if not log.exists():
            continue
        for line in log.read_text().splitlines():
            m = re.search(r"Final validate.*acc1[=:]\s*([0-9.]+)", line)
            if m:
                best = float(m.group(1))
    if best is None:
        raise RuntimeError(f"no final-validate acc1 found under {exp_dir}")
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", type=Path, default=Path("/tmp/transfer_probe"))
    ap.add_argument("--epochs", type=int, default=15,
                    help="MoCo pretrain epochs")
    ap.add_argument("--probe-epochs", type=int, default=12)
    ap.add_argument("--probe-lrs", default="0.01",
                    help="comma-separated probe lr sweep; each arm reports "
                    "its best final acc. Feature scales differ between "
                    "MoCo-init and random-init backbones (measured: s3dg "
                    "MoCo features diverge a lr-0.01 linear probe at step 0, "
                    "loss ~1e11, while random-init converges), so a single "
                    "shared lr is not a fair comparison — sweep and take "
                    "best-per-arm, as SSL linear-eval protocols do")
    ap.add_argument("--skip-pretrain", action="store_true",
                    help="reuse {out}/moco/checkpoint.pth.tar from a "
                    "previous run instead of re-running pretrain.py")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--arch", choices=sorted(_ARCHES), default="resnet18")
    ap.add_argument("--bn-recalib", type=int, default=None,
                    help="precise-BN calibration batches before each probe "
                    "(engines/precise_bn.py). Default: 8 for s3dg, 0 "
                    "otherwise — s3dg's reference BN momentum (0.001, "
                    "s3dg.py:23) leaves running stats near init over a "
                    "short pretrain, and the eval-mode probe forward then "
                    "blows up (round-4 notes: val loss ~1e10 at lr 1e-2 "
                    "AND 1e-3). Applied identically to both arms.")
    ap.add_argument("--cache-device", action="store_true",
                    help="serve every epoch from an HBM-resident cache "
                    "(data/device_cache.py) — bypasses the host link")
    ap.add_argument("--debug", action="store_true",
                    help="pass -d to every CLI (1 epoch, 3 steps): "
                    "validates the composed probe path in minutes, the "
                    "accuracies are meaningless")
    args = ap.parse_args(argv)
    out = args.out
    out.mkdir(parents=True, exist_ok=True)
    arch = _ARCHES[args.arch]
    data = _DATA + (", cache_device: true" if args.cache_device else "")

    pre = out / "moco"
    if args.skip_pretrain:
        if not (pre / "checkpoint.pth.tar").exists():
            ap.error(f"--skip-pretrain: no checkpoint under {pre}")
    else:
        run([sys.executable, "pretrain.py",
             "-c", arch["pretrain"],
             "-e", str(pre), "--seed", str(args.seed),
             *(["-d"] if args.debug else []),
             "-x", "{%s%s, batch_size: 32, num_epochs: %d, "
             "moco+: {k: 4096, packed_frames: true}}"
             % (data, arch["pre_extra"], args.epochs)])

    # measured gotchas (CLAUDE.md, round 2): probe lr 0.05+ diverges on
    # the unnormalized GAP features (use 0.01 + --no-scale-lr), and
    # model_best-by-loss lands on epoch 1 (queue fills -> loss rises,
    # classic MoCo artifact) so probe from the FINAL checkpoint.
    lrs = [float(s) for s in args.probe_lrs.split(",")]
    bn_recalib = (args.bn_recalib if args.bn_recalib is not None
                  else (8 if args.arch == "s3dg" else 0))
    accs, best_lrs = {}, {}
    for name, extra in (("moco", ["--mc", str(pre / "checkpoint.pth.tar")]),
                        ("random", [])):
        for lr in lrs:
            suffix = "" if len(lrs) == 1 else f"_lr{lr:g}"
            exp = out / f"probe_{name}{suffix}"
            probe_x = ("{%s%s, batch_size: 32, num_epochs: %d, "
                       "only_train_fc: true, optimizer+: {lr: %g}, "
                       "bn_recalibrate: %d, "
                       "temporal_transforms+: %s}"
                       % (data, arch["probe_extra"], args.probe_epochs, lr,
                          bn_recalib, arch["probe_temporal"]))
            run([sys.executable, "finetune.py",
                 "-c", arch["finetune"],
                 "-e", str(exp), "--seed", str(args.seed), "--no-scale-lr",
                 *(["-d"] if args.debug else []),
                 "-x", probe_x] + extra)
            acc = final_acc(exp)
            print(f"probe_{name} lr={lr:g}: acc1={acc}", file=sys.stderr)
            if name not in accs or acc > accs[name]:
                accs[name], best_lrs[name] = acc, lr

    print(json.dumps({
        "moco_acc1": accs["moco"],
        "random_acc1": accs["random"],
        "gain": round(accs["moco"] - accs["random"], 2),
        "chance": 10.0,
        "pretrain_epochs": args.epochs,
        "probe_epochs": args.probe_epochs,
        "probe_lrs": lrs,
        "moco_lr": best_lrs["moco"],
        "random_lr": best_lrs["random"],
    }))


if __name__ == "__main__":
    main()
