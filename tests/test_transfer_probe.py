"""Orchestration tests for utils/transfer_probe.py (no device work).

The probe is the in-environment stand-in for the reference's UCF101/HMDB51
transfer experiments (reference README.md quotes MoCo-pretrained linear-probe
gains; BASELINE.md carries the targets). These tests mock the CLI runner and
pin the sweep/skip logic: a lr sweep must run every (arm, lr) combination,
report best-per-arm, and --skip-pretrain must reuse an existing checkpoint.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "utils"))
import transfer_probe  # noqa: E402


@pytest.fixture
def fake_cli(monkeypatch, tmp_path):
    """Replace subprocess CLI calls + log parsing with an in-memory fake."""
    calls = []
    accs = {}  # exp-dir name -> acc to report

    def fake_run(cmd):
        calls.append(cmd)
        # emulate the CLI creating the experiment dir
        e = cmd[cmd.index("-e") + 1]
        Path(e).mkdir(parents=True, exist_ok=True)
        if "pretrain.py" in cmd[1]:
            (Path(e) / "checkpoint.pth.tar").write_bytes(b"ckpt")

    def fake_final_acc(exp_dir):
        return accs[Path(exp_dir).name]

    monkeypatch.setattr(transfer_probe, "run", fake_run)
    monkeypatch.setattr(transfer_probe, "final_acc", fake_final_acc)
    return calls, accs


def _parse_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_lr_sweep_best_per_arm(fake_cli, tmp_path, capsys):
    calls, accs = fake_cli
    accs.update({
        "probe_moco_lr0.01": 12.0,
        "probe_moco_lr0.001": 40.0,   # moco needs the smaller lr
        "probe_random_lr0.01": 35.0,  # random prefers the bigger one
        "probe_random_lr0.001": 20.0,
    })
    transfer_probe.main(["--out", str(tmp_path), "--arch", "s3dg",
                         "--probe-lrs", "0.01,0.001"])
    res = _parse_json(capsys)
    assert res["moco_acc1"] == 40.0 and res["moco_lr"] == 0.001
    assert res["random_acc1"] == 35.0 and res["random_lr"] == 0.01
    assert res["gain"] == 5.0
    # 1 pretrain + 2 arms x 2 lrs
    finetunes = [c for c in calls if "finetune.py" in c[1]]
    assert len(finetunes) == 4
    # each finetune override carries its own lr
    lrs = sorted(c[c.index("-x") + 1].count("lr: 0.001") for c in finetunes)
    assert lrs == [0, 0, 1, 1]
    # the moco arm (and only it) passes --mc
    assert sum("--mc" in c for c in finetunes) == 2


def test_single_lr_keeps_legacy_dir_names(fake_cli, tmp_path, capsys):
    calls, accs = fake_cli
    accs.update({"probe_moco": 30.0, "probe_random": 20.0})
    transfer_probe.main(["--out", str(tmp_path)])
    res = _parse_json(capsys)
    assert res["gain"] == 10.0 and res["probe_lrs"] == [0.01]


def test_skip_pretrain(fake_cli, tmp_path, capsys):
    calls, accs = fake_cli
    accs.update({"probe_moco": 1.0, "probe_random": 2.0})
    (tmp_path / "moco").mkdir()
    (tmp_path / "moco" / "checkpoint.pth.tar").write_bytes(b"ckpt")
    transfer_probe.main(["--out", str(tmp_path), "--skip-pretrain"])
    assert not any("pretrain.py" in c[1] for c in calls)
    assert _parse_json(capsys)["gain"] == -1.0


def test_skip_pretrain_requires_checkpoint(fake_cli, tmp_path):
    with pytest.raises(SystemExit):
        transfer_probe.main(["--out", str(tmp_path), "--skip-pretrain"])
