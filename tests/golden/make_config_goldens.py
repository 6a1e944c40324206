"""Generate the golden config manifests (tests/golden/configs/*.json).

Run once, review the output by hand (they are the frozen, human-checked
record of what every entry config + mixin composes to), and commit. The
parity test compares live evaluation against these fixtures so a
mini-jsonnet evaluator bug cannot silently change both sides of the
same-engine reference comparison (VERDICT r2 weak-#4).

Usage: python tests/golden/make_config_goldens.py
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
TESTS = os.path.dirname(HERE)
REPO = os.path.dirname(TESTS)
sys.path[:0] = [REPO, TESTS]

from rspnet_tpu.config import load_config  # noqa: E402
from config_manifest_lists import (ENTRY_CONFIGS, FINETUNE_MIXINS,  # noqa
                                   PRETRAIN_MIXINS, golden_name)


def main():
    out_dir = os.path.join(HERE, "configs")
    os.makedirs(out_dir, exist_ok=True)
    jobs = [(rel, []) for rel in ENTRY_CONFIGS]
    jobs += [("pretrain/s3dg.jsonnet", [m]) for m in PRETRAIN_MIXINS]
    jobs += [("finetune/ucf101_c3d.jsonnet", [m]) for m in FINETUNE_MIXINS]
    for rel, ext in jobs:
        cfg = load_config(os.path.join(REPO, "config", rel), list(ext))
        path = os.path.join(out_dir, golden_name(rel, ext))
        with open(path, "w") as f:
            json.dump(cfg.as_plain_dict(), f, indent=2, sort_keys=True)
            f.write("\n")
        print(path)


if __name__ == "__main__":
    main()
