"""Regenerate tests/golden/expected.npz (run on the CPU backend, f32).

Only run this after an INTENTIONAL numeric change to the decode / temporal /
crop / augment / forward chain, and say why in the commit message.
"""
import hashlib
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests.test_golden import (CASES, EXPECTED, decode_frames,  # noqa: E402
                               run_chain)


def main():
    frames = decode_frames()
    print("frames sha256:", hashlib.sha256(frames.tobytes()).hexdigest())
    out = {}
    for arch, clip_len, size in CASES:
        out[arch] = run_chain(arch, clip_len, size)
        print(f"{arch}: logits[0,:3] = {out[arch][0, :3]}")
    np.savez(EXPECTED, **out)
    print("wrote", EXPECTED)


if __name__ == "__main__":
    main()
