"""Golden fixed-clip fixtures pinning the FULL inference chain per backbone:

    decode (tests/golden/clip.avi, lossless FFV1)
    -> temporal EvenNCrop (validation center window)
    -> center-max crop box
    -> eval_preprocess (crop + resize + normalize, on device)
    -> backbone forward (f32, CPU backend)

against checked-in expected logits (tests/golden/expected.npz). This is the
BASELINE "outputs bit-matched on fixed clips" contract, end to end — module
level torch parity (test_models.py) can't catch drift in the decode /
temporal / crop / augment stages. Reference chain being pinned:
datasets/classification/video.py:55-80 + the eval transform stack.

Tolerances: everything runs f32 on the CPU backend; a 1e-5 relative band
absorbs XLA instruction-reordering across versions. The decoded frames are
also pinned by checksum so decoder drift is distinguishable from model
drift.

Regenerate after an INTENTIONAL numeric change:
    python tests/golden/make_goldens.py
"""
import hashlib
import zlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspnet_tpu.data import transforms_temporal as T
from rspnet_tpu.data.video_reader import open_video
from rspnet_tpu.models import get_model_class
from rspnet_tpu.ops.augment import _center_max_box, eval_preprocess

GOLDEN_DIR = Path(__file__).resolve().parent / "golden"
VIDEO = GOLDEN_DIR / "clip.avi"
EXPECTED = GOLDEN_DIR / "expected.npz"

# one row per backbone family: (arch, clip_len, crop size)
CASES = [
    ("resnet18", 8, 64),
    ("resnet50", 8, 64),
    ("c3d", 16, 64),
    ("s3dg", 8, 64),
    ("r2plus1d-vcop", 8, 64),
    ("mfnet", 8, 64),
    ("tsm", 8, 64),
    ("torchvision-resnet18", 8, 64),
    ("SLOWFAST_8x8_R50", 8, 64),
]
NUM_CLASSES = 12

# sha256 of the decoded [24, 96, 128, 3] uint8 frames — FFV1 is lossless so
# any decoder change that alters a single byte fails here, separating
# decoder drift from model drift
FRAMES_SHA256 = "d6f8f6db2d24d3fe1e4e639035eb5a1c7cacdf8bb0a31f030264ba53466c5bc3"


def decode_frames() -> np.ndarray:
    with open_video(str(VIDEO)) as vr:
        return vr.get_batch(list(range(vr.num_frames)))


def deterministic_variables(model, shape):
    """Version-stable parameters: flax init supplies the tree structure,
    every leaf is refilled from a path-seeded numpy RandomState (so goldens
    survive jax.random implementation changes)."""
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def fill(path, leaf):
        name = jax.tree_util.keystr(path)
        r = np.random.RandomState(zlib.crc32(name.encode()) & 0x7FFFFFFF)
        a = np.asarray(leaf)
        if name.endswith("'var']"):
            v = 1.0 + 0.05 * r.rand(*a.shape)
        elif name.endswith("'scale']"):
            v = 1.0 + 0.05 * r.randn(*a.shape)
        elif a.ndim >= 2:
            # fan-in scaling keeps activations O(1) through deep stacks, so
            # f32 accumulation-order drift stays inside the test tolerance
            fan_in = int(np.prod(a.shape[:-1]))
            v = r.randn(*a.shape) / np.sqrt(fan_in)
        else:
            v = 0.05 * r.randn(*a.shape)
        return jnp.asarray(v, jnp.float32)

    return jax.tree_util.tree_map_with_path(fill, variables)


def run_chain(arch: str, clip_len: int, size: int) -> np.ndarray:
    frames = decode_frames()
    idx = T.EvenNCrop(clip_len, stride=1, n=1)(np.arange(frames.shape[0]))
    clip = frames[idx]                                  # [T, H, W, 3] uint8
    h, w = clip.shape[1:3]
    box = np.array([_center_max_box(h, w, 1.0)], np.float32)
    x = eval_preprocess(jnp.asarray(clip[None]), box, size=(size, size))
    model = get_model_class(arch)(num_classes=NUM_CLASSES)
    variables = deterministic_variables(model, x.shape)
    out = model.apply(variables, x, train=False)
    return np.asarray(out, np.float32)


def test_decoded_frames_checksum():
    frames = decode_frames()
    assert frames.shape == (24, 96, 128, 3)
    assert hashlib.sha256(frames.tobytes()).hexdigest() == FRAMES_SHA256
    # and the encode itself was lossless vs the pre-encode truth
    truth = np.load(GOLDEN_DIR / "clip_truth.npy")
    np.testing.assert_array_equal(frames, truth)


@pytest.mark.parametrize("arch,clip_len,size", CASES,
                         ids=[c[0] for c in CASES])
def test_golden_forward(arch, clip_len, size):
    expected = np.load(EXPECTED)
    assert arch in expected.files, (
        f"no golden for {arch}; run python tests/golden/make_goldens.py")
    got = run_chain(arch, clip_len, size)
    ref = expected[arch]
    assert got.shape == ref.shape == (1, NUM_CLASSES)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
