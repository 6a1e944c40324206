"""Scan a dataset for corrupt/empty videos (reference: utils/verify_video.py).

Prints relative paths of failing videos for the `dataset.blacklist` config
key (consumed at rspnet_tpu/data/catalogs.py Kinetics).

TPU-native twist: instead of shelling out to ffprobe (absent here), videos
are opened with the same decoder the training pipeline uses (native C++
FFmpeg reader, cv2 fallback) — so "verified" means *actually decodable by
training*, a strictly stronger check than ffprobe metadata.

Usage: python utils/verify_video.py INPUT_DIR [-j N] [--decode-frames K]
"""
import argparse
import logging
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from tqdm import tqdm

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logger = logging.getLogger(__name__)


def verify_one(video_path: Path, decode_frames: int) -> bool:
    from rspnet_tpu.data.video_reader import open_video
    try:
        with open_video(str(video_path)) as vr:
            if vr.num_frames <= 0:
                return False
            if decode_frames > 0:
                idx = [0, vr.num_frames // 2, vr.num_frames - 1][:decode_frames]
                frames = vr.get_batch(idx)
                if frames.shape[0] != len(idx):
                    return False
        return True
    except Exception as e:
        logger.debug("%s failed: %s", video_path, e)
        return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", type=Path)
    parser.add_argument("-j", "--jobs", type=int, default=32)
    parser.add_argument("--decode-frames", type=int, default=3,
                        help="frames to actually decode per video (0 = "
                        "metadata only)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    videos = sorted(list(args.input.glob("**/*.mp4"))
                    + list(args.input.glob("**/*.avi"))
                    + list(args.input.glob("**/*.webm")))
    failed = []
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        results = list(tqdm(
            pool.map(lambda p: (p, verify_one(p, args.decode_frames)),
                     videos),
            total=len(videos), smoothing=0.1))
    failed = [p for p, ok in results if not ok]

    print("The following video failed the test: ")
    for p in failed:
        print(p.relative_to(args.input))
    return failed


if __name__ == "__main__":
    main()
