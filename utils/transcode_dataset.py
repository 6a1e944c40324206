"""Re-encode a video dataset for cheap decode (reference:
utils/transcode_dataset.py).

Same recipe as the reference: H.264, 256p, dense keyframes (g=16),
fastdecode tuning, audio stripped — this is what makes the training-time
seek+decode path fast. Runs an async pool of ffmpeg processes.

Usage: python utils/transcode_dataset.py INPUT_DIR OUTPUT_DIR [-j N]
"""
import argparse
import asyncio
import logging
import shutil
import sys
from pathlib import Path

from tqdm import tqdm

logger = logging.getLogger(__name__)

FFMPEG_ARGS = [
    "-loglevel", "warning",
    "-c:v", "libx264",
    "-filter:v", "scale=w=-2:h=256",
    "-g", "16",
    "-tune", "fastdecode",
    "-an",
]


async def transcode(raw_video: Path, input_dir: Path, output_dir: Path):
    output = (output_dir / raw_video.relative_to(input_dir)).with_suffix(".mp4")
    output.parent.mkdir(parents=True, exist_ok=True)
    if output.exists():
        logger.warning("Skipping existing %s", output)
        return
    proc = await asyncio.create_subprocess_exec(
        "ffmpeg", "-i", str(raw_video), *FFMPEG_ARGS, str(output))
    if await proc.wait() != 0:
        logger.error("Transcode %s failed", raw_video)


async def run(args):
    videos = sorted(list(args.input.glob("**/*.mp4"))
                    + list(args.input.glob("**/*.avi"))
                    + list(args.input.glob("**/*.webm")))
    tasks = set()
    with tqdm(total=len(videos)) as progress:
        while videos or tasks:
            while len(tasks) < args.jobs and videos:
                tasks.add(asyncio.create_task(
                    transcode(videos.pop(), args.input, args.output)))
            done, tasks = await asyncio.wait(
                tasks, return_when=asyncio.FIRST_COMPLETED)
            for t in done:
                await t
                progress.update()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input", type=Path)
    parser.add_argument("output", type=Path)
    parser.add_argument("-j", "--jobs", type=int, default=16)
    args = parser.parse_args()
    if shutil.which("ffmpeg") is None:
        sys.exit("ffmpeg binary not found on PATH; install it to transcode "
                 "(decode at train time does NOT need it — the native "
                 "reader links libav directly)")
    logging.basicConfig(level=logging.INFO)
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
