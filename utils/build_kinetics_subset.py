"""Build Kinetics-100 from Kinetics-400 via symlinks (reference:
utils/build_kinetics_subset.py).

Picks the N classes with the smallest total video size (the reference's
selection rule, :25-33) and symlinks their train/val dirs into a new root.

Usage: python utils/build_kinetics_subset.py [-n 100]
       [--train_full data/kinetics400/train_video] [...]
"""
import argparse
import logging
import os
from pathlib import Path
from typing import List

logger = logging.getLogger(__name__)


def find_smallest_categories(path: Path, num_category: int) -> List[str]:
    sizes = []
    for category_path in sorted(path.iterdir()):
        if not category_path.is_dir():
            continue
        total = sum(v.stat().st_size for v in category_path.iterdir())
        sizes.append((total, category_path.name))
        logger.info('Category "%s": %d bytes', category_path.name, total)
    return [name for _, name in sorted(sizes)[:num_category]]


def build_subset(fullset_path: Path, dest_path: Path, categories) -> None:
    dest_path.mkdir(parents=True)
    rel_root = Path(os.path.relpath(fullset_path.absolute(), dest_path))
    for c in categories:
        (dest_path / c).symlink_to(rel_root / c, target_is_directory=True)


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", "--num_category", type=int, default=100)
    parser.add_argument("--train_full", type=Path,
                        default=Path("data/kinetics400/train_video"))
    parser.add_argument("--train_dest", type=Path,
                        default=Path("data/kinetics100_links/train_video"))
    parser.add_argument("--val_full", type=Path,
                        default=Path("data/kinetics400/val_video"))
    parser.add_argument("--val_dest", type=Path,
                        default=Path("data/kinetics100_links/val_video"))
    args = parser.parse_args()

    categories = find_smallest_categories(args.train_full, args.num_category)
    logger.info("Building train subset (%d classes)", len(categories))
    build_subset(args.train_full, args.train_dest, categories)
    logger.info("Building val subset")
    build_subset(args.val_full, args.val_dest, categories)
    link = args.train_dest.parent.parent / "kinetics100"
    if not link.exists():
        link.symlink_to(args.train_dest.parent.name)


if __name__ == "__main__":
    main()
