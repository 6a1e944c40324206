"""RSPNet-TPU CAM visualization CLI (reference: visualization.py:114-169).

Renders per-head CAM heatmaps for query/key clips of a MoCo checkpoint.
"""
import logging
import sys

logger = logging.getLogger(__name__)


def main(argv=None):
    from rspnet_tpu.framework import bootstrap
    args, cfg = bootstrap(argv)

    from rspnet_tpu.engines.visualization import VisualizationEngine
    engine = VisualizationEngine(args, cfg)
    if args.moco_checkpoint:
        engine.load_moco_checkpoint(args.moco_checkpoint)
    n = engine.visual_epoch()
    logger.info("CAM visualization done (%d images)", n)


if __name__ == "__main__":
    main(sys.argv[1:])
