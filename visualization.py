"""RSPNet-TPU CAM visualization CLI (reference: visualization.py:114-169).

Renders per-head CAM heatmaps for query/key clips of a MoCo checkpoint.
"""
import logging
import sys

logger = logging.getLogger(__name__)


def main(argv=None):
    from rspnet_tpu.config import get_config, save_config
    from rspnet_tpu.framework import (Args, initialize_seed,
                                      set_logging_basic_config, ulimit_n_max,
                                      enable_persistent_jit_cache)
    from rspnet_tpu.framework.code_pack import pack_code

    from rspnet_tpu.parallel import init_distributed
    init_distributed()  # multi-host no-op on single host

    args = Args.from_args(argv)
    args.resolve_continue()
    args.make_run_dir()
    if args.run_dir is None:
        raise SystemExit("an experiment dir is required (-e)")
    args.save()
    set_logging_basic_config(args.run_dir, debug=args.debug)
    pack_code(args.run_dir)
    ulimit_n_max()
    enable_persistent_jit_cache()

    cfg = get_config(args)
    cfg.put("seed", args.seed if args.seed is not None else 0)
    save_config(args, cfg)
    initialize_seed(args.seed)

    from rspnet_tpu.engines.visualization import VisualizationEngine
    engine = VisualizationEngine(args, cfg)
    if args.moco_checkpoint:
        engine.load_moco_checkpoint(args.moco_checkpoint)
    n = engine.visual_epoch()
    logger.info("CAM visualization done (%d images)", n)


if __name__ == "__main__":
    main(sys.argv[1:])
