"""RSPNet-TPU pretraining CLI (reference: pretrain.py:309-336).

Same flags as the reference: -c CONFIG -e EXPDIR [-x EXT ...] [-d]
[--load-checkpoint CKPT] [--load-model CKPT] [--seed N] [--ws N]
[--continue] [--no-scale-lr] [--validate].

One process drives every local TPU chip through a data mesh (no mp.spawn /
NCCL rendezvous; see SURVEY.md §5.8).
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

    from rspnet_tpu.engines.pretrain import PretrainEngine
    engine = PretrainEngine(args, cfg)
    if args.load_checkpoint:
        engine.load_checkpoint(args.load_checkpoint)
    elif args.load_model:
        engine.load_checkpoint(args.load_model, model_only=True)

    if args.validate:
        logger.info("--validate: running a single no-grad statistics epoch")
        try:
            engine.validate_epoch()
        finally:
            engine.close()
        return

    engine.run()


if __name__ == "__main__":
    main(sys.argv[1:])
