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
    from rspnet_tpu.framework import bootstrap
    args, cfg = bootstrap(argv)

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
