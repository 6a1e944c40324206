"""RSPNet-TPU retrieval CLI (reference: retrieval.py:188-243).

Frozen-feature video retrieval: extract features with a pretrained backbone
(--mc MoCo checkpoint) and report R@{1,5,10,20,50}.
"""
import logging
import sys

logger = logging.getLogger(__name__)


def main(argv=None):
    from rspnet_tpu.framework import bootstrap
    args, cfg = bootstrap(argv)

    from rspnet_tpu.engines.retrieval import RetrievalEngine
    engine = RetrievalEngine(args, cfg)
    if args.moco_checkpoint:
        engine.load_moco_checkpoint(args.moco_checkpoint)
    elif args.load_model:
        engine.load_model_checkpoint(args.load_model)
    results = engine.run()
    print(results)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
