"""Shared CLI bootstrap: the identical run-dir/config/seed sequence the
four entry points (pretrain/finetune/retrieval/visualization) previously
each carried a private copy of.

Seed contract: when --seed is omitted, ONE random seed is drawn here and
recorded everywhere — args.seed, the config (hence config.json), host
RNGs, and the returned state — so a run without --seed is still fully
reproducible from its saved config. (Previously host RNGs drew a random
seed while every device-side RNG silently used 0 and config.json claimed
seed=0: half-deterministic runs with a misleading provenance record.)
"""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def _honor_jax_platforms_env():
    """Make `JAX_PLATFORMS=cpu python pretrain.py ...` actually run on CPU.

    The axon TPU plugin force-rewrites jax_platforms to "axon,cpu" at
    import time, clobbering the env var (CLAUDE.md); tests/conftest.py and
    __graft_entry__ re-pin it but the CLIs did not — so a user asking for
    the CPU backend silently got the TPU (and hung when the tunnel was
    wedged). Pin the config back to whatever the user exported.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    jax.config.update("jax_platforms", want)


def bootstrap(argv=None):
    """Parse args, prepare the run dir, load config, seed. -> (args, cfg)"""
    import random

    from ..config import get_config, save_config
    from ..parallel import init_distributed
    from . import (Args, enable_persistent_jit_cache, initialize_seed,
                   set_logging_basic_config, ulimit_n_max)
    from .code_pack import pack_code

    _honor_jax_platforms_env()
    init_distributed()  # multi-host no-op on single host

    args = Args.from_args(argv)
    args.resolve_continue()        # --continue can supply the config
    if args.config is None:
        raise SystemExit("a config file is required (-c)")
    args.make_run_dir()
    if args.run_dir is None:
        raise SystemExit("an experiment dir is required (-e)")
    args.save()
    set_logging_basic_config(args.run_dir, debug=args.debug)
    pack_code(args.run_dir)
    ulimit_n_max()
    enable_persistent_jit_cache()

    if args.seed is None:
        args.seed = random.SystemRandom().randrange(2 ** 31)
        logger.info("no --seed given: drew %d (recorded in config.json)",
                    args.seed)

    cfg = get_config(args)
    cfg.put("seed", args.seed)
    save_config(args, cfg)
    initialize_seed(args.seed)
    return args, cfg
