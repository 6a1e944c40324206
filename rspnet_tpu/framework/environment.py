"""Process environment helpers (reference: framework/utils/environment.py)."""
from __future__ import annotations


def enable_persistent_jit_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes (big-batch train steps
    compile in minutes on the tunneled dev chip; a disk cache makes every
    run after the first start in seconds). No reference counterpart —
    CUDA kernels were precompiled; XLA programs are built per run.

    Disable with RSPNET_JIT_CACHE=0; override the location with
    RSPNET_JIT_CACHE=<dir>.
    """
    import os

    env = os.environ.get("RSPNET_JIT_CACHE")
    if env == "0":
        return
    if env:
        path = env
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache", "rspnet_jax")
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: compile-per-run still works


def ulimit_n_max() -> None:
    """Raise RLIMIT_NOFILE to the hard max (video datasets open many files)."""
    try:
        import resource
        _soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
        resource.setrlimit(resource.RLIMIT_NOFILE, (hard, hard))
    except (ImportError, ValueError, OSError):
        pass


def scale_learning_rate(lr: float, world_size: int, batch_size: int,
                        base_batch_size: int = 64) -> float:
    """Linear LR scaling with global batch
    (reference: framework/utils/environment.py:13-16)."""
    return lr * world_size * batch_size / base_batch_size
