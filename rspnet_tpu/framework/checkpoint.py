"""Checkpoint management with atomic writes and reference-format interop.

Behavior contract (reference: framework/utils/checkpoint.py:13-75):
- latest checkpoint saved atomically (write temp, rename)
- ``model_best.pth.tar`` hard-linked to the latest on improvement
- periodic ``checkpoint_epoch_N.pth.tar`` hard-links every ``keep_interval``

State dicts hold JAX pytrees; serialization is ``.pth.tar`` via torch-cpu so
reference checkpoints can be read and ours can be loaded by the reference
(SURVEY.md §5.4 requires the .pth.tar boundary). Arrays cross the boundary as
numpy; pytree params use ``/``-joined flat names.
"""
from __future__ import annotations

import logging
import os
import threading
from pathlib import Path
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)

# Device->host fetch watchdog (seconds). The 2026-08-17 tunnel wedge hung a
# checkpoint save indefinitely and killed a 30-epoch pretrain; a congested
# but healthy tunnel save measures 63-144 s, so the default leaves slack.
# 0 disables the watchdog (fetch inline).
_SAVE_TIMEOUT_S = float(os.environ.get("RSPNET_SAVE_TIMEOUT", "600"))


def _to_numpy_tree(obj: Any) -> Any:
    """Convert JAX arrays (and scalars) to numpy recursively.

    Device arrays are fetched as ONE flat transfer per dtype (device-side
    concatenate, single device_get, host-side split): a per-leaf
    ``device_get`` pays one tunnel round trip per array (~1.4 s each over
    the axon tunnel; measured 144 s for a 104-leaf ResNet18 state, and
    ``copy_to_host_async`` does NOT overlap there), while the batched fetch
    moves the same bytes in one transfer.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(obj)
    out = list(leaves)
    groups: Dict[Any, list] = {}
    for i, x in enumerate(leaves):
        if hasattr(x, "__array__") and not isinstance(x, np.ndarray):
            groups.setdefault(jnp.result_type(x), []).append(i)
    for idxs in groups.values():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = np.asarray(jax.device_get(leaves[i]))
            continue
        flat = jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs])
        host = np.asarray(jax.device_get(flat))
        offset = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape, dtype=np.int64))
            out[i] = host[offset:offset + n].reshape(leaves[i].shape)
            offset += n
    return treedef.unflatten(out)


def _map_container(obj: Any, fn) -> Any:
    if isinstance(obj, dict):
        return type(obj)((k, fn(v)) for k, v in obj.items())
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # namedtuple
        return type(obj)(*(fn(v) for v in obj))
    if isinstance(obj, (list, tuple)):
        return type(obj)(fn(v) for v in obj)
    return None


def _to_torch_tree(obj: Any) -> Any:
    import torch

    mapped = _map_container(obj, _to_torch_tree)
    if mapped is not None:
        return mapped
    if isinstance(obj, np.ndarray):
        # np.array(copy=True) preserves 0-d shapes; np.ascontiguousarray
        # would promote scalars to shape (1,), corrupting every 0-d leaf
        # (queue_ptr, step counters, opt-state hyperparams)
        return torch.from_numpy(np.array(obj, copy=True, order="C"))
    return obj


def _from_torch_tree(obj: Any) -> Any:
    import torch

    mapped = _map_container(obj, _from_torch_tree)
    if mapped is not None:
        return mapped
    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    return obj


def save_state(state: Dict[str, Any], path: Path) -> None:
    """Serialize a state dict to ``.pth.tar`` (torch zip format)."""
    import torch
    torch.save(_to_torch_tree(_to_numpy_tree(state)), str(path))


def load_state(path: Path) -> Dict[str, Any]:
    """Load a ``.pth.tar`` state dict; tensors come back as numpy arrays.

    Accepts both our checkpoints and reference-produced ones.
    """
    import torch
    state = torch.load(str(path), map_location="cpu", weights_only=False)
    return _from_torch_tree(state)


class CheckpointManager:
    """Keeps the latest / best / periodic checkpoints for one experiment."""

    def __init__(self, experiment_dir: Path, keep_interval=None,
                 filename: str = "checkpoint.pth.tar", milestone: int = 0):
        self.experiment_dir = Path(experiment_dir)
        self.filename = filename
        self.keep_interval = keep_interval
        self.milestone = milestone
        self._wedged_fetch: threading.Thread | None = None

    def _fetch_with_watchdog(self, state: Any, timeout: float):
        """Run the device->host fetch bounded by ``timeout`` seconds.

        A wedged tunnel fetch blocks inside a C call — uninterruptible — so
        the fetch runs in a daemon thread and we bound the join. On timeout
        we return None: the caller skips THIS save and training continues
        (the run stays resumable from the previous atomic checkpoint via
        ``--continue``). While a wedged fetch is still in flight, later
        saves skip WITHOUT issuing a new fetch: on a wedged tunnel every
        extra op just queues behind the stuck one (CLAUDE.md wedge
        protocol).
        """
        if self._wedged_fetch is not None:
            if self._wedged_fetch.is_alive():
                logger.warning(
                    "previous checkpoint fetch still wedged; skipping save "
                    "(no new device work issued)")
                return None
            self._wedged_fetch = None
        box: Dict[str, Any] = {}

        def worker():
            try:
                box["state"] = _to_numpy_tree(state)
            except BaseException as e:  # surfaced to the caller below
                box["error"] = e

        t = threading.Thread(target=worker, daemon=True, name="ckpt-fetch")
        t.start()
        t.join(timeout)
        if t.is_alive():
            self._wedged_fetch = t
            logger.warning(
                "checkpoint device fetch exceeded %.0fs (tunnel wedge?); "
                "skipping this save — training continues, will retry next "
                "epoch", timeout)
            return None
        if "error" in box:
            raise box["error"]
        return box["state"]

    def save(self, state: Dict[str, Any], is_best: bool, epoch: int,
             timeout: float = None) -> bool:
        """Returns True if the checkpoint was written (rank 0) or fetched
        (other ranks); False if the save was skipped by the watchdog."""
        rank = 0
        try:
            import jax
            rank = jax.process_index()
        except ImportError:
            pass
        # The device->host conversion runs on EVERY process: _to_numpy_tree
        # issues a device-side jnp.concatenate over (replicated) global
        # arrays, and multi-controller JAX cannot execute a computation
        # entered by only one process. Only the file WRITE is rank-0-only
        # (reference pretrain.py:238-260; state is replicated, so process
        # 0's copy is the state).
        timeout = _SAVE_TIMEOUT_S if timeout is None else timeout
        if timeout > 0:
            state = self._fetch_with_watchdog(state, timeout)
            if state is None:
                return False
        else:
            state = _to_numpy_tree(state)
        if rank != 0:
            return True
        checkpoint_path = self.experiment_dir / self.filename
        temp_path = self.experiment_dir / f".next.{self.filename}"

        logger.info('Saving checkpoint to "%s"', checkpoint_path)
        try:
            save_state(state, temp_path)
        except BaseException:
            if temp_path.exists():
                temp_path.unlink()
            raise
        temp_path.rename(checkpoint_path)
        logger.info("Checkpoint saved")

        if is_best:
            best_path = self.experiment_dir / "model_best.pth.tar"
            logger.info('Saving best model to "%s"', best_path)
            if best_path.exists():
                best_path.unlink()
            os.link(checkpoint_path, best_path)

        if (self.keep_interval is not None and epoch % self.keep_interval == 0
                and epoch > self.milestone):
            keep_path = self.experiment_dir / f"checkpoint_epoch_{epoch}.pth.tar"
            logger.info('Keep checkpoint "%s"', keep_path)
            if keep_path.exists():
                keep_path.unlink()
            os.link(checkpoint_path, keep_path)
        return True
