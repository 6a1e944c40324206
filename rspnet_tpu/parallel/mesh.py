"""Mesh + sharding helpers for the data-parallel runtime.

Replaces the reference's process-per-GPU NCCL setup (reference:
pretrain.py:278-283, framework/utils/distributed.py): one JAX process per
host, a 1-D ``data`` mesh across every chip, batches sharded on their leading
axis, model/optimizer state replicated. Multi-host initialization goes
through ``jax.distributed.initialize`` (the TCP free-port rendezvous is
obsolete).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Multi-host initialization (replaces the reference's TCP free-port
    NCCL rendezvous, pretrain.py:278-283, framework/utils/distributed.py).

    On Cloud TPU pods jax.distributed.initialize() autodetects coordinator
    and process ids from the TPU environment; it must run before any other
    JAX call. No-op on single-host (including this dev environment).
    """
    import logging
    import os

    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return  # single-host (TPU_* vars alone are not a reliable signal:
        # single-chip images set several of them)
    try:
        jax.distributed.initialize()
    except Exception as e:  # never break a launch over cluster discovery
        logging.getLogger(__name__).warning(
            "jax.distributed.initialize failed (%s); continuing single-host",
            e)


def create_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n devices (all by default).

    Raises when fewer than ``n_devices`` exist — a silently-shrunk mesh
    would let multi-chip smoke tests "pass" on one device (the reference
    hard-requires >=2 ranks for its collectives, arguments.py:15-21).
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} JAX device(s) exist "
                f"(platform={devices[0].platform}); set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} with JAX_PLATFORMS=cpu to emulate")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def create_mesh_2d(data: int, model: int,
                   axes: tuple = ("data", "model")) -> Mesh:
    """2-D ``data x model`` mesh (SURVEY §2.8's optional second axis —
    used by the K-sharded MoCo queue, moco/sharded_queue.py).

    Devices are taken in the same flat order as create_mesh and reshaped
    row-major, so the flat replica index ``d * model + m`` matches the
    1-D device order (the equality tests in tests/test_sharded_queue.py
    rely on this for identical per-shard RNG folds).
    """
    n = data * model
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"requested a {data}x{model} mesh but only {len(devices)} JAX "
            f"device(s) exist (platform={devices[0].platform}); set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} "
            f"with JAX_PLATFORMS=cpu to emulate")
    return Mesh(np.array(devices[:n]).reshape(data, model), axes)


def mesh_for_args(args, axis: str = "data") -> Mesh:
    """Mesh honoring --ws/--world-size: min(ws, available devices)
    (the reference spawns exactly world_size workers, pretrain.py:336;
    here ws caps the data-parallel width)."""
    ws = getattr(args, "world_size", None)
    n = jax.device_count()
    if ws:
        n = min(int(ws), n)
    return create_mesh(n, axis=axis)


def mesh_for_config(cfg, args) -> Mesh:
    """Mesh selected by the config's ``parallel`` block (SURVEY §2.8).

    ``parallel: {data: D, model: M}`` builds the 2-D data x model mesh that
    shards the MoCo queue over K (moco/sharded_queue.py); ``data`` may be
    omitted (D = available devices / M). Without the block (all
    reference-parity configs) this is exactly ``mesh_for_args`` — a 1-D
    data mesh capped by --ws.
    """
    model = int(cfg.get("parallel.model", 1) or 1)
    data = cfg.get("parallel.data", None)
    avail = jax.device_count()
    ws = getattr(args, "world_size", None)
    if ws:
        avail = min(int(ws), avail)
    if model <= 1:
        # data-only block: an explicit width cap, same as --ws
        if data is not None:
            if int(data) > avail:
                raise ValueError(
                    f"parallel.data={data} exceeds the {avail} usable "
                    f"device(s) (device_count={jax.device_count()}"
                    f"{', --ws=' + str(ws) if ws else ''})")
            return create_mesh(int(data))
        return mesh_for_args(args)
    if data is None:
        if avail % model:
            raise ValueError(
                f"parallel.model={model} does not divide the {avail} "
                f"available device(s); set parallel.data explicitly")
        data = avail // model
    if int(data) * model > avail:
        raise ValueError(
            f"parallel: {{data: {data}, model: {model}}} needs "
            f"{int(data) * model} devices but only {avail} are usable "
            f"(device_count={jax.device_count()}"
            f"{', --ws=' + str(ws) if ws else ''})")
    return create_mesh_2d(int(data), model)


def data_parallel_specs(mesh: Mesh, axis: str = "data"):
    """(batch_spec, replicated_spec) shardings for the mesh."""
    return (NamedSharding(mesh, P(axis)), NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch sharded over the mesh's data axis.

    Single-process: ``batch`` is the global batch; device_put scatters it.
    Multi-process: each host passes only its LOCAL slice (the loader shards
    every global batch by ``jax.process_index()``, data/pipeline.py) and
    the global array is assembled from process-local data — the TPU-native
    replacement for the reference's DistributedSampler + per-rank loaders.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh (every process must
    pass the same values in multi-host)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def fetch_global(x, mesh: Mesh) -> np.ndarray:
    """Device -> host fetch of a (possibly batch-sharded) global array that
    is valid on every process: multi-host inserts an all-gather so each
    host sees the full array (used by retrieval feature export); single
    host is a plain device_get."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def fetch_scalar(x) -> float:
    """Device -> host fetch of one scalar; the ONLY real synchronization
    on the tunneled dev chip.

    ``jax.block_until_ready`` returns there before remote execution
    finishes (measured: a chained matmul loop "achieved" 250x chip peak
    under it), so any timing or completion barrier must be a dependent
    value fetch like this one. Costs one tunnel round trip (~30 ms idle,
    ~1.4 s congested) — batch fetches where possible (see CLAUDE.md).
    """
    return float(np.asarray(x))


def time_enqueued(fn, *args, iters: int = 10) -> float:
    """Fetch-synced wall time per call of ``fn(*args)`` (a jitted program
    returning one fetchable scalar): enqueue ``iters`` in-order calls,
    sync on a dependent fetch of the last output, subtract the fetch
    round-trip.

    The RTT is calibrated on a COMPLETED-BUT-NEVER-FETCHED output:
    re-fetching an already-fetched jax.Array is served from its host-side
    numpy cache (measured 9.2 ms -> 0.03 ms), which silently zeroes the
    calibration and biases every result by +RTT/iters.
    """
    import time

    cals = [fn(*args) for _ in range(3)]   # first call compiles/warms
    out_warm = fn(*args)
    fetch_scalar(out_warm)           # in-order execution: all complete
    rtts = []
    for c in cals:                   # completed, unfetched -> pure RTT
        t0 = time.perf_counter()
        fetch_scalar(c)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)                  # min: a congestion spike in one
    # calibration fetch would otherwise over-subtract (negative results)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_scalar(out)
    return (time.perf_counter() - t0 - rtt) / iters


def local_shard(global_batch_size: int, mesh: Mesh, axis: str = "data") -> int:
    n = mesh.shape[axis]
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by mesh axis "
            f"{axis}={n}")
    return global_batch_size // n
