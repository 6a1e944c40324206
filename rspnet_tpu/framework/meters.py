"""Running-average meters (reference: framework/meters/average.py:4-44).

Values arrive as JAX device scalars from the compiled step; accumulation is
host-side (cheap, avoids device round-trips per log line). ``sync_distributed``
sums across processes for multi-host validation (the reference all_reduces
across NCCL ranks; with a single JAX process the step already computes global
values, so it is a no-op there).
"""
from __future__ import annotations

from typing import Dict, Iterable

import numpy as np


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1) -> None:
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        if self.count == 0:
            return 0.0
        return self.sum / self.count

    def __str__(self) -> str:
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(name=self.name, val=self.val, avg=self.avg)

    def sync_distributed(self) -> None:
        """Sum sum/count across JAX processes (multi-host)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        vals = multihost_utils.process_allgather(
            np.array([self.sum, float(self.count)]))
        total = np.sum(vals, axis=0)
        self.sum = float(total[0])
        self.count = int(total[1])


class MeterGroup:
    """Convenience bundle used by the engines for log lines."""

    def __init__(self, names: Iterable[str], fmt: str = ":.4f"):
        self.meters: Dict[str, AverageMeter] = {
            n: AverageMeter(n, fmt) for n in names}

    def __getitem__(self, name: str) -> AverageMeter:
        return self.meters[name]

    def update(self, values: Dict[str, float], n: int = 1) -> None:
        for k, v in values.items():
            self.meters[k].update(v, n)

    def reset(self) -> None:
        for m in self.meters.values():
            m.reset()

    def sync_distributed(self) -> None:
        for m in self.meters.values():
            m.sync_distributed()

    def __str__(self) -> str:
        return "\t".join(str(m) for m in self.meters.values())


class MetricSpool:
    """Per-step device metric rows, fetched in bounded chunks.

    Engines stack each step's metrics into one [n_metrics] device array and
    fetch in bulk (per-scalar fetches cost a full tunnel round-trip each).
    Fetching once per EPOCH builds one jnp.stack over every step — at K400
    scale a ~2000-operand concat compiled per distinct epoch length, with
    the tail epoch recompiling. Chunking bounds the stacked program at
    ``chunk`` operands (the tail chunk re-compiles once per distinct tail
    length, <= chunk operands) and keeps at most ``chunk`` rows of device
    metrics alive.
    """

    def __init__(self, chunk: int = 256):
        self.chunk = chunk
        self._pending = []   # (device [n_metrics] row, n)
        self._rows = []      # (numpy row, n), already fetched

    def append(self, row, n: int = 1) -> None:
        self._pending.append((row, n))
        if len(self._pending) >= self.chunk:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        import jax.numpy as jnp
        vals = np.asarray(jnp.stack([r for r, _ in self._pending]))
        self._rows.extend(zip(vals, (n for _, n in self._pending)))
        self._pending = []

    def last(self) -> np.ndarray:
        """Latest appended row as numpy (one transfer — the mid-epoch
        log-late pattern)."""
        if self._pending:
            return np.asarray(self._pending[-1][0])
        return self._rows[-1][0]

    def rows(self):
        """Fetch everything still pending; -> list of (numpy_row, n)."""
        self.flush()
        return self._rows
