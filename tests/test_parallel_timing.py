"""parallel.time_enqueued: fetch-synced timing protocol.

The contract (CLAUDE.md TIMING TRAP): enqueue iters in-order calls,
sync on a dependent fetch, subtract a fetch RTT calibrated on
completed-but-NEVER-fetched outputs — re-fetching a fetched jax.Array
is served from its host-side numpy cache and reads ~0, which would
bias every result by +RTT/iters.
"""
import jax
import jax.numpy as jnp

from rspnet_tpu.parallel import time_enqueued


def test_time_enqueued_protocol_and_result():
    calls = []

    @jax.jit
    def fn(x):
        return jnp.sum(x * 2.0)

    def counted(x):
        calls.append(1)
        return fn(x)

    x = jnp.ones((8, 8), jnp.float32)
    dt = time_enqueued(counted, x, iters=5)
    # 3 calibration outputs + 1 sync output + 5 timed calls
    assert len(calls) == 9
    # wall-clock per call is positive and sane (CPU: microseconds; the
    # RTT subtraction must not drive it hugely negative)
    assert dt > -1e-3
    assert dt < 5.0


def test_time_enqueued_scales_with_work():
    @jax.jit
    def small(x):
        return jnp.sum(x)

    @jax.jit
    def big(x):
        y = x
        for _ in range(30):
            y = y @ x
        return jnp.sum(y)

    x = jnp.ones((256, 256), jnp.float32)
    t_small = time_enqueued(small, x, iters=3)
    t_big = time_enqueued(big, x, iters=3)
    assert t_big > t_small
