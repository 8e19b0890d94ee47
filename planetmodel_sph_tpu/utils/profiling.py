"""Profiling helpers — the jax.profiler analog of the Unity Profiler flow.

The reference's observability is the Unity Profiler plus a stats Debug.Log
every 100 updates (``KernelSystem.cs:59-74``). Here: a context manager that
captures a jax.profiler trace viewable in TensorBoard/Perfetto, and a
steps/sec meter that forces completion through a scalar readback (plain
``block_until_ready`` can under-report on relay-backed remote devices).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/psph_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def steps_per_sec(run_fn, state, n_steps: int, warmup: int = 1):
    """Time `run_fn(state, n_steps)`; returns (steps/s, final_state).

    Forces device completion via a scalar reduction readback.
    """
    out = run_fn(state, warmup)
    float(jnp.sum(out.pos))
    t0 = time.perf_counter()
    out = run_fn(state, n_steps)
    float(jnp.sum(out.pos))
    dt = time.perf_counter() - t0
    return n_steps / dt, out
