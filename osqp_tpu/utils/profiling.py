"""Profiling hooks (SURVEY.md §5 tracing/profiling).

The reference surfaces only C-side phase timers (CInfo, types.jl:92-96);
those are mirrored in :class:`osqp_tpu.types.Info`. This module adds the
TPU-native extra: JAX profiler traces viewable in TensorBoard/Perfetto.

Note the survey's caveat: under jit, host-side timing must wrap
``block_until_ready`` — all Info timers in this package do.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager capturing a JAX profiler trace of the enclosed solves::

        with profiling.trace("/tmp/qp-trace"):
            solver.solve(...)
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler span (jax.profiler.TraceAnnotation passthrough)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
