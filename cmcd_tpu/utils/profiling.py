"""Profiling hooks (new vs the reference, which has none — SURVEY.md §5).

Thin wrappers over jax.profiler so training/eval phases can be traced and
inspected with TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in traces: with annotate('evolve'): ..."""
    return jax.profiler.TraceAnnotation(name)
