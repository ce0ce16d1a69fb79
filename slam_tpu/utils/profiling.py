"""Device-side tracing hooks (jax.profiler).

Complements the host section timers (`utils/timer.py`) — the TPU-side
equivalent of the reference's wall-clock stage timers (SURVEY.md §5
tracing/profiling): capture a trace directory viewable in TensorBoard /
Perfetto, or annotate named regions.
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace around a block.

    Usage::
        with device_trace("/tmp/slam_trace"):
            mapper.advance(mapper_input)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation appearing in device traces."""
    return jax.profiler.TraceAnnotation(name)
