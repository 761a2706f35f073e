"""Profiling hooks: jax.profiler traces around hot regions.

The reference's only profiling is ``time.time()`` prints (SURVEY.md §5).
Here: a context manager writing an XLA trace viewable in TensorBoard /
Perfetto, plus a trivial annotation helper.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/stereo_tpu_trace") -> Iterator[None]:
    """Capture a device trace of the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def wall(name: str, sink=print) -> Iterator[None]:
    t0 = time.time()
    yield
    sink(f"{name}: {time.time() - t0:.3f}s")
