"""jax.profiler trace hooks (SURVEY.md §5: per-stage timers + trace hooks)."""
from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # with annotate("stage"): ...
