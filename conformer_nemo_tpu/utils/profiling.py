"""Profiling hooks.

The reference delegates to the PTL profiler (SURVEY.md §5.1); the TPU-native
equivalent is `jax.profiler` traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace around a code region.

    Usage:
        with profile_trace("exp/profile"):
            for _ in range(5):
                state, m = step(state, batch)
            float(m["loss"])
    """
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (TraceAnnotation) usable inside host loops."""
    import jax

    return jax.profiler.TraceAnnotation(name)
