"""Profiling/tracing hooks (the aux 'tracing' subsystem; SURVEY.md §5).

The reference has only the section timer; for TPU runs we additionally
expose ``jax.profiler`` traces so kernels can be inspected in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str = "/tmp/pps_trace"):
    """Capture a device trace around a code block::

        with profiling.trace("/tmp/trace"):
            solver.solve(f).x.block_until_ready()
    """
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for a region (shows up in the trace viewer)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
