"""Profiling/tracing: device traces, op timing, and roofline estimates
(the aux 'tracing' subsystem; SURVEY.md §5).

The reference has only the MPI-synchronized section timer; here we add

* ``trace`` / ``annotate`` — ``jax.profiler`` capture for TensorBoard/
  Perfetto inspection of the compiled kernels;
* ``time_op`` — robust wall timing of a jitted callable (warm-up +
  ``block_until_ready``), both dispatch-bound (per call) and in-graph
  (``fori_loop``-chained) variants;
* ``op_report`` — per-core-op timing table of a Level (interpolate /
  stencil / patch solve / smooth / full apply) with bandwidth-roofline
  percentages, the honest counterpart of BASELINE's "per-kernel
  speed-of-light" requirement.

``scripts/profile_ops.py`` is the CLI for these.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict, Optional


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


def time_op(fn: Callable, *args, reps: int = 200, in_graph: bool = False,
            trials: int = 3, hbm_rotate: int = 0):
    """Seconds per call of ``fn(*args)`` after a compile/warm-up call.

    ``in_graph=True`` chains ``reps`` calls inside one jitted loop with a
    *dynamic* trip count and returns ``(t(reps) - t(0)) / reps`` — the
    zero-trip execution of the same program calibrates out the fixed
    program-launch cost, which on the tunneled TPU backend is ~20-25 ms
    per execution and otherwise swamps every sub-millisecond op (this is
    exactly what made OP_REPORT_r3's per-op numbers a flat ~1.2 ms floor
    at reps=20).  The steady-state number reflects loop-resident operands
    (VMEM-cached where they fit).  Without ``in_graph`` each rep is a
    separate dispatch.

    ``hbm_rotate=B`` (with ``in_graph``) is the HBM-forced variant: the
    loop carries ``B`` distinct live copies of the primary operand and
    each iteration consumes the oldest, so with ``B * field_bytes``
    larger than VMEM the op's input streams from HBM every iteration —
    the pessimistic counterpart of the VMEM-optimistic steady state.
    Pick ``B`` so the rotation set is several times VMEM (16 MiB/core on
    v5e for arrays; ``op_report`` sizes it automatically).
    """
    import jax

    if in_graph:
        import jax.numpy as jnp

        B = max(int(hbm_rotate), 0)
        if B > 1:
            # a stacked ring buffer updated in place: while_loop carries
            # pin each component to a fixed buffer, so rotating a TUPLE
            # of carries copies every buffer per iteration (measured:
            # a flat ~0.5 ms floor that swamped the op).  Reading slot
            # i%B and writing it back gives a reuse distance of B
            # iterations — with B*field > VMEM every read streams from
            # HBM, and the dynamic slice/update fuses with the op.
            stack = jnp.stack(
                [args[0] * (1.0 + 1e-7 * i) for i in range(B)]
            )
            jax.block_until_ready(stack)

            @jax.jit
            def loop(st, n):
                def body(i, st):
                    k = jax.lax.rem(i, jnp.asarray(B, i.dtype))
                    x = jax.lax.dynamic_index_in_dim(st, k, keepdims=False)
                    out = fn(x, *args[1:])
                    if out.shape != x.shape:
                        # scalar data dependency only — a mean reduction
                        # here costs a full extra pass over the output
                        out = x + out.ravel()[0] * 1e-30
                    return jax.lax.dynamic_update_index_in_dim(st, out, k, 0)

                return jax.lax.fori_loop(0, n, body, st)

            arg0 = stack
        else:

            @jax.jit
            def loop(x, n):
                def body(i, v):
                    out = fn(v, *args[1:])
                    if out.shape == v.shape:
                        return out
                    # shape-changing op: scalar data dependency so XLA
                    # cannot dead-code-eliminate it (a mean here costs a
                    # full extra pass over the output)
                    return v + out.ravel()[0] * 1e-30

                return jax.lax.fori_loop(0, n, body, x)

            arg0 = args[0]

        jax.block_until_ready(loop(arg0, reps))  # compile + warm
        jax.block_until_ready(loop(arg0, 0))
        best_base = best_full = float("inf")
        for _ in range(trials):
            t0 = time.time()
            jax.block_until_ready(loop(arg0, 0))
            best_base = min(best_base, time.time() - t0)
            t0 = time.time()
            jax.block_until_ready(loop(arg0, reps))
            best_full = min(best_full, time.time() - t0)
        # min each leg separately: min over per-trial deltas is biased by
        # launch-cost jitter (one slow base run makes the delta negative)
        delta = best_full - best_base
        if delta <= 0:
            # noise-dominated: the op is cheaper than launch jitter —
            # flag the measurement instead of reporting an absurd number
            return float("nan")
        return delta / reps

    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


#: rough peak HBM bandwidth per chip, bytes/s (for roofline %)
HBM_BYTES_PER_S = {
    "TPU v5 lite": 819e9,  # v5e
    "TPU v4": 1200e9,
    "TPU v6": 1640e9,  # trillium
    "cpu": 50e9,
}


def _device_bw() -> float:
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "cpu")
    for k, v in HBM_BYTES_PER_S.items():
        if kind.startswith(k):
            return v
    return HBM_BYTES_PER_S["cpu"]


def op_report(level, reps: int = 20, hbm_force: bool = False,
              vmem_bytes: float = 64e6) -> Dict[str, dict]:
    """Timing + roofline table of a Level's core ops.

    Roofline bytes are the *algorithmically required* traffic (read the
    input patch field once, write the output once) — intermediate
    materializations count against the achieved fraction, which is the
    point: it measures how far the compiled pipeline is from
    speed-of-light for the op's useful data.

    ``hbm_force=True`` adds a ``<op>_hbm`` row per op timed with a
    rotation set of live input buffers several times larger than VMEM
    (``time_op(hbm_rotate=...)``), so the primary operand streams from
    HBM each iteration — corroborating the VMEM-optimistic steady-state
    numbers.
    """
    import jax.numpy as jnp
    import numpy as np

    bw = _device_bw()
    itemsize = jnp.dtype(level.dtype).itemsize
    cells = level.P * level.pl.cells_per_patch
    field_bytes = cells * itemsize
    rng = np.random.default_rng(0)
    u = jnp.asarray(
        rng.standard_normal((level.P,) + level.pl.ns_shape), dtype=level.dtype
    )
    g = jnp.asarray(
        rng.standard_normal((max(level.num_ifaces, 1), level.m)),
        dtype=level.dtype,
    )
    nnz = (2 * level.D + 1) * cells

    out: Dict[str, dict] = {}

    def add(name, fn, args, bytes_needed, nnz_count=None):
        in_graph = args[0].shape == u.shape
        t = time_op(fn, *args, reps=reps, in_graph=in_graph)
        rec = {
            "ms": round(t * 1e3, 6),
            "roofline_pct": round(100 * bytes_needed / bw / t, 2),
        }
        if nnz_count:
            rec["gnnz_per_s"] = round(nnz_count / t / 1e9, 2)
        out[name] = rec
        if hbm_force and in_graph:
            B = max(3, int(4 * vmem_bytes / max(field_bytes, 1)) + 1)
            th = time_op(fn, *args, reps=reps, in_graph=True, hbm_rotate=B)
            out[name + "_hbm"] = {
                "ms": round(th * 1e3, 6),
                "roofline_pct": round(100 * bytes_needed / bw / th, 2),
                "rotation_buffers": B,
            }

    add("interpolate", level.interpolate, (u,), 2 * field_bytes)
    add("apply", level.apply, (u,), 2 * field_bytes, nnz)
    add("patch_solve", lambda x: level.patch_solve(x, g), (u,), 2 * field_bytes)
    add("smooth", lambda x: level.smooth(x, x), (u,), 3 * field_bytes)
    return out
