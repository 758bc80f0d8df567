"""Decompose the IR solve's wall time at bench size.

Accounting gap: solve_s ~ launch (~24 ms) + inner_iters x (2 V-cycles +
2 applies + BLAS1 ~ 5.8 ms) + an unexplained ~25 ms per outer round.
This times, with the calibrated in-graph timer:

  * the f64 composite apply (the outer residual update),
  * one full inner solve at a FIXED iteration count (while_loop),
  * one outer-round body (inner solve + f64 residual update + norms),

so the fixed per-outer cost can be attributed.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/solve_anatomy.py
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pressurepoissonsolver_tpu.domain import DomainHierarchy
from pressurepoissonsolver_tpu.geometry import Tree, refined_tree
from pressurepoissonsolver_tpu.gmg import CycleOpts
from pressurepoissonsolver_tpu.krylov import bicgstab
from pressurepoissonsolver_tpu.problems import get_problem, init_problem
from pressurepoissonsolver_tpu.solver import PoissonSolver, SolveOptions
from pressurepoissonsolver_tpu.utils import profiling


def main():
    divide = int(os.environ.get("PPS_ANATOMY_DIVIDE", "3"))
    n = int(os.environ.get("PPS_ANATOMY_N", "16"))
    try:
        tree = Tree.from_file("/root/reference/apps/2d/meshes/multi_refine_8.bin", 2)
    except FileNotFoundError:
        tree = refined_tree(2, 5, 2)
    for _ in range(divide):
        tree.refine_leaves()
    h = DomainHierarchy(tree, n=n)
    opts = SolveOptions(
        tol=1e-10, dtype=jnp.float64, precond_dtype=jnp.float32,
        gmg=CycleOpts(pre_sweeps=2, fac_smoothing="active"),
    )
    s = PoissonSolver(h, opts)
    f_np, _ = init_problem(h.finest, get_problem("trig", 2))
    f = jnp.asarray(f_np)
    f32 = f.astype(jnp.float32)
    low = s.gmg.levels[0]
    apply64 = s.fine_level.apply
    M = s.gmg.apply

    def add(name, fn, *args, reps=100):
        t = profiling.time_op(fn, *args, reps=reps, in_graph=True)
        print(f"{name:28s} {t*1e3:9.3f} ms", flush=True)
        return t

    add("apply64", apply64, f)
    add("apply32", low.apply, f32)
    add("vcycle32", M, f32, reps=50)

    def inner_fixed(r32):
        # tol=0 forces exactly max_iter iterations
        return bicgstab(low.apply, r32, M=M, tol=0.0, max_iter=4).x

    t_inner = add("inner_bicgstab_4it", inner_fixed, f32, reps=20)

    def outer_body(r):
        e = inner_fixed(r.astype(jnp.float32))
        u = e.astype(r.dtype)
        return r - apply64(u)

    t_outer = add("outer_round(4 inner)", outer_body, f, reps=20)
    print(f"outer fixed overhead vs inner: {(t_outer - t_inner)*1e3:.3f} ms",
          flush=True)

    # --- whole-solve accounting: in-graph steady state vs wall dispatch ---
    # If the wall time of one dispatch far exceeds the in-graph steady
    # state of the SAME program, the gap is program-launch/streaming
    # overhead of the tunneled backend (scaling with program size), not
    # device compute — i.e. an artifact a production (non-tunneled) TPU
    # does not pay.
    import time as _time

    def full_ir(x):
        u, rel, k, inner = s._inner_jit(
            x, jnp.asarray(1e-10, x.dtype), jnp.asarray(1e-4, jnp.float32)
        )
        return u

    s.solve_refined(f, tol=1e-10, inner_tol=1e-4)  # build + compile
    t_graph = profiling.time_op(full_ir, f, reps=5, in_graph=True)
    print(f"{'IR solve (in-graph x5)':28s} {t_graph*1e3:9.3f} ms", flush=True)
    best = float("inf")
    for _ in range(5):
        t0 = _time.time()
        jax.block_until_ready(full_ir(f))
        best = min(best, _time.time() - t0)
    print(f"{'IR solve (wall/dispatch)':28s} {best*1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
