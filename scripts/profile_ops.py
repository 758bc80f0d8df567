"""Per-op timing + roofline report on the current device.

Uses ``utils.profiling.op_report`` (in-graph fori-chained timings) for the
core Level ops and adds the full V-cycle.  Run on the TPU for the
"per-kernel speed-of-light" accounting; CPU runs are for smoke-testing.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_ops.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pressurepoissonsolver_tpu.domain import DomainHierarchy
from pressurepoissonsolver_tpu.geometry import Tree, refined_tree
from pressurepoissonsolver_tpu.gmg import CycleOpts, build_gmg
from pressurepoissonsolver_tpu.ops.level_ops import Level
from pressurepoissonsolver_tpu.utils import profiling


def main():
    divide = int(os.environ.get("PPS_PROFILE_DIVIDE", "2"))
    n = int(os.environ.get("PPS_PROFILE_N", "16"))
    try:
        tree = Tree.from_file(
            "/root/reference/apps/2d/meshes/multi_refine_8.bin", 2
        )
    except FileNotFoundError:
        tree = refined_tree(2, 5, 2)
    for _ in range(divide):
        tree.refine_leaves()
    h = DomainHierarchy(tree, n=n)

    variants = [(jnp.float32, "f32"), (jnp.float64, "f64")]
    if os.environ.get("PPS_PROFILE_DTYPE") == "f32":
        variants = variants[:1]
    for dtype, name in variants:
        lvl = Level(h.finest, dtype=dtype)
        print(f"== {name}: P={lvl.P} n={n} DOF={lvl.P * n**2} "
              f"ifaces={lvl.num_ifaces}", flush=True)
        rep = profiling.op_report(lvl)
        for k, v in rep.items():
            print(f"  {k:14s} {v}", flush=True)
        gmg = build_gmg(h, dtype=dtype)
        gmg.levels[0] = lvl
        if gmg.transfers:
            gmg.transfers[0].fine = lvl
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((lvl.P, n, n)), dtype=dtype)
        t = profiling.time_op(gmg.apply, u, reps=5, in_graph=True)
        print(f"  vcycle         {t*1e3:8.3f} ms   levels={len(gmg.levels)}",
              flush=True)


if __name__ == "__main__":
    main()
