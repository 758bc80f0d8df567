"""Per-op timing + roofline report on the current device.

Uses ``utils.profiling.op_report`` (in-graph fori-chained timings) for the
core Level ops, adds a sub-op breakdown of the composite-apply pipeline
(face extraction / trace interpolation / gamma gather / stencil / RHS fold
/ spectral solve) plus the GMG transfers and the full V-cycle.  Run on the
TPU for the "per-kernel speed-of-light" accounting; CPU runs are for
smoke-testing.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_ops.py

Env knobs: PPS_PROFILE_DIVIDE (default 3 = bench size), PPS_PROFILE_N,
PPS_PROFILE_DTYPE (f32 to skip f64), PPS_PROFILE_OUT (write a JSON report).
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
from pressurepoissonsolver_tpu.ops.level_ops import Level, extract_faces
from pressurepoissonsolver_tpu.utils import profiling


def level_breakdown(lvl: Level, reps: int = 500, light: bool = False) -> dict:
    """In-graph per-op table for one level, sub-ops of apply included.

    ``light`` times only the composite-apply chain (what the IR outer
    loop runs in f64) — the full f64 table costs ~20 min of tunnel
    compiles for ops production never runs in f64."""
    bw = profiling._device_bw()
    itemsize = jnp.dtype(lvl.dtype).itemsize
    cells = lvl.P * lvl.pl.cells_per_patch
    field = cells * itemsize
    D, n, m = lvl.D, lvl.n, lvl.m
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((lvl.P,) + lvl.pl.ns_shape), dtype=lvl.dtype)
    g = jnp.asarray(
        rng.standard_normal((max(lvl.num_ifaces, 1), m)), dtype=lvl.dtype
    )
    gf = jnp.asarray(
        rng.standard_normal((lvl.P, 2 * D, m)), dtype=lvl.dtype
    )
    faces = extract_faces(u, D, n, lvl.face_depth)
    face_bytes = faces.size * itemsize
    nnz = (2 * D + 1) * cells

    out = {}

    hbm = os.environ.get("PPS_PROFILE_HBM_FORCE")

    def add(name, fn, args, bytes_needed, nnz_count=None):
        t = profiling.time_op(fn, *args, reps=reps, in_graph=True)
        rec = {
            "ms": round(t * 1e3, 6),
            "roofline_pct": round(100 * bytes_needed / bw / t, 2),
        }
        if nnz_count:
            rec["gnnz_per_s"] = round(nnz_count / t / 1e9, 2)
        out[name] = rec
        if hbm and args[0].shape == u.shape:
            # HBM-forced corroboration: rotate > 4x-VMEM worth of live
            # input buffers so the operand streams from HBM (the
            # VMEM-optimistic caveat of the steady-state numbers)
            B = max(3, int(256e6 / max(field, 1)) + 1)
            th = profiling.time_op(fn, *args, reps=min(reps, 100),
                                   in_graph=True, hbm_rotate=B)
            out[name + "_hbm"] = {
                "ms": round(th * 1e3, 6),
                "roofline_pct": round(100 * bytes_needed / bw / th, 2),
                "rotation_buffers": B,
            }

    # sub-ops of the composite apply
    add("extract_faces", lambda x: extract_faces(x, D, n, lvl.face_depth),
        (u,), field + face_bytes)
    if light:
        add("interpolate", lvl.interpolate, (u,), field + face_bytes)
        add("stencil_only", lambda x: lvl._stencil_with_faces(x, gf), (u,),
            2 * field, nnz)
        add("apply", lvl.apply, (u,), 2 * field, nnz)
        return out
    add("pipe_interpolate", lambda ff: lvl._pipe.interpolate(ff, m),
        (faces,), 2 * face_bytes)
    add("interpolate", lvl.interpolate, (u,), field + face_bytes)
    add("gamma_faces", lvl.gamma_faces, (g,), 2 * face_bytes)
    add("stencil_only", lambda x: lvl._stencil_with_faces(x, gf), (u,),
        2 * field, nnz)
    add("fold_rhs", lambda x: lvl._fold_faces_into_rhs(x, gf), (u,), 2 * field)
    add("spectral_solve", lvl._spectral_solve, (u,), 2 * field)
    # composed ops
    add("apply", lvl.apply, (u,), 2 * field, nnz)
    add("patch_solve", lambda x: lvl.patch_solve(x, g), (u,), 2 * field)
    add("smooth", lambda x: lvl.smooth(x, x), (u,), 3 * field)
    return out


def main():
    divide = int(os.environ.get("PPS_PROFILE_DIVIDE", "3"))
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

    report = {
        "divide": divide,
        "n": n,
        "device": str(jax.devices()[0]),
        "hbm_bytes_per_s": profiling._device_bw(),
        # methodology label (ADVICE r3): calibrated dynamic-trip fori_loop
        # steady state — VMEM-optimistic for loop-resident operands
        "timing": "in_graph_steady_state",
    }
    variants = [(jnp.float32, "f32"), (jnp.float64, "f64")]
    if os.environ.get("PPS_PROFILE_DTYPE") == "f32":
        variants = variants[:1]
    out_path = os.environ.get("PPS_PROFILE_OUT")

    def dump():
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(report, fh, indent=1)

    for dtype, name in variants:
        lvl = Level(h.finest, dtype=dtype)
        print(f"== {name}: P={lvl.P} n={n} DOF={lvl.P * n**2} "
              f"ifaces={lvl.num_ifaces}", flush=True)
        rep = level_breakdown(lvl, light=(name == "f64"))
        if name == "f64":
            for k, v in rep.items():
                print(f"  {k:16s} {v}", flush=True)
            report[name] = rep
            dump()
            continue
        gmg = build_gmg(h, dtype=dtype,
                        opts=CycleOpts(pre_sweeps=2, fac_smoothing="active"))
        gmg.levels[0] = lvl
        if gmg.transfers:
            gmg.transfers[0].fine = lvl
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((lvl.P, n, n)), dtype=dtype)
        itemsize = jnp.dtype(dtype).itemsize
        field = lvl.P * n**2 * itemsize
        bw = profiling._device_bw()
        if gmg.transfers:
            tr = gmg.transfers[0]
            t = profiling.time_op(tr.restrict, u, reps=200, in_graph=True)
            rep["restrict"] = {"ms": round(t * 1e3, 6),
                               "roofline_pct": round(100 * 1.25 * field / bw / t, 2)}
            uc = jnp.asarray(
                rng.standard_normal((gmg.levels[1].P, n, n)), dtype=dtype)
            t = profiling.time_op(
                lambda x: tr.prolong_add(uc, x), u, reps=200, in_graph=True)
            rep["prolong"] = {"ms": round(t * 1e3, 6),
                              "roofline_pct": round(100 * 2.25 * field / bw / t, 2)}
        t = profiling.time_op(gmg.apply, u, reps=20, in_graph=True)
        rep["vcycle_V21_active"] = {"ms": round(t * 1e3, 6),
                                    "levels": len(gmg.levels)}
        for k, v in rep.items():
            print(f"  {k:16s} {v}", flush=True)
        report[name] = rep
        dump()

    if os.environ.get("PPS_PROFILE_HALO"):
        # the sharded halo engine at ndev=1: same pipeline the multi-chip
        # path runs (shard_map + exchange buffers, ppermutes degenerate),
        # so the sharded ops have a measured single-chip cost too
        from pressurepoissonsolver_tpu.parallel.halo import ShardedLevel
        from pressurepoissonsolver_tpu.parallel.sharding import make_mesh

        dtype = jnp.float32
        lvl = Level(h.finest, dtype=dtype)
        sl = ShardedLevel(lvl, make_mesh(1))
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((lvl.P, n, n)), dtype=dtype)
        bw = profiling._device_bw()
        field = lvl.P * n**2 * jnp.dtype(dtype).itemsize
        hrep = {}
        for name, fn, args, bytes_needed in (
            ("apply", sl.apply, (u,), 2 * field),
            ("smooth", lambda x: sl.smooth(x, x), (u,), 3 * field),
            ("interpolate", sl.interpolate, (u,), field),
        ):
            t = profiling.time_op(fn, *args, reps=200, in_graph=True)
            hrep[name] = {"ms": round(t * 1e3, 6),
                          "roofline_pct": round(100 * bytes_needed / bw / t, 2)}
            print(f"  halo.{name:12s} {hrep[name]}", flush=True)
        report["halo_ndev1_f32"] = hrep
        dump()

    if out_path:
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
