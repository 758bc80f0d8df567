"""Halo/compute overlap evidence: AOT-compile the sharded ops for a REAL
8-chip TPU topology (v5e 2x4) and analyze their schedules.

The virtual-CPU mesh can't answer whether the ``ppermute``s overlap the
interior compute — XLA:CPU lowers ``collective-permute`` synchronously.
This script compiles the halo engine's ``apply``, ``smooth``, GMG
``restrict``/``prolong_add``, and a full V-cycle for an actual v5e:2x4
topology through ``jax.experimental.topologies`` (no chips needed) and
inspects each optimized module:

* the per-offset exchanges must lower to async
  ``collective-permute-start/done`` pairs,
* compute fusions scheduled between a start and its done run inside an
  open communication window (overlapped),
* and it reports, per op, the fraction of total fusion cycles scheduled
  inside open windows (the BASELINE "overlapped halo collectives"
  schedule, obtained by dependency structure instead of manual double
  buffering).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/overlap_aot.py
"""

import json
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, PartitionSpec as P


def analyze(name, txt, require_overlap_shape=None):
    """Window analysis of one optimized HLO module.  Returns a record with
    the async-window count and the fusion-cycle overlap fraction."""
    lines = txt.splitlines()
    starts, dones = [], []
    for i, l in enumerate(lines):
        if " = " not in l:
            continue
        if "collective-permute-start" in l:
            starts.append((i, l.split(" = ")[0].strip()))
        m = re.search(r"collective-permute-done\((%[\w.\-]+)\)", l)
        if m:
            dones.append((i, m.group(1)))
    done_of = {nm: i for i, nm in dones}
    windows = [(i, done_of[nm]) for i, nm in starts if nm in done_of]

    def open_at(j):
        return any(a < j < b for a, b in windows)

    incyc = outcyc = 0
    biggest = None  # (line, cycles, in_window) of the target-shape fusion
    for j, l in enumerate(lines):
        if not re.search(r"= \S+ fusion\(", l):
            continue
        m = re.search(r'"estimated_cycles":"(\d+)"', l)
        c = int(m.group(1)) if m else 0
        if open_at(j):
            incyc += c
        else:
            outcyc += c
        if require_overlap_shape and re.search(
            rf"= f32\[{require_overlap_shape}\]", l
        ) and (biggest is None or c > biggest[1]):
            biggest = (j, c, open_at(j))
    pct = 100 * incyc / max(incyc + outcyc, 1)
    rec = {
        "op": name,
        "async_windows": len(windows),
        "fusion_cycles_in_window_pct": round(pct, 1),
    }
    if biggest is not None:
        rec["interior_fusion_in_window"] = bool(biggest[2])
    print(json.dumps(rec), flush=True)
    return rec


def main():
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    devs = np.array(topo.devices)
    print(f"topology: v5e:2x4, {devs.size} devices", flush=True)

    from pressurepoissonsolver_tpu.domain import DomainHierarchy
    from pressurepoissonsolver_tpu.geometry import Tree, refined_tree
    from pressurepoissonsolver_tpu.gmg import CycleOpts, build_gmg
    from pressurepoissonsolver_tpu.ops.level_ops import Level
    from pressurepoissonsolver_tpu.parallel.halo import (
        ShardedLevel,
        ShardedTransfer,
        shard_map,
    )

    try:
        tree = Tree.from_file(
            "/root/reference/apps/2d/meshes/multi_refine_8.bin", 2
        )
    except FileNotFoundError:
        tree = refined_tree(2, 5, 2)
    for _ in range(3):
        tree.refine_leaves()
    h = DomainHierarchy(tree, n=16, num_shards=8)
    mesh = Mesh(devs.reshape(8), ("p",))
    lvl = Level(h.finest, dtype=jnp.float32)
    sl = ShardedLevel(lvl, mesh)

    def sds(level):
        return jax.ShapeDtypeStruct(
            (level.P,) + (16,) * level.D, jnp.float32
        )

    recs = []

    # ---- composite apply (exchange + ghost-closure stencil) ---------------
    def f_apply(u_loc, h2inv, coef):
        me = jax.lax.axis_index("p")
        gf = sl._gamma_faces_local(u_loc, me)
        return sl._stencil_local(u_loc, gf, h2inv, coef)

    fn = jax.jit(
        shard_map(f_apply, mesh, in_specs=(P("p"),) * 3, out_specs=P("p"))
    )
    args = [
        sds(lvl),
        jax.ShapeDtypeStruct((lvl.P, 2), jnp.float32),
        jax.ShapeDtypeStruct((lvl.P, 4), jnp.float32),
    ]
    txt = fn.lower(*args).compile().as_text()
    Pl = lvl.P // 8
    rec = analyze("apply", txt, require_overlap_shape=f"{Pl},16,16")
    assert rec["async_windows"], "apply: no async collective-permute pairs"
    assert rec.get("interior_fusion_in_window"), (
        "interior stencil NOT overlapped with the exchange"
    )
    recs.append(rec)

    # ---- block-Jacobi smoother (exchange + fold + spectral solve) ---------
    if sl._single_group:

        def f_smooth(f_loc, u_loc, h2inv, denom):
            me = jax.lax.axis_index("p")
            gf = sl._gf_direct_local(u_loc, me)
            fc = sl._fold_local(f_loc, gf, h2inv)
            return sl._solve_local(fc, denom)

        fn = jax.jit(
            shard_map(
                f_smooth, mesh, in_specs=(P("p"),) * 4, out_specs=P("p")
            )
        )
        txt = (
            fn.lower(
                sds(lvl), sds(lvl),
                jax.ShapeDtypeStruct((lvl.P, 2), jnp.float32),
                jax.ShapeDtypeStruct(sl._denom.shape, jnp.float32),
            )
            .compile()
            .as_text()
        )
        recs.append(analyze("smooth", txt))

    # ---- GMG transfers (parent/child exchange + Kronecker matmuls) --------
    gmg = build_gmg(h, CycleOpts(), dtype=jnp.float32, mesh=None)
    if len(gmg.levels) > 1:
        fine = ShardedLevel(gmg.levels[0], mesh)
        coarse = ShardedLevel(gmg.levels[1], mesh)
        tr = ShardedTransfer(gmg.transfers[0], fine, coarse)
        txt = jax.jit(tr.restrict).lower(sds(gmg.levels[0])).compile().as_text()
        recs.append(analyze("restrict", txt))
        txt = (
            jax.jit(tr.prolong_add)
            .lower(sds(gmg.levels[1]), sds(gmg.levels[0]))
            .compile()
            .as_text()
        )
        recs.append(analyze("prolong_add", txt))

    # ---- one full V-cycle over the sharded hierarchy ----------------------
    gmg_sh = build_gmg(h, CycleOpts(), dtype=jnp.float32, mesh=None)
    wrapped = [ShardedLevel(l, mesh) for l in gmg_sh.levels]
    gmg_sh.transfers = [
        ShardedTransfer(t, wrapped[k], wrapped[k + 1])
        for k, t in enumerate(gmg_sh.transfers)
    ]
    gmg_sh.levels = wrapped
    gmg_sh.attach_sharded_active()
    txt = jax.jit(gmg_sh.apply).lower(sds(lvl)).compile().as_text()
    recs.append(analyze("v_cycle", txt))

    print(json.dumps({"summary": recs}))


if __name__ == "__main__":
    main()
