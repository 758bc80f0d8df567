"""Sub-op breakdown of the gather-bound pipelines (interpolate, transfers)
on the real bench-size level, with candidate reformulations.

Follow-up to layout_experiment.py: with calibrated in-graph timing the
stencil/spectral ops are at roofline and the remaining costs are the
gather pipelines.  This times each gather/compute stage separately and
compares gather shapes (rank-3 vs flattened rank-2 rows; 16/64/128-wide).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/interp_experiment.py
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pressurepoissonsolver_tpu.domain import DomainHierarchy
from pressurepoissonsolver_tpu.geometry import Tree, refined_tree
from pressurepoissonsolver_tpu.gmg import CycleOpts, Transfer, build_gmg
from pressurepoissonsolver_tpu.ops.level_ops import Level, extract_faces
from pressurepoissonsolver_tpu.utils import profiling

DT = jnp.float32


def main():
    divide = int(os.environ.get("PPS_PROFILE_DIVIDE", "3"))
    n = 16
    try:
        tree = Tree.from_file("/root/reference/apps/2d/meshes/multi_refine_8.bin", 2)
    except FileNotFoundError:
        tree = refined_tree(2, 5, 2)
    for _ in range(divide):
        tree.refine_leaves()
    h = DomainHierarchy(tree, n=n)
    lvl = Level(h.finest, dtype=DT)
    coarse = Level(h[1], dtype=DT)
    tr = Transfer(lvl, coarse)
    P, D, m, NIf = lvl.P, lvl.D, lvl.m, lvl.num_ifaces
    pipe = lvl._pipe
    print(f"P={P} Pc={coarse.P} NIf={NIf} Ks={pipe.Ks} Km={pipe.Km}", flush=True)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((P, n, n)), dtype=DT)
    uc = jnp.asarray(rng.standard_normal((coarse.P, n, n)), dtype=DT)
    faces = extract_faces(u, D, n, lvl.face_depth)  # [P, 2D, m]
    g = jnp.asarray(rng.standard_normal((NIf, m)), dtype=DT)

    report = {}

    def add(name, fn, *args, reps=500):
        t = profiling.time_op(fn, *args, reps=reps, in_graph=True)
        report[name] = round(t * 1e6, 2)
        print(f"{name:32s} {t*1e6:9.2f} us", flush=True)

    # --- pipe_interpolate (v2: iface-major scalar + compact matmul) -----
    add("extract_faces", lambda x: extract_faces(x, D, n, lvl.face_depth), u)
    add("pipe_interpolate_full", lambda f: pipe.interpolate(f, m), faces)

    # --- gamma_faces ------------------------------------------------------
    add("gamma_faces", lvl.gamma_faces, g)

    # --- fold_rhs ---------------------------------------------------------
    gf = jnp.asarray(rng.standard_normal((P, 2 * D, m)), dtype=DT)
    add("fold_rhs_cur", lambda x: lvl._fold_faces_into_rhs(x, gf), u)

    def fold_flat(x):
        xf = x.reshape(P, n * n)
        gxl = jnp.pad(gf[:, 0][:, :, None], ((0, 0), (0, 0), (0, n - 1))).reshape(P, -1)
        gxh = jnp.pad(gf[:, 1][:, :, None], ((0, 0), (0, 0), (n - 1, 0))).reshape(P, -1)
        gyl = jnp.pad(gf[:, 2], ((0, 0), (0, n * n - n)))
        gyh = jnp.pad(gf[:, 3], ((0, 0), (n * n - n, 0)))
        h2x = lvl.h2inv[:, 0:1].astype(DT)
        h2y = lvl.h2inv[:, 1:2].astype(DT)
        return (xf - 2.0 * (h2x * (gxl + gxh) + h2y * (gyl + gyh))).reshape(P, n, n)


    # --- transfers --------------------------------------------------------
    add("restrict_cur", tr.restrict, u, reps=200)
    add("prolong_cur", lambda c: tr.prolong_add(c, u), uc, reps=200)
    # sub-ops of restrict
    fine_pad = jnp.concatenate([u, jnp.zeros((1, n, n), dtype=DT)], axis=0)
    fine_pad2 = fine_pad.reshape(P + 1, n * n)
    add("pt_gather_rank3", lambda fp: fp[tr._pt_slot], fine_pad)
    add("pt_gather_rank2", lambda fp: fp[tr._pt_slot], fine_pad2)

    # --- kron-form restrict (flat, one matmul per orthant over parents) ---
    import numpy as _np
    from pressurepoissonsolver_tpu.gmg import _restrict_matrix
    Wo = []
    for o in range(4):
        Rx = _restrict_matrix(n, o & 1)
        Ry = _restrict_matrix(n, (o >> 1) & 1)
        Wo.append(jnp.asarray(_np.kron(Ry, Rx).T.astype(_np.float32)))
    has_compact = tr._r_parents is not None

    def restrict_kron(x):
        xf = jnp.concatenate([x.reshape(P, n * n),
                              jnp.zeros((1, n * n), dtype=x.dtype)], axis=0)
        cs = tr._r_child_slot if has_compact else tr._child_slot
        acc = None
        for o in range(4):
            blk = jnp.dot(xf[cs[:, o]], Wo[o], precision=jax.lax.Precision.HIGHEST)
            acc = blk if acc is None else acc + blk
        if has_compact:
            pad = jnp.zeros((1, n * n), dtype=acc.dtype)
            acc = jnp.concatenate([acc, pad], axis=0)[tr._r_inv]
        return (acc + xf[tr._pt_slot]).reshape(coarse.P, n, n)

    err = float(jnp.max(jnp.abs(restrict_kron(u) - tr.restrict(u))))
    print(f"  restrict_kron err: {err:.2e}", flush=True)
    add("restrict_kron", restrict_kron, u, reps=200)

    # --- spectral on real level: current groups vs kron ---------------------
    add("spectral_cur", lvl._spectral_solve, u)
    st = lvl._st
    Wk1, Wk2, dens = [], [], []
    for gr in st.groups:
        T1x = np.asarray(st.tmats[gr.fwd_kinds[0]], dtype=np.float64)
        T1y = np.asarray(st.tmats[gr.fwd_kinds[1]], dtype=np.float64)
        T2x = np.asarray(st.tmats[gr.inv_kinds[0]], dtype=np.float64)
        T2y = np.asarray(st.tmats[gr.inv_kinds[1]], dtype=np.float64)
        Wk1.append(np.kron(T1y, T1x).T)
        Wk2.append(np.kron(T2y, T2x).T * (2.0 / n) ** 2)
    Wk1 = [jnp.asarray(w.astype(np.float32)) for w in Wk1]
    Wk2 = [jnp.asarray(w.astype(np.float32)) for w in Wk2]

    def spectral_kron(x):
        xf = x.reshape(P, n * n)
        xs = xf if st.identity_perm else xf[st.perm]
        dn = st.denom_sorted.reshape(P, n * n)
        parts = []
        for gi, gr in enumerate(st.groups):
            xg = jax.lax.slice_in_dim(xs, gr.start, gr.stop, axis=0)
            dg = jax.lax.slice_in_dim(dn, gr.start, gr.stop, axis=0)
            yg = (xg @ Wk1[gi]) / dg
            if gr.pin_dc:
                yg = yg.at[:, 0].set(0.0)
            parts.append(yg @ Wk2[gi])
        ys = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        out = ys if st.identity_perm else ys[st.inv_perm]
        return out.reshape(P, n, n)

    err = float(jnp.max(jnp.abs(spectral_kron(u) - lvl._spectral_solve(u))))
    print(f"  spectral_kron err: {err:.2e} (bf16 pass differences expected)", flush=True)
    add("spectral_kron", spectral_kron, u)

    with open("/tmp/interp_experiment.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print("wrote /tmp/interp_experiment.json", flush=True)


if __name__ == "__main__":
    main()
