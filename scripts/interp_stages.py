"""Stage-level timing of the v2 trace-interpolation pipeline at bench size.

Isolates: face-table concat, the scalar gather, the scalar multiply+sum,
the matmul path, and the mm_inv add-back — to find where the remaining
~290 us of pipe_interpolate goes.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/interp_stages.py
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pressurepoissonsolver_tpu.domain import DomainHierarchy
from pressurepoissonsolver_tpu.geometry import Tree, refined_tree
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
    P, D, m, NIf = lvl.P, lvl.D, lvl.m, lvl.num_ifaces
    pipe = lvl._pipe
    S2f = 2 * D * lvl.face_depth
    Cm = int(pipe.idx_m.shape[0]) if pipe.idx_m is not None else 0
    print(f"P={P} NIf={NIf} Ks={pipe.Ks} Km={pipe.Km} Cm={Cm} "
          f"idx_s={pipe.idx_s.shape}", flush=True)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((P, n, n)), dtype=DT)
    faces = extract_faces(u, D, n, lvl.face_depth)
    ffp = jnp.concatenate(
        [faces.reshape(P * S2f, m), jnp.zeros((1, m), dtype=DT)], axis=0
    )
    gs = ffp[pipe.idx_s].reshape(NIf, pipe.Ks, m)
    gamma = jnp.asarray(rng.standard_normal((NIf, m)), dtype=DT)

    def add(name, fn, *args, reps=500):
        t = profiling.time_op(fn, *args, reps=reps, in_graph=True)
        print(f"{name:28s} {t*1e6:9.2f} us", flush=True)

    add("concat_pad", lambda f: jnp.concatenate(
        [f.reshape(P * S2f, m), jnp.zeros((1, m), dtype=f.dtype)], axis=0), faces)
    add("scalar_gather", lambda f: f[pipe.idx_s], ffp)
    add("scalar_mulsum", lambda g: jnp.sum(
        g.reshape(NIf, pipe.Ks, m) * pipe.w_s.astype(g.dtype), axis=1),
        ffp[pipe.idx_s])
    add("scalar_path", lambda f: jnp.sum(
        f[pipe.idx_s].reshape(NIf, pipe.Ks, m) * pipe.w_s.astype(f.dtype),
        axis=1), ffp)
    if pipe.idx_m is not None:
        def mm_path(f):
            gm = f[pipe.idx_m]
            vals = jnp.matmul(
                gm, pipe.mm_W.astype(f.dtype),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(gm.shape[0] * pipe.mm_ncase, m)
            return vals[pipe.mm_gather].reshape(-1, pipe.Km, m).sum(axis=1)

        add("mm_path", mm_path, ffp)
        NIfm = pipe.mm_gather.shape[0] // pipe.Km
        sums = jnp.asarray(rng.standard_normal((NIfm, m)), dtype=DT)
        add("mm_invadd", lambda g: g + jnp.concatenate(
            [sums, jnp.zeros((1, m), dtype=g.dtype)], axis=0)[pipe.mm_inv],
            gamma)
    add("pipe_full", lambda f: pipe.interpolate(f, m), faces)
    add("interpolate", lvl.interpolate, u)


if __name__ == "__main__":
    main()
