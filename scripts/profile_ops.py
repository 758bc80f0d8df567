"""Per-op timing on the real TPU: find the bottleneck in the solve."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pressurepoissonsolver_tpu.domain import DomainHierarchy
from pressurepoissonsolver_tpu.geometry import Tree
from pressurepoissonsolver_tpu.gmg import build_gmg
from pressurepoissonsolver_tpu.ops.level_ops import Level


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    tree = Tree.from_file("/root/reference/apps/2d/meshes/multi_refine_8.bin", 2)
    tree.refine_leaves()
    tree.refine_leaves()
    h = DomainHierarchy(tree, n=16)
    import os
    variants = [(jnp.float32, "f32"), (jnp.float64, "f64")]
    if os.environ.get("PPS_PROFILE_DTYPE") == "f32":
        variants = variants[:1]
    for dtype, name in variants:
        lvl = Level(h.finest, dtype=dtype)
        print(f"== {name}: P={lvl.P} n=16 DOF={lvl.P*256} ifaces={lvl.num_ifaces}")
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal((lvl.P, 16, 16)), dtype=dtype)
        g = jnp.asarray(
            rng.standard_normal((lvl.num_ifaces, lvl.m)), dtype=dtype
        )
        jf = lambda f: jax.jit(f)
        t = timeit(jf(lvl.interpolate), u)
        print(f"  interpolate      {t*1e3:8.3f} ms  {lvl.P*256*8/t/1e9:7.1f} GB/s-ish")
        t = timeit(jf(lvl.gamma_faces), g)
        print(f"  gamma_faces      {t*1e3:8.3f} ms")
        t = timeit(jf(lvl.apply_with_interface), u, g)
        print(f"  stencil (w/ifc)  {t*1e3:8.3f} ms  {5*lvl.P*256/t/1e9:7.2f} Gnnz/s")
        t = timeit(jf(lvl.apply), u)
        print(f"  apply (full)     {t*1e3:8.3f} ms  {5*lvl.P*256/t/1e9:7.2f} Gnnz/s")
        t = timeit(jf(lvl.patch_solve), u, g)
        print(f"  patch_solve      {t*1e3:8.3f} ms")
        t = timeit(jf(lvl.smooth), u, u)
        print(f"  smooth           {t*1e3:8.3f} ms")
        gmg = build_gmg(h, dtype=dtype)
        gmg.levels[0] = lvl
        if gmg.transfers:
            gmg.transfers[0].fine = lvl
        t = timeit(jf(gmg.apply), u, reps=5)
        print(f"  vcycle           {t*1e3:8.3f} ms   levels={len(gmg.levels)}")


if __name__ == "__main__":
    main()
