"""Scaling harness: stencil-throughput and solve scaling over mesh sizes
and device counts (BASELINE.md: nnz/s at 1 chip / 1 host / N hosts).

On CPU (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count) this
measures the sharded-execution path over N virtual devices; on a real
multi-chip TPU slice the same code runs over ICI.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1])
    ap.add_argument("--divide", type=int, default=1)
    ap.add_argument("-n", type=int, default=16)
    ap.add_argument("--dtype", type=str, default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pressurepoissonsolver_tpu.domain import DomainHierarchy
    from pressurepoissonsolver_tpu.geometry import Tree, refined_tree
    from pressurepoissonsolver_tpu.ops.level_ops import Level
    from pressurepoissonsolver_tpu.parallel.sharding import (
        make_mesh,
        pad_level,
        patch_sharding,
        shard_patch_array,
    )

    dtype = jnp.float32 if args.dtype == "float32" else jnp.float64
    try:
        tree = Tree.from_file(
            "/root/reference/apps/2d/meshes/multi_refine_8.bin", 2
        )
    except FileNotFoundError:
        tree = refined_tree(2, 5, 2)
    for _ in range(args.divide):
        tree.refine_leaves()
    h = DomainHierarchy(tree, n=args.n)

    for ndev in args.devices:
        mesh = make_mesh(ndev)
        pl = pad_level(h.finest, ndev)
        lvl = Level(pl, dtype=dtype)
        sh = patch_sharding(mesh)
        rng = np.random.default_rng(0)
        u = shard_patch_array(
            jnp.asarray(
                rng.standard_normal((pl.num_patches,) + pl.ns_shape), dtype=dtype
            ),
            mesh,
        )

        inner = 50

        @jax.jit
        def loop(v):
            def body(i, x):
                return jax.lax.with_sharding_constraint(
                    lvl.apply(x) * jnp.asarray(1e-3, dtype), sh
                )
            return jax.lax.fori_loop(0, inner, body, v)

        loop(u).block_until_ready()
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = loop(u)
        out.block_until_ready()
        t = (time.time() - t0) / reps / inner
        dof = h.finest.num_cells
        nnz = (2 * h.finest.D + 1) * dof
        print(
            json.dumps(
                {
                    "devices": ndev,
                    "dof": dof,
                    "apply_ms": round(t * 1e3, 4),
                    "nnz_per_s": round(nnz / t, 1),
                    "dtype": args.dtype,
                }
            )
        )


if __name__ == "__main__":
    main()
