"""pressurepoissonsolver_tpu — a TPU-native framework for solving Poisson's
equation on adaptively refined, block-structured Cartesian grids.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
GEM3D/pressurePoissonSolver ("ThunderEgg"): fixed-size cell-centered patches
on quadtrees (2D) / octrees (3D) with 2:1 balance, fast DST/DCT patch
solvers expressed as batched matmuls (MXU), FAC geometric multigrid, a
Schur-complement interface path, and BiCGStab/CG Krylov solvers — all
batched over a leading patch axis and shardable over a `jax.sharding.Mesh`.

The numerical contract (stencils, interface interpolation weights,
transform tables, multigrid transfer operators) matches the reference
semantics documented in SURVEY.md; the implementation is idiomatic
JAX: static shapes, precomputed int32 index tables instead of pointer
graphs, scatter/gather + `psum` instead of MPI/VecScatter.

Double precision is required to reach the reference's 1e-10 relative
residual targets, so importing this package enables x64 mode in JAX.
The multigrid preconditioner can optionally run in f32 (mixed
precision) — see `solver.SolveOptions`.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# The session sitecustomize registers the axon TPU plugin and overrides the
# JAX_PLATFORMS env var; honor an explicit CPU request (virtual-device
# sharding tests / multi-process gloo runs) regardless.
if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    _jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: TPU compiles of the unrolled multigrid
# cycle are expensive (minutes); cache them across processes.  CPU runs
# skip it — XLA:CPU AOT artifacts are machine-feature specific.
if (
    _os.environ.get("PPS_NO_COMPILE_CACHE") != "1"
    and "cpu" not in _os.environ.get("JAX_PLATFORMS", "")
):
    _cache_dir = _os.environ.get(
        "PPS_COMPILE_CACHE", _os.path.expanduser("~/.cache/pps_tpu_xla")
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from . import geometry  # noqa: E402
from . import domain  # noqa: E402

__version__ = "0.1.0"
