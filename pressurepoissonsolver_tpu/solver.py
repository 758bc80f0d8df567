"""High-level solve driver: GMG-preconditioned BiCGStab on the composite
operator, plus the Schur-complement interface path.

This is the TPU-native equivalent of the reference ``steady`` apps' solve
section (``apps/2d/steady.cpp:338-640``, ``apps/3d/steady.cpp:296-595``):

* ``solve``: outer BiCGStab on ``A u = f`` with a GMG V(1,1)-cycle
  preconditioner (reference ``--prec GMG --solver thunderegg``).
* ``solve_schur``: eliminate patch interiors, solve the interface system
  ``(I - S) gamma = interp(solve(f, 0))`` with BiCGStab, then recover
  ``u`` by one more round of patch solves (reference ``--schur``).

The Neumann nullspace is handled as in the apps: shift ``f`` to zero mean
before solving and compare solutions modulo a constant
(``apps/3d/steady.cpp:330-334, 539-549``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .domain import DomainHierarchy
from .geometry import Tree
from .gmg import CycleOpts, GMGCycle, build_gmg
from .krylov import KrylovResult, bicgstab
from .ops.level_ops import Level
from .problems import Problem, get_problem, init_problem


@dataclass
class SolveOptions:
    tol: float = 1e-12
    max_iter: int = 1000
    gmg: CycleOpts = field(default_factory=CycleOpts)
    precondition: bool = True
    # dtype of the preconditioner levels; float32 gives mixed precision
    precond_dtype: object = jnp.float64
    dtype: object = jnp.float64
    krylov: str = "bicgstab"  # "bicgstab" | "cg" | "gmres"
    preconditioner: str = "gmg"  # "gmg" | "schwarz" | "none"
    patch_solver: str = "dft"  # "dft" (spectral) | "bcgs" (iterative)


class PoissonSolver:
    """Composite-grid Poisson solver over a domain hierarchy."""

    def __init__(self, hierarchy: DomainHierarchy, options: Optional[SolveOptions] = None):
        self.hierarchy = hierarchy
        self.opts = options or SolveOptions()
        self.fine_level = Level(
            hierarchy.finest,
            dtype=self.opts.dtype,
            patch_solver=self.opts.patch_solver,
        )
        if self.opts.preconditioner != "gmg":
            self.opts.precondition = False
        if self.opts.precondition:
            if self.opts.precond_dtype == self.opts.dtype:
                # reuse the fine level object for the finest GMG level
                self.gmg = build_gmg(hierarchy, self.opts.gmg, dtype=self.opts.dtype)
                self.gmg.levels[0] = self.fine_level
                if self.gmg.transfers:
                    self.gmg.transfers[0].fine = self.fine_level
            else:
                self.gmg = build_gmg(hierarchy, self.opts.gmg, dtype=self.opts.precond_dtype)
        else:
            self.gmg = None
        self._solve_jit = None
        self._apply_jit = None
        self._fine_low = None
        self._inner_jit = None
        self._inner_jit_key = None
        self._schur_jit = None
        self._schur_jit_key = None

    # -- operators ----------------------------------------------------------

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        if self._apply_jit is None:
            self._apply_jit = jax.jit(self.fine_level.apply)
        return self._apply_jit(u)

    def _preconditioner(self) -> Optional[Callable]:
        if self.opts.preconditioner == "schwarz":
            from .precond import schwarz

            return schwarz(self.fine_level)
        if self.gmg is None:
            return None
        pdtype = self.opts.precond_dtype
        dtype = self.opts.dtype

        def M(r):
            return self.gmg.apply(r.astype(pdtype)).astype(dtype)

        return M

    # -- solves -------------------------------------------------------------

    def solve(
        self,
        f: jnp.ndarray,
        tol: Optional[float] = None,
        max_iter: Optional[int] = None,
    ) -> KrylovResult:
        """GMG-preconditioned BiCGStab on ``A u = f``."""
        tol = self.opts.tol if tol is None else tol
        max_iter = self.opts.max_iter if max_iter is None else max_iter
        if self._solve_jit is None:
            from .krylov import cg, gmres

            A = self.fine_level.apply
            M = self._preconditioner()
            method = {"cg": cg, "gmres": gmres}.get(self.opts.krylov, bicgstab)

            def run(b, tol_, max_iter_):
                return method(A, b, M=M, tol=tol_, max_iter=max_iter_)

            self._solve_jit = jax.jit(run, static_argnums=(2,))
        return self._solve_jit(jnp.asarray(f, dtype=self.opts.dtype), tol, max_iter)

    def solve_refined(
        self,
        f: jnp.ndarray,
        tol: Optional[float] = None,
        inner_tol: float = 1e-5,
        max_outer: int = 12,
        inner_max_iter: int = 60,
    ):
        """Mixed-precision iterative refinement: inner GMG-BiCGStab solves
        in the preconditioner dtype (f32), residual updates in f64.

        Classic IR reaches full f64 accuracy while doing nearly all Krylov
        work in fast low precision — the TPU-native answer to the
        reference's all-f64 CPU solves.  Returns ``(u, info dict)``.
        """
        tol = self.opts.tol if tol is None else tol
        pdtype = self.opts.precond_dtype
        if self._fine_low is None:
            if self.gmg is not None and self.gmg.levels[0].dtype == pdtype:
                self._fine_low = self.gmg.levels[0]
            else:
                self._fine_low = Level(self.hierarchy.finest, dtype=pdtype)
        low = self._fine_low
        key = (inner_tol, inner_max_iter)
        if self._inner_jit_key != key:
            M = (lambda r: self.gmg.apply(r)) if self.gmg is not None else None

            @jax.jit
            def inner(r32):
                return bicgstab(
                    low.apply, r32, M=M, tol=inner_tol, max_iter=inner_max_iter
                ).x

            self._inner_jit = inner
            self._inner_jit_key = key
        inner = self._inner_jit

        apply64 = self.apply
        f = jnp.asarray(f, dtype=jnp.float64)
        u = jnp.zeros_like(f)
        fnorm = float(jnp.linalg.norm(f.ravel()))
        info = {"outer_iterations": 0, "residual": 1.0}
        best_u, best_rel = u, float("inf")
        for k in range(max_outer):
            r = f - apply64(u)
            rel = float(jnp.linalg.norm(r.ravel())) / fnorm
            if not np.isfinite(rel):
                # inner f32 solve broke down (rho/omega underflow) — back
                # off to the best iterate; the caller can fall back to the
                # full-precision path
                u = best_u
                info["residual"] = best_rel
                info["breakdown"] = True
                break
            if rel < best_rel:
                best_u, best_rel = u, rel
            info["residual"] = rel
            info["outer_iterations"] = k
            if rel <= tol:
                break
            if k > 2 and rel > 0.5 * best_rel and rel > 10 * tol:
                # stagnation: f32 inner solves can't improve further
                break
            e = inner(r.astype(pdtype))
            e = jnp.where(jnp.isfinite(e), e, 0.0)
            u = u + e.astype(jnp.float64)
        return u, info

    def solve_schur(
        self,
        f: jnp.ndarray,
        tol: Optional[float] = None,
        max_iter: Optional[int] = None,
        preconditioner: Optional[str] = None,  # None | "cheb" | "blockjacobi"
    ):
        """Schur-complement path (reference ``--schur``).

        The interface condition is flux continuity across each interface:
        ``gamma = interp(solve(f, gamma))`` (see ``SchurHelper.h:281-299``
        and the probed matrix diagonal in ``SchurMatrixHelper2d.cpp:170-184``),
        i.e. the linear system ``(I - S) gamma = interp(solve(f, 0))`` with
        ``S = interp(solve(0, .))``.  Returns ``(u, KrylovResult)``.

        The Krylov method follows ``opts.krylov``; ``gmres`` here is the
        BASELINE "matrix-free GMRES on the Schur interface system"
        configuration.
        """
        tol = self.opts.tol if tol is None else tol
        max_iter = self.opts.max_iter if max_iter is None else max_iter
        lvl = self.fine_level
        f = jnp.asarray(f, dtype=self.opts.dtype)

        def S(gamma):
            u = lvl.patch_solve(jnp.zeros_like(f), gamma)
            return lvl.interpolate(u)

        def A_schur(gamma):
            return gamma - S(gamma)

        key = (preconditioner, tol, max_iter)
        if self._schur_jit_key != key:
            M = None
            if preconditioner == "cheb":
                from .precond import poly_cheb

                M = poly_cheb(lvl)
            elif preconditioner == "blockjacobi":
                from .matrix import schur_block_jacobi

                M = schur_block_jacobi(lvl)

            from .krylov import gmres

            method = gmres if self.opts.krylov == "gmres" else bicgstab

            @jax.jit
            def run(f):
                gamma0 = jnp.zeros((lvl.num_ifaces, lvl.m), dtype=f.dtype)
                b = lvl.interpolate(lvl.patch_solve(f, gamma0))
                res = method(A_schur, b, M=M, tol=tol, max_iter=max_iter)
                u = lvl.patch_solve(f, res.x)
                return u, res

            self._schur_jit = run
            self._schur_jit_key = key

        return self._schur_jit(f)

    # -- diagnostics --------------------------------------------------------

    def report(self, u, f, exact, neumann: bool = False) -> dict:
        """Error/residual/conservation block (``apps/2d/steady.cpp:570-606``)."""
        lvl = self.fine_level
        au = self.apply(u)
        resid = f - au
        out = {}
        out["residual"] = float(jnp.linalg.norm(resid.ravel()) / jnp.linalg.norm(f.ravel()))
        err = exact - u
        if neumann:
            # compare modulo the constant nullspace: shift the error to zero
            # mean (reference apps/2d/steady.cpp:588-599)
            uavg = lvl.integrate(u) / lvl.volume
            eavg = lvl.integrate(exact) / lvl.volume
            err = err - (eavg - uavg)
        out["error"] = float(
            jnp.linalg.norm(err.ravel()) / jnp.linalg.norm(exact.ravel())
        )
        out["conservation"] = float(lvl.integrate(au) - lvl.integrate(f))
        return out


def shift_for_neumann(level: Level, f: jnp.ndarray) -> jnp.ndarray:
    """Zero the mean of f (Neumann compatibility, ``steady.cpp:330-334``)."""
    fdiff = level.integrate(f) / level.volume
    return f - fdiff
