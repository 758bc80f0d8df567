"""Batched per-level device operations.

One :class:`Level` holds the device-resident index tables and spectral data
for a single refinement level, and exposes the four core linear maps as
pure, jittable array functions batched over the leading patch axis:

* ``interpolate(u) -> gamma`` — trace interpolation onto the interface
  vector (reference ``SchurHelper::interpolateToInterface`` +
  ``updateInterfaceDist``; a single fused gather/scatter-add here).
* ``apply(u) -> A u`` — the composite-grid operator (reference
  ``SchurHelper::apply``, ``SchurHelper.h:360-376``).
* ``patch_solve(f, gamma) -> u`` — exact per-patch solves by DST/DCT
  diagonalization, batched as MXU matmuls (reference
  ``FftwPatchSolver::solve`` / ``DftPatchSolver::solve``).
* ``smooth(f, u) -> u'`` — one FFT block-Jacobi sweep (reference
  ``SchurHelper::solveWithSolution``, ``SchurHelper.h:318-331``).

Array layout: patch fields are ``[P, (nz,) ny, nx]`` with x fastest,
matching the reference's stride-1-in-x layout; face vectors are C-order
flattenings of the remaining axes (lowest axis fastest).

All data defaults to float64 (TPU software-emulated, required for 1e-10
residual targets); pass ``dtype=jnp.float32`` for a mixed-precision
preconditioner level.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import iface as iface_mod
from ..domain import PatchLevel
from . import transforms as tr


def _arr_axis(D: int, ref_axis: int) -> int:
    """Array axis (in a [P, ...] patch array) for spatial axis ``ref_axis``."""
    return 1 + (D - 1 - ref_axis)


def extract_faces(u: jnp.ndarray, D: int, n: int, depth: int = 1) -> jnp.ndarray:
    """Boundary-cell traces: ``[P, 2D*depth, m]`` with ``m = n**(D-1)``.

    ``depth > 1`` also extracts faces ``d`` cells inward (row order:
    ``side * depth + d``) — sources of the higher-order 2D closures."""
    P = u.shape[0]
    faces = []
    for a in range(D):
        ax = _arr_axis(D, a)
        for d in range(depth):
            faces.append(jnp.take(u, d, axis=ax).reshape(P, -1))
        for d in range(depth):
            faces.append(jnp.take(u, n - 1 - d, axis=ax).reshape(P, -1))
    return jnp.stack(faces, axis=1)


@dataclass(frozen=True)
class _SolveGroup:
    """Static metadata of one BC-homogeneous patch-solver batch."""

    start: int
    stop: int
    fwd_kinds: Tuple[int, ...]  # per spatial axis
    inv_kinds: Tuple[int, ...]
    pin_dc: bool  # all-Neumann nullspace pin (FftwPatchSolver.h:197)


class Level:
    """Device tables + jitted core ops for one refinement level."""

    def __init__(self, patch_level: PatchLevel, dtype=jnp.float64,
                 patch_solver: str = "dft", iface_scheme: str = "bilinear"):
        self.patch_solver_kind = patch_solver  # "dft" (spectral) | "bcgs"
        self.iface_scheme = iface_scheme
        self.pl = patch_level
        self.D = patch_level.D
        self.n = patch_level.n
        self.P = patch_level.num_patches
        self.dtype = dtype
        self.m = self.n ** (self.D - 1)
        # Hand-written Pallas kernels for the stencil/spectral pipeline were
        # built, validated on chip, and REMOVED in round 2: at production
        # patch sizes (n=8..32) Mosaic pads the 16-wide patch tiles to the
        # 128-lane registers (min f32 tile 8x128) while XLA reshapes the
        # whole batch into well-tiled GEMMs — measured 2-5x in XLA's favor
        # (docs/PERFORMANCE.md).  The batched-matmul formulation below IS
        # the TPU-native design; Pallas re-enters only if a fused
        # gather+stencil kernel beats XLA at realistic sizes.

        t = getattr(patch_level, "prebuilt_iface_tables", None)
        if t is None or iface_scheme != "bilinear":
            t = iface_mod.build_iface_tables(patch_level, scheme=iface_scheme)
        self.tables = t
        self.num_ifaces = t.num_ifaces
        self.face_depth = getattr(t, "face_depth", 1)

        f = lambda x: jnp.asarray(x)
        self.iface_idx = f(t.iface_side_idx)
        self.iface_mask = f(t.iface_side_mask)

        # gather-form of the interface reduction: per interface, the (padded)
        # list of contribution rows that accumulate into it — turns the
        # scatter-add in `interpolate` into a gather+sum, which XLA/TPU
        # executes far more efficiently.
        # --- contribution pipeline, case-sorted for matmul templates -------
        # Per-element index arithmetic (take_along_axis) is catastrophically
        # slow on TPU; instead each case's (weights, source-index) template
        # becomes a dense m×m matrix and contributions are sorted by case so
        # each case is one [R, m] @ [m, m] matmul on the MXU.
        C = len(t.contrib_patch)
        ncase = t.case_w.shape[0]
        m = t.m
        case_T = np.zeros((ncase, m, m))
        for k in range(ncase):
            for i in range(m):
                for kk in range(t.case_w.shape[2]):
                    w = t.case_w[k, i, kk]
                    if w != 0.0:
                        case_T[k, i, t.case_src[k, i, kk]] += w
        self._case_T = f(case_T).astype(dtype)  # [ncase, m, m]
        # cases whose template is a scalar multiple of the identity
        # (normal = I/2, c2c = I/3 — the bulk of all contributions) are
        # applied as elementwise scalings: exact at any precision and far
        # cheaper than a matmul
        self._case_scalar = []
        for k in range(ncase):
            diag = np.diag(case_T[k])
            if np.allclose(case_T[k], np.diag(diag)) and np.allclose(diag, diag[0] if m else 0):
                self._case_scalar.append(float(diag[0]) if m else 0.0)
            else:
                self._case_scalar.append(None)

        # contributions sorted scalars-first (stable by case): the scalar
        # prefix applies in ONE elementwise multiply with per-row weights,
        # and the matmul remainder in ONE batched contraction with
        # per-row-gathered templates — two ops replacing ~#cases
        # slices+matmuls (in-graph op latency is a first-order cost)
        is_mm = np.array(
            [self._case_scalar[int(k)] is None for k in t.contrib_case],
            dtype=bool,
        )
        order = np.lexsort((np.arange(C), t.contrib_case, is_mm))
        self._c_patch_sorted = f(t.contrib_patch[order])
        self._c_side_sorted = f(t.contrib_side[order])
        cs = t.contrib_case[order]
        self._n_scalar = int((~is_mm).sum())
        w_row = np.array(
            [self._case_scalar[int(k)] for k in cs[: self._n_scalar]]
        )
        self._w_scalar = f(w_row.reshape(-1, 1)).astype(dtype)
        self._T_rows = f(case_T[cs[self._n_scalar:]]).astype(dtype)  # [Cm,m,m]

        # per-interface gather of its (sorted-order) contribution rows
        by_iface = [[] for _ in range(t.num_ifaces)]
        sorted_iface = t.contrib_iface[order]
        for c in range(C):
            by_iface[int(sorted_iface[c])].append(c)
        K_if = max((len(v) for v in by_iface), default=1)
        gather_tbl = np.full((t.num_ifaces, K_if), C, dtype=np.int32)  # C = zero row
        for i, v in enumerate(by_iface):
            gather_tbl[i, : len(v)] = v
        self._iface_gather = f(gather_tbl)

        # stencil coefficients
        h2inv = (1.0 / patch_level.spacings**2).astype(np.float64)
        self.h2inv = f(h2inv).astype(dtype)  # [P, D]
        # ghost closure: ghost = c*u_b + 2*gamma; c=+1 Neumann, -1 otherwise
        # (StarPatchOp.h:39-65: interface/Dirichlet rows -3u_b, Neumann -1u_b)
        coef = np.where(patch_level.neumann, 1.0, -1.0)
        self.ghost_coef = f(coef).astype(dtype)  # [P, 2D]

        self._build_solver_groups()
        self._jit_cache = {}
        # multi-chip: optional device mesh; when set, the core ops pin
        # their outputs to the patch-axis sharding so XLA partitions the
        # whole pipeline (gathers become ICI collectives — the TPU-native
        # replacement of the reference's VecScatters, SURVEY.md §5)
        self.mesh = None
        self._psh = None
        self._gsh = None

    # -- sharding ------------------------------------------------------------

    def set_mesh(self, mesh) -> None:
        """Shard this level's ops over ``mesh`` (1D, axis ``"p"``): patch
        arrays on the leading patch axis, interface vectors on the leading
        interface axis."""
        from jax.sharding import NamedSharding, PartitionSpec

        self.mesh = mesh
        if mesh is None:
            self._psh = self._gsh = None
            return
        self._psh = NamedSharding(mesh, PartitionSpec("p"))
        self._gsh = NamedSharding(mesh, PartitionSpec("p"))

    def _constrain_p(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._psh is None:
            return x
        return jax.lax.with_sharding_constraint(x, self._psh)

    def _constrain_g(self, g: jnp.ndarray) -> jnp.ndarray:
        if self._gsh is None or g.shape[0] == 0:
            return g
        return jax.lax.with_sharding_constraint(g, self._gsh)

    # -- patch-solver grouping ---------------------------------------------

    def _build_solver_groups(self) -> None:
        pl, D, n = self.pl, self.D, self.n
        P = self.P
        keys = []
        for p in range(P):
            key = tuple(
                tr.axis_transforms(bool(pl.neumann[p, 2 * a]), bool(pl.neumann[p, 2 * a + 1]))[:2]
                for a in range(D)
            )
            keys.append(key)
        order = sorted(range(P), key=lambda p: (keys[p], p))
        perm = np.array(order, dtype=np.int64)
        inv_perm = np.empty(P, dtype=np.int64)
        inv_perm[perm] = np.arange(P)
        self._solver_perm = jnp.asarray(perm)
        self._solver_inv_perm = jnp.asarray(inv_perm)
        self._solver_identity_perm = bool(np.all(perm == np.arange(P)))

        # eigen denominators in SORTED order, [P, *ns]
        denom = np.zeros((P,) + pl.ns_shape)
        for i, p in enumerate(order):
            acc = np.zeros(pl.ns_shape)
            for a in range(D):
                delta = tr.axis_transforms(
                    bool(pl.neumann[p, 2 * a]), bool(pl.neumann[p, 2 * a + 1])
                )[2]
                lam = tr.axis_eigenvalues(n, float(pl.spacings[p, a]), delta)
                shape = [1] * D
                shape[D - 1 - a] = n
                acc = acc + lam.reshape(shape)
            denom[i] = acc
        self._denom_sorted = jnp.asarray(denom).astype(self.dtype)

        groups: List[_SolveGroup] = []
        start = 0
        while start < P:
            stop = start
            k = keys[order[start]]
            while stop < P and keys[order[stop]] == k:
                stop += 1
            all_neu = bool(
                np.all(pl.neumann[order[start]])
            )  # key all-(DCT_II,DCT_III) <=> every side Neumann
            groups.append(
                _SolveGroup(
                    start=start,
                    stop=stop,
                    fwd_kinds=tuple(kk[0] for kk in k),
                    inv_kinds=tuple(kk[1] for kk in k),
                    pin_dc=all_neu,
                )
            )
            start = stop
        self._solve_groups = groups
        kinds_used = sorted(
            {kk for g in groups for kk in g.fwd_kinds + g.inv_kinds}
        )
        self._tmats = {
            kk: jnp.asarray(tr.transform_matrix(kk, n)).astype(self.dtype)
            for kk in kinds_used
        }

    # -- core linear maps ---------------------------------------------------

    def interpolate(self, u: jnp.ndarray) -> jnp.ndarray:
        """Trace interpolation: ``gamma[NIf, m]`` from patch values."""
        if self.num_ifaces == 0:  # single isolated patch (coarsest level)
            return jnp.zeros((0, self.m), dtype=u.dtype)
        faces = extract_faces(u, self.D, self.n, self.face_depth)  # [P, 2D*depth, m]
        g = faces[self._c_patch_sorted, self._c_side_sorted]  # [C, m], scalars first
        C, Cs = g.shape[0], self._n_scalar
        parts = []
        if Cs > 0:
            # identity-scaled templates (normal/c2c — the bulk): one
            # elementwise multiply, exact at any precision
            parts.append(
                jax.lax.slice_in_dim(g, 0, Cs, axis=0)
                * self._w_scalar.astype(u.dtype)
            )
        if Cs < C:
            # refinement-boundary cases: one batched contraction with
            # per-row templates, in true-f32 (the default bf16 MXU passes
            # cost ~3 digits, which the 2/h^2 ghost closure amplifies into
            # O(1e-3) operator error — fatal for f32 Krylov)
            rows = jax.lax.slice_in_dim(g, Cs, C, axis=0)
            parts.append(
                jnp.einsum(
                    "rj,rij->ri",
                    rows,
                    self._T_rows.astype(u.dtype),
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
        vals = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        # gather-form reduction onto interfaces (row C is the zero pad)
        vals_padded = jnp.concatenate(
            [vals, jnp.zeros((1, self.m), dtype=vals.dtype)], axis=0
        )
        return self._constrain_g(jnp.sum(vals_padded[self._iface_gather], axis=1))

    def gamma_faces(self, gamma: jnp.ndarray) -> jnp.ndarray:
        """Per-patch-side interface traces ``[P, 2D, m]`` (zero where no nbr)."""
        if self.num_ifaces == 0:
            return jnp.zeros((self.P, 2 * self.D, self.m), dtype=gamma.dtype)
        gf = gamma[self.iface_idx]  # [P, 2D, m]
        return gf * self.iface_mask[..., None]

    def _face_shaped(self, flat: jnp.ndarray) -> jnp.ndarray:
        """[P, m] face vector -> [P, *face_dims] matching an axis slice."""
        return flat.reshape((self.P,) + (self.n,) * (self.D - 1))

    def apply_with_interface(self, u: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
        """Stencil apply with explicit interface values
        (``StarPatchOp::applyWithInterface``, ``StarPatchOp.h:28-184``)."""
        return self._stencil_with_faces(u, self.gamma_faces(gamma))

    def _stencil_with_faces(self, u: jnp.ndarray, gf: jnp.ndarray) -> jnp.ndarray:
        D, n = self.D, self.n
        out = jnp.zeros_like(u)
        for a in range(D):
            ax = _arr_axis(D, a)
            u_lo = jnp.take(u, 0, axis=ax)
            u_hi = jnp.take(u, n - 1, axis=ax)
            c_lo = self.ghost_coef[:, 2 * a].reshape((self.P,) + (1,) * (D - 1))
            c_hi = self.ghost_coef[:, 2 * a + 1].reshape((self.P,) + (1,) * (D - 1))
            ghost_lo = c_lo * u_lo + 2.0 * self._face_shaped(gf[:, 2 * a])
            ghost_hi = c_hi * u_hi + 2.0 * self._face_shaped(gf[:, 2 * a + 1])
            lo = jnp.concatenate(
                [jnp.expand_dims(ghost_lo, ax), jax.lax.slice_in_dim(u, 0, n - 1, axis=ax)],
                axis=ax,
            )
            hi = jnp.concatenate(
                [jax.lax.slice_in_dim(u, 1, n, axis=ax), jnp.expand_dims(ghost_hi, ax)],
                axis=ax,
            )
            h2i = self.h2inv[:, a].reshape((self.P,) + (1,) * D)
            out = out + (lo - 2.0 * u + hi) * h2i
        return self._constrain_p(out)

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """Composite-grid operator ``A u`` (``SchurHelper.h:360-376``)."""
        return self.apply_with_interface(u, self.interpolate(u))

    def _fold_gamma_into_rhs(self, fc: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
        """``f_slice -= 2/h^2 * gamma`` on every neighbored side
        (``StarPatchOp::addInterfaceToRHS``, ``StarPatchOp.h:185-203``)."""
        return self._fold_faces_into_rhs(fc, self.gamma_faces(gamma))

    def _fold_faces_into_rhs(self, fc: jnp.ndarray, gf: jnp.ndarray) -> jnp.ndarray:
        D, n = self.D, self.n
        for a in range(D):
            ax = _arr_axis(D, a)
            h2i = self.h2inv[:, a].reshape((self.P,) + (1,) * (D - 1))
            idx_lo = tuple(
                [slice(None)] * ax + [0] + [slice(None)] * (D - (ax - 1) - 1)
            )
            idx_hi = tuple(
                [slice(None)] * ax + [n - 1] + [slice(None)] * (D - (ax - 1) - 1)
            )
            fc = fc.at[idx_lo].add(-2.0 * h2i * self._face_shaped(gf[:, 2 * a]))
            fc = fc.at[idx_hi].add(-2.0 * h2i * self._face_shaped(gf[:, 2 * a + 1]))
        return fc

    @staticmethod
    def _apply_transform(M: jnp.ndarray, x: jnp.ndarray, ax: int) -> jnp.ndarray:
        """Apply n×n transform along array axis ``ax`` as one big matmul."""
        n = M.shape[0]
        moved = jnp.moveaxis(x, ax, -1)
        shape = moved.shape
        # default matmul precision: the spectral solves only serve the
        # smoother/preconditioner, where bf16 MXU passes are plenty
        y = moved.reshape(-1, n) @ M.T
        return jnp.moveaxis(y.reshape(shape), -1, ax)

    def patch_solve_faces(self, f: jnp.ndarray, gf: jnp.ndarray) -> jnp.ndarray:
        """Patch solves with explicit per-patch-side trace values
        ``gf[P, 2D, m]`` (used by Schur probing)."""
        return self._spectral_solve(self._fold_faces_into_rhs(f, gf))

    def patch_solve(self, f: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
        """Exact per-patch solves: spectral diagonalization by default
        (``FftwPatchSolver.h:173-206``), or batched per-patch BiCGStab when
        constructed with ``patch_solver="bcgs"`` (the reference
        ``BiCGStabSolver`` fallback)."""
        fc = self._fold_gamma_into_rhs(f, gamma)
        if self.patch_solver_kind == "bcgs":
            from .patch_bcgs import batched_patch_bicgstab

            zero_g = jnp.zeros((self.num_ifaces, self.m), dtype=f.dtype)
            return batched_patch_bicgstab(
                lambda u: self.apply_with_interface(u, zero_g), fc,
                tol=1e-12, max_iter=500,
            )
        return self._spectral_solve(fc)

    def _spectral_solve(self, fc: jnp.ndarray) -> jnp.ndarray:
        D, n = self.D, self.n
        fs = fc if self._solver_identity_perm else fc[self._solver_perm]
        parts = []
        scale = (2.0 / n) ** D
        for g in self._solve_groups:
            x = jax.lax.slice_in_dim(fs, g.start, g.stop, axis=0)
            dn = jax.lax.slice_in_dim(self._denom_sorted, g.start, g.stop, axis=0)
            for a in range(D):
                x = self._apply_transform(self._tmats[g.fwd_kinds[a]], x, _arr_axis(D, a))
            x = x / dn
            if g.pin_dc:
                zero_idx = (slice(None),) + (0,) * D
                x = x.at[zero_idx].set(0.0)
            for a in range(D):
                x = self._apply_transform(self._tmats[g.inv_kinds[a]], x, _arr_axis(D, a))
            parts.append(x * scale)
        us = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        us = us if self._solver_identity_perm else us[self._solver_inv_perm]
        return self._constrain_p(us)

    def smooth(self, f: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """One FFT block-Jacobi sweep (``SchurHelper::solveWithSolution``)."""
        return self.patch_solve(f, self.interpolate(u))

    def smooth_zero(self, f: jnp.ndarray) -> jnp.ndarray:
        """``smooth(f, 0)``: with a zero iterate the interface traces are
        identically zero, so the whole interpolate/gather/RHS-fold pipeline
        drops out — just the batched spectral solve.  Used for the first
        pre-smooth of every GMG level visit (latency-bound at deep levels)."""
        if self.patch_solver_kind == "bcgs":
            zero_g = jnp.zeros((self.num_ifaces, self.m), dtype=f.dtype)
            return self.patch_solve(f, zero_g)
        return self._spectral_solve(f)

    def solve_with_interface(self, f: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
        """Patch solves with explicit interface values (Schur path)."""
        return self.patch_solve(f, gamma)

    # -- reductions ---------------------------------------------------------

    def integrate(self, u: jnp.ndarray) -> jnp.ndarray:
        """Volume integral (``Domain.h:258-278``)."""
        cellvol = jnp.prod(jnp.asarray(self.pl.spacings), axis=1)
        sums = jnp.sum(u.reshape(self.P, -1), axis=1)
        return jnp.sum(sums * cellvol)

    @property
    def volume(self) -> float:
        return self.pl.volume()

    def zeros(self) -> jnp.ndarray:
        return jnp.zeros((self.P,) + self.pl.ns_shape, dtype=self.dtype)
