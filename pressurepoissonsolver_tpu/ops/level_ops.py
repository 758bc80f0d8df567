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


@dataclass
class _SolverTables:
    """Spectral patch-solve data for a (subset of a) level, BC-sorted."""

    perm: jnp.ndarray
    inv_perm: jnp.ndarray
    identity_perm: bool
    denom_sorted: jnp.ndarray  # [Ps, *ns]
    groups: List[_SolveGroup]
    tmats: dict  # transform kind -> [n, n] matrix


def _build_solver_tables(pl: PatchLevel, dtype, slots: np.ndarray) -> _SolverTables:
    """BC-grouped spectral solver tables for patch slots ``slots`` (the
    reference's plan cache keyed on (neumann bits, h),
    ``FftwPatchSolver.h:33-47``, generalized to an arbitrary patch subset
    for the FAC active-set smoother)."""
    D, n = pl.D, pl.n
    Ps = len(slots)
    keys = []
    for p in slots:
        keys.append(tuple(
            tr.axis_transforms(bool(pl.neumann[p, 2 * a]), bool(pl.neumann[p, 2 * a + 1]))[:2]
            for a in range(D)
        ))
    order = sorted(range(Ps), key=lambda i: (keys[i], i))
    perm = np.array(order, dtype=np.int64)
    inv_perm = np.empty(Ps, dtype=np.int64)
    inv_perm[perm] = np.arange(Ps)

    denom = np.zeros((Ps,) + pl.ns_shape)
    for i, si in enumerate(order):
        p = slots[si]
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

    groups: List[_SolveGroup] = []
    start = 0
    while start < Ps:
        stop = start
        k = keys[order[start]]
        while stop < Ps and keys[order[stop]] == k:
            stop += 1
        all_neu = bool(np.all(pl.neumann[slots[order[start]]]))
        groups.append(_SolveGroup(
            start=start, stop=stop,
            fwd_kinds=tuple(kk[0] for kk in k),
            inv_kinds=tuple(kk[1] for kk in k),
            pin_dc=all_neu,
        ))
        start = stop
    kinds_used = sorted({kk for g in groups for kk in g.fwd_kinds + g.inv_kinds})
    tmats = {
        kk: jnp.asarray(tr.transform_matrix(kk, n)).astype(dtype)
        for kk in kinds_used
    }
    return _SolverTables(
        perm=jnp.asarray(perm),
        inv_perm=jnp.asarray(inv_perm),
        identity_perm=bool(np.all(perm == np.arange(Ps))),
        denom_sorted=jnp.asarray(denom).astype(dtype),
        groups=groups,
        tmats=tmats,
    )


def _star_stencil(
    u: jnp.ndarray,
    gf: jnp.ndarray,
    ghost_coef: jnp.ndarray,
    h2inv: jnp.ndarray,
    D: int,
    n: int,
) -> jnp.ndarray:
    """Batched star-stencil apply with explicit face traces ``gf[P, 2D, m]``
    and per-patch ghost closures (``StarPatchOp.h:28-184``)."""
    P = u.shape[0]
    face_shape = (P,) + (n,) * (D - 1)
    out = jnp.zeros_like(u)
    for a in range(D):
        ax = _arr_axis(D, a)
        u_lo = jnp.take(u, 0, axis=ax)
        u_hi = jnp.take(u, n - 1, axis=ax)
        c_lo = ghost_coef[:, 2 * a].reshape((P,) + (1,) * (D - 1))
        c_hi = ghost_coef[:, 2 * a + 1].reshape((P,) + (1,) * (D - 1))
        ghost_lo = c_lo * u_lo + 2.0 * gf[:, 2 * a].reshape(face_shape)
        ghost_hi = c_hi * u_hi + 2.0 * gf[:, 2 * a + 1].reshape(face_shape)
        lo = jnp.concatenate(
            [jnp.expand_dims(ghost_lo, ax), jax.lax.slice_in_dim(u, 0, n - 1, axis=ax)],
            axis=ax,
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(u, 1, n, axis=ax), jnp.expand_dims(ghost_hi, ax)],
            axis=ax,
        )
        h2i = h2inv[:, a].reshape((P,) + (1,) * D)
        out = out + (lo - 2.0 * u + hi) * h2i
    return out


@dataclass
class _ContribPipeline:
    """Case-sorted trace-interpolation pipeline over (a subset of) the
    interfaces: scalar-prefix contributions apply as one elementwise
    multiply, the matmul remainder as one batched contraction, and the
    interface reduction as one padded row gather + sum."""

    c_patch: jnp.ndarray  # [C] contributing patch slot (sorted order)
    c_side: jnp.ndarray  # [C] face row of the contribution
    n_scalar: int  # contributions 0..n_scalar use identity-scaled templates
    w_scalar: jnp.ndarray  # [n_scalar, 1] the scalings
    T_rows: jnp.ndarray  # [C - n_scalar, m, m] per-row matmul templates
    iface_gather: jnp.ndarray  # [NIf, K] contribution rows per interface

    def interpolate(self, faces: jnp.ndarray, m: int) -> jnp.ndarray:
        """gamma[NIf, m] from per-patch face traces [P, 2D*depth, m]."""
        g = faces[self.c_patch, self.c_side]  # [C, m], scalars first
        C, Cs = g.shape[0], self.n_scalar
        parts = []
        if Cs > 0:
            # identity-scaled templates (normal/c2c — the bulk): one
            # elementwise multiply, exact at any precision
            parts.append(
                jax.lax.slice_in_dim(g, 0, Cs, axis=0)
                * self.w_scalar.astype(g.dtype)
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
                    self.T_rows.astype(g.dtype),
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
        vals = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        vals_padded = jnp.concatenate(
            [vals, jnp.zeros((1, m), dtype=vals.dtype)], axis=0
        )
        return jnp.sum(vals_padded[self.iface_gather], axis=1)


def _build_contrib_pipeline(
    contrib_patch: np.ndarray,
    contrib_side: np.ndarray,
    contrib_case: np.ndarray,
    contrib_iface: np.ndarray,
    num_ifaces: int,
    case_T: np.ndarray,
    case_scalar: list,
    dtype,
) -> _ContribPipeline:
    C = len(contrib_patch)
    is_mm = np.array([case_scalar[int(k)] is None for k in contrib_case], dtype=bool)
    order = np.lexsort((np.arange(C), contrib_case, is_mm))
    cs = contrib_case[order]
    n_scalar = int((~is_mm).sum())
    w_row = np.array([case_scalar[int(k)] for k in cs[:n_scalar]], dtype=np.float64)
    # per-interface gather of its (sorted-order) contribution rows
    by_iface = [[] for _ in range(num_ifaces)]
    sorted_iface = contrib_iface[order]
    for c in range(C):
        by_iface[int(sorted_iface[c])].append(c)
    K_if = max((len(v) for v in by_iface), default=1)
    gather_tbl = np.full((num_ifaces, K_if), C, dtype=np.int32)  # C = zero row
    for i, v in enumerate(by_iface):
        gather_tbl[i, : len(v)] = v
    f = jnp.asarray
    return _ContribPipeline(
        c_patch=f(contrib_patch[order]),
        c_side=f(contrib_side[order]),
        n_scalar=n_scalar,
        w_scalar=f(w_row.reshape(-1, 1)).astype(dtype),
        T_rows=f(case_T[cs[n_scalar:]]).astype(dtype),
        iface_gather=f(gather_tbl),
    )


def _spectral_apply(st: _SolverTables, fc: jnp.ndarray, D: int, n: int) -> jnp.ndarray:
    """Batched spectral patch solves with the tables ``st`` (the jittable
    core of ``Level._spectral_solve``)."""
    fs = fc if st.identity_perm else fc[st.perm]
    parts = []
    scale = (2.0 / n) ** D
    for g in st.groups:
        x = jax.lax.slice_in_dim(fs, g.start, g.stop, axis=0)
        dn = jax.lax.slice_in_dim(st.denom_sorted, g.start, g.stop, axis=0)
        for a in range(D):
            x = Level._apply_transform(st.tmats[g.fwd_kinds[a]], x, _arr_axis(D, a))
        x = x / dn
        if g.pin_dc:
            zero_idx = (slice(None),) + (0,) * D
            x = x.at[zero_idx].set(0.0)
        for a in range(D):
            x = Level._apply_transform(st.tmats[g.inv_kinds[a]], x, _arr_axis(D, a))
        parts.append(x * scale)
    us = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return us if st.identity_perm else us[st.inv_perm]


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
        self._pipe = _build_contrib_pipeline(
            t.contrib_patch, t.contrib_side, t.contrib_case, t.contrib_iface,
            t.num_ifaces, case_T, self._case_scalar, dtype,
        )

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
        self._st = _build_solver_tables(
            self.pl, self.dtype, np.arange(self.P, dtype=np.int64)
        )

    # solver-table views (the halo engine re-blocks these per shard)
    @property
    def _solve_groups(self):
        return self._st.groups

    @property
    def _tmats(self):
        return self._st.tmats

    @property
    def _denom_sorted(self):
        return self._st.denom_sorted

    @property
    def _solver_inv_perm(self):
        return self._st.inv_perm

    # -- core linear maps ---------------------------------------------------

    def interpolate(self, u: jnp.ndarray) -> jnp.ndarray:
        """Trace interpolation: ``gamma[NIf, m]`` from patch values."""
        if self.num_ifaces == 0:  # single isolated patch (coarsest level)
            return jnp.zeros((0, self.m), dtype=u.dtype)
        faces = extract_faces(u, self.D, self.n, self.face_depth)  # [P, 2D*depth, m]
        return self._constrain_g(self._pipe.interpolate(faces, self.m))

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
        return self._constrain_p(
            _star_stencil(u, gf, self.ghost_coef, self.h2inv, self.D, self.n)
        )

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
        return self._constrain_p(_spectral_apply(self._st, fc, self.D, self.n))

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

    def gamma_zeros(self, dtype=None) -> jnp.ndarray:
        """Zero interface vector in this engine's gamma layout."""
        return self._constrain_g(
            jnp.zeros((self.num_ifaces, self.m), dtype=dtype or self.dtype)
        )

    def schur_S(self, gamma: jnp.ndarray) -> jnp.ndarray:
        """Matrix-free Schur operator ``S gamma = interp(patch_solve(0, g))``
        (``SchurWrapOp.h:47-53``)."""
        zf = jnp.zeros((self.P,) + self.pl.ns_shape, dtype=gamma.dtype)
        return self.interpolate(self.patch_solve(zf, gamma))

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


class ActiveSmoother:
    """FAC active-set block-Jacobi smoother, subset-compute form.

    One sweep replaces the iterate on a static subset of patches with their
    exact patch solves (traces interpolated from the full current iterate);
    every other patch is left untouched.  Only the interfaces adjacent to
    active patches are interpolated and only active patches are solved, so
    a sweep costs O(active) instead of O(level).

    This is the classical-FAC relaxation (each level relaxes only the
    region it is the finest representation of); the reference instead
    relaxes every patch of every level
    (``GMG/FFTBlockJacobiSmoother.h:31-59``) — on its pass-through-heavy
    FAC hierarchies ~90-95% of that work re-relaxes patches that are
    bit-identical on the finer level.  Measured: iteration counts are
    unchanged (docs/PERFORMANCE.md round 2).
    """

    def __init__(self, level: Level, active: np.ndarray, build_solver: bool = True):
        self.level = level
        D, n, m = level.D, level.n, level.m
        self.D, self.n, self.m = D, n, m
        P = level.P
        act = np.where(np.asarray(active))[0]
        self.act = act
        self.Pa = len(act)
        f = jnp.asarray
        self._act = f(act)
        self._mask = f(np.asarray(active).reshape((P,) + (1,) * D))
        inv = np.full(P, self.Pa, dtype=np.int32)  # pad row = untouched
        inv[act] = np.arange(self.Pa, dtype=np.int32)
        self._inv = f(inv)

        t = level.tables
        # interfaces the active patches read: remap to a compact range
        ii = np.asarray(t.iface_side_idx)[act]  # [Pa, 2D]
        mm = np.asarray(t.iface_side_mask)[act] > 0
        needed = np.unique(ii[mm]) if mm.any() else np.zeros(0, dtype=np.int64)
        self.num_sub_ifaces = len(needed)
        remap = np.full(max(t.num_ifaces, 1), -1, dtype=np.int64)
        remap[needed] = np.arange(len(needed))
        self._g_idx = f(np.clip(remap[ii], 0, None))
        self._g_mask = f(np.asarray(t.iface_side_mask)[act]).astype(level.dtype)

        # reduced contribution pipeline: only contributions that land on a
        # needed interface, sourcing faces from just the contributing
        # patches (active + their face neighbors)
        keep = remap[t.contrib_iface] >= 0
        cp = t.contrib_patch[keep]
        src = np.unique(cp) if len(cp) else np.zeros(0, dtype=np.int64)
        src_remap = np.full(P, -1, dtype=np.int64)
        src_remap[src] = np.arange(len(src))
        self._src = f(src)
        case_T = np.asarray(level._case_T, dtype=np.float64)
        self._pipe = _build_contrib_pipeline(
            src_remap[cp],
            t.contrib_side[keep],
            t.contrib_case[keep],
            remap[t.contrib_iface[keep]],
            self.num_sub_ifaces,
            case_T,
            level._case_scalar,
            level.dtype,
        )

        self._st = (
            _build_solver_tables(level.pl, level.dtype, act) if build_solver else None
        )
        self._h2inv_act = f(np.asarray(level.h2inv)[act])
        self._ghost_act = f(np.asarray(level.ghost_coef)[act])

    def _gamma_faces(self, u: jnp.ndarray) -> jnp.ndarray:
        """[Pa, 2D, m] interface traces at the active patches' faces,
        interpolated from the full iterate via the reduced pipeline."""
        lvl = self.level
        faces = extract_faces(u[self._src], self.D, self.n, lvl.face_depth)
        gamma = self._pipe.interpolate(faces, self.m)  # [NIsub, m]
        return gamma[self._g_idx] * self._g_mask.astype(u.dtype)[..., None]

    def _fold(self, fc: jnp.ndarray, gf: jnp.ndarray) -> jnp.ndarray:
        """``f -= 2/h^2 gamma`` on active patches' neighbored faces
        (``StarPatchOp::addInterfaceToRHS``)."""
        D, n, Pa = self.D, self.n, self.Pa
        face_shape = (Pa,) + (n,) * (D - 1)
        for a in range(D):
            ax = _arr_axis(D, a)
            h2i = self._h2inv_act[:, a].astype(fc.dtype).reshape(
                (Pa,) + (1,) * (D - 1)
            )
            idx_lo = tuple(
                [slice(None)] * ax + [0] + [slice(None)] * (D - (ax - 1) - 1)
            )
            idx_hi = tuple(
                [slice(None)] * ax + [n - 1] + [slice(None)] * (D - (ax - 1) - 1)
            )
            fc = fc.at[idx_lo].add(-2.0 * h2i * gf[:, 2 * a].reshape(face_shape))
            fc = fc.at[idx_hi].add(-2.0 * h2i * gf[:, 2 * a + 1].reshape(face_shape))
        return fc

    def _scatter(self, sol: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
        """Route the active solves back to their level slots (row gather —
        no device scatter), leaving ``base`` elsewhere."""
        pad = jnp.zeros((1,) + sol.shape[1:], dtype=sol.dtype)
        sol_pad = jnp.concatenate([sol, pad], axis=0)
        return jnp.where(self._mask, sol_pad[self._inv], base)

    def smooth(self, f: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        fa = f[self._act]
        if self.num_sub_ifaces:
            fa = self._fold(fa, self._gamma_faces(u))
        sol = _spectral_apply(self._st, fa, self.D, self.n)
        return self._scatter(sol, u)

    def smooth_zero(self, f: jnp.ndarray) -> jnp.ndarray:
        """``smooth(f, 0)`` — traces vanish, so just the subset solves."""
        sol = _spectral_apply(self._st, f[self._act], self.D, self.n)
        return self._scatter(sol, jnp.zeros((), dtype=f.dtype))

    def apply_scattered(self, u: jnp.ndarray) -> jnp.ndarray:
        """``A u`` scattered into a zero field, computed on the subset only.

        Exact for the full composite operator whenever ``u`` vanishes
        outside a set A with nbr(A) ⊆ this subset: every nonzero row of
        ``A u`` is then in the subset.  Used for the FAC coarse-level
        residual ``r = f − A u`` after active-set pre-smoothing, where
        ``u`` is nonzero only on the active patches."""
        gf = (
            self._gamma_faces(u)
            if self.num_sub_ifaces
            else jnp.zeros((self.Pa, 2 * self.D, self.m), dtype=u.dtype)
        )
        out = _star_stencil(
            u[self._act],
            gf,
            self._ghost_act.astype(u.dtype),
            self._h2inv_act.astype(u.dtype),
            self.D,
            self.n,
        )
        return self._scatter(out, jnp.zeros((), dtype=u.dtype))
