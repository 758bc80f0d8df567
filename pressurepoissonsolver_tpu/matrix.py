"""Explicit matrix assembly for the composite operator.

TPU-native replacement of the reference's L6 matrix layer
(``MatrixHelper``/``MatrixHelper2d``/``SchurMatrixHelper*`` — SURVEY.md
§2.6): instead of hand-written boundary-closure stencil tables, the global
CSR matrix is composed algebraically from the same host tables the
matrix-free path uses,

    ``A = L_patch + G @ Gamma``

where ``L_patch`` is the block-diagonal patch stencil (with the per-side
boundary coefficients), ``Gamma`` the trace-interpolation matrix
(u -> interface values) and ``G`` the ghost-closure injection
(``+2 gamma / h^2`` into boundary rows).  By construction the assembled
matrix is *exactly* the matrix-free operator — the invariant the tests
check with random vectors.

The assembled matrix serves: direct sparse solves for validation, the
``crs`` matrix-type option, and AMG-style external solvers.  A BCOO
wrapper provides a jittable device SpMV.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp

from .domain import PatchLevel
from .iface import IfaceTables, build_iface_tables


def _face_cell_flat(D: int, n: int, s: int) -> np.ndarray:
    """Flat in-patch cell index of each face-vector entry of side ``s``.

    Face vector order: lowest remaining axis fastest; patch flat order:
    C order of [z, y, x] (x fastest)."""
    a = s // 2
    fixed = 0 if s % 2 == 0 else n - 1
    m = n ** (D - 1)
    idx = np.arange(m)
    coords = np.zeros((m, D), dtype=np.int64)  # coords[:, axis]
    rem = [ax for ax in range(D) if ax != a]
    for k, ax in enumerate(rem):
        coords[:, ax] = (idx // (n**k)) % n
    coords[:, a] = fixed
    flat = np.zeros(m, dtype=np.int64)
    for ax in range(D):
        flat += coords[:, ax] * (n**ax)
    return flat


def assemble_interpolation(level: PatchLevel, tables: IfaceTables = None) -> sp.csr_matrix:
    """``Gamma``: (num_ifaces*m) x (P*n^D) trace-interpolation matrix."""
    t = tables or build_iface_tables(level)
    D, n = level.D, level.n
    m = t.m
    cells = n**D
    rows, cols, vals = [], [], []
    for c in range(len(t.contrib_patch)):
        p = int(t.contrib_patch[c])
        s = int(t.contrib_side[c])
        i = int(t.contrib_iface[c])
        k = int(t.contrib_case[c])
        W = t.case_w[k]  # [m, K]
        S = t.case_src[k]
        face_flat = _face_cell_flat(D, n, s)
        for out_i in range(m):
            for kk in range(W.shape[1]):
                w = W[out_i, kk]
                if w != 0.0:
                    rows.append(i * m + out_i)
                    cols.append(p * cells + face_flat[S[out_i, kk]])
                    vals.append(w)
    return sp.csr_matrix(
        (vals, (rows, cols)), shape=(t.num_ifaces * m, level.num_patches * cells)
    )


def assemble_patch_stencil(level: PatchLevel) -> sp.csr_matrix:
    """Block-diagonal patch Laplacian with boundary-closure coefficients
    (the homogeneous part of ``StarPatchOp::applyWithInterface``)."""
    D, n = level.D, level.n
    P = level.num_patches
    cells = n**D
    rows, cols, vals = [], [], []
    coords = np.zeros((cells, D), dtype=np.int64)
    idx = np.arange(cells)
    for ax in range(D):
        coords[:, ax] = (idx // (n**ax)) % n
    for p in range(P):
        base = p * cells
        for a in range(D):
            h2inv = 1.0 / level.spacings[p, a] ** 2
            x = coords[:, a]
            # diagonal
            neum_lo = level.neumann[p, 2 * a]
            neum_hi = level.neumann[p, 2 * a + 1]
            c_lo = -1.0 if neum_lo else -3.0
            c_hi = -1.0 if neum_hi else -3.0
            diag = np.where(x == 0, c_lo, np.where(x == n - 1, c_hi, -2.0))
            rows.extend(base + idx)
            cols.extend(base + idx)
            vals.extend(diag * h2inv)
            # off-diagonals along axis a
            sel = x < n - 1
            rows.extend(base + idx[sel])
            cols.extend(base + idx[sel] + n**a)
            vals.extend(np.full(sel.sum(), h2inv))
            rows.extend(base + idx[sel] + n**a)
            cols.extend(base + idx[sel])
            vals.extend(np.full(sel.sum(), h2inv))
    return sp.csr_matrix((vals, (rows, cols)), shape=(P * cells, P * cells))


def assemble_ghost_injection(level: PatchLevel, tables: IfaceTables = None) -> sp.csr_matrix:
    """``G``: (P*n^D) x (num_ifaces*m) injection of ``2 gamma / h^2`` into
    boundary rows of neighbored sides."""
    t = tables or build_iface_tables(level)
    D, n = level.D, level.n
    m = t.m
    cells = n**D
    rows, cols, vals = [], [], []
    for p in range(level.num_patches):
        for s in range(2 * D):
            if not t.iface_side_mask[p, s]:
                continue
            i = int(t.iface_side_idx[p, s])
            a = s // 2
            h2inv = 1.0 / level.spacings[p, a] ** 2
            face_flat = _face_cell_flat(D, n, s)
            rows.extend(p * cells + face_flat)
            cols.extend(i * m + np.arange(m))
            vals.extend(np.full(m, 2.0 * h2inv))
    return sp.csr_matrix(
        (vals, (rows, cols)), shape=(level.num_patches * cells, t.num_ifaces * m)
    )


def assemble_composite(level: PatchLevel) -> sp.csr_matrix:
    """The full composite-grid operator as CSR: ``A = L + G @ Gamma``."""
    t = build_iface_tables(level)
    L = assemble_patch_stencil(level)
    G = assemble_ghost_injection(level, t)
    Gamma = assemble_interpolation(level, t)
    return (L + G @ Gamma).tocsr()


def assemble_schur(level) -> sp.csr_matrix:
    """The explicit Schur interface matrix ``A_S = I - S`` by probing.

    TPU-native analog of the reference's probed Schur assembly
    (``SchurMatrixHelper2d.cpp:130-190``): instead of canonicalizing BC
    classes and solving one patch per class, probe *all* patches at once —
    for each (side, face-index) pair, one batched spectral solve gives
    every patch's response to a unit trace on that side, and the trace
    interpolation weights distribute the responses into m×m blocks of S
    attributed to each source interface.

    ``level`` is an ``ops.level_ops.Level``.
    """
    import jax.numpy as jnp

    from .ops.level_ops import extract_faces

    D, n = level.D, level.n
    t = level.tables
    m = t.m
    S2 = 2 * D
    NIf = t.num_ifaces
    P = level.P

    cw = t.case_w  # [ncase, m, K]
    cs = t.case_src
    C = len(t.contrib_patch)
    zero_f = np.zeros((P,) + level.pl.ns_shape)

    rows, cols, vals = [], [], []
    for s in range(S2):
        src_iface = t.iface_side_idx[:, s]  # [P]
        src_mask = t.iface_side_mask[:, s]
        for j in range(m):
            gf = np.zeros((P, S2, m))
            gf[:, s, j] = 1.0
            u = np.asarray(
                level.patch_solve_faces(jnp.asarray(zero_f, dtype=level.dtype),
                                        jnp.asarray(gf, dtype=level.dtype))
            )
            faces = np.asarray(extract_faces(jnp.asarray(u), D, n))  # [P, 2D, m]
            # contribution values: vals_c[c, :] = W_case ⊛ faces[p_c, s_c]
            g = faces[t.contrib_patch, t.contrib_side]  # [C, m]
            gv = np.take_along_axis(
                g, cs[t.contrib_case].reshape(C, -1), axis=1
            ).reshape(C, m, -1)
            vc = np.sum(cw[t.contrib_case] * gv, axis=-1)  # [C, m]
            # source column: only patches with a real iface on side s
            pmask = src_mask[t.contrib_patch]
            sel = np.where(pmask)[0]
            for c in sel:
                p = t.contrib_patch[c]
                rows.append(t.contrib_iface[c] * m + np.arange(m))
                cols.append(np.full(m, src_iface[p] * m + j))
                vals.append(vc[c])
    S_mat = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(NIf * m, NIf * m),
    )
    return (sp.identity(NIf * m, format="csr") - S_mat).tocsr()


def schur_block_jacobi(level, A_S: sp.csr_matrix = None):
    """Block-Jacobi preconditioner for the interface system: inverts the
    m×m diagonal blocks of ``I - S`` (the reference's ``PBMatrix``
    ``getDiagInv`` + ``BlockJacobiSmoother``,
    ``Experimental/PBMatrix.cpp``)."""
    import jax.numpy as jnp

    if A_S is None:
        A_S = assemble_schur(level)
    m = level.m
    NIf = level.num_ifaces
    blocks = np.zeros((NIf, m, m))
    Acoo = A_S.tocoo()
    ri, ci, v = Acoo.row, Acoo.col, Acoo.data
    same = (ri // m) == (ci // m)
    for r, c, x in zip(ri[same], ci[same], v[same]):
        blocks[r // m, r % m, c % m] += x
    binv = np.linalg.inv(blocks)
    binv_j = jnp.asarray(binv, dtype=level.dtype)

    def M(gamma):
        return jnp.einsum("bij,bj->bi", binv_j, gamma)

    return M


def bcoo_matvec(csr: sp.csr_matrix):
    """Wrap a host CSR as a jittable device SpMV (BCOO)."""
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    coo = csr.tocoo()
    mat = jsparse.BCOO(
        (jnp.asarray(coo.data), jnp.asarray(np.stack([coo.row, coo.col], axis=1))),
        shape=coo.shape,
    )

    def mv(x):
        shape = x.shape
        return (mat @ x.ravel()).reshape(shape)

    return mv
