"""Assembled-matrix tests: CSR assembly must reproduce the matrix-free
operator exactly, and preconditioners must accelerate/keep convergence."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse.linalg as spla

from pressurepoissonsolver_tpu.domain import DomainHierarchy
from pressurepoissonsolver_tpu.geometry import refined_tree, uniform_tree
from pressurepoissonsolver_tpu.krylov import bicgstab
from pressurepoissonsolver_tpu.matrix import assemble_composite, bcoo_matvec
from pressurepoissonsolver_tpu.ops.level_ops import Level
from pressurepoissonsolver_tpu.precond import poly_cheb, schwarz
from pressurepoissonsolver_tpu.problems import get_problem, init_problem


@pytest.mark.parametrize("adaptive,neumann", [(False, False), (True, False), (True, True)])
def test_csr_matches_matrix_free_2d(adaptive, neumann):
    t = refined_tree(2, 2, 1) if adaptive else uniform_tree(2, 2)
    h = DomainHierarchy(t, n=4, neumann=neumann)
    lvl = Level(h.finest)
    A = assemble_composite(h.finest)
    rng = np.random.default_rng(0)
    for seed in range(3):
        u = rng.standard_normal((lvl.P, 4, 4))
        ref = np.asarray(lvl.apply(jnp.asarray(u))).ravel()
        np.testing.assert_allclose(A @ u.ravel(), ref, rtol=1e-12, atol=1e-12)


def test_csr_matches_matrix_free_3d():
    t = refined_tree(3, 2, 1)
    h = DomainHierarchy(t, n=4)
    lvl = Level(h.finest)
    A = assemble_composite(h.finest)
    rng = np.random.default_rng(1)
    u = rng.standard_normal((lvl.P, 4, 4, 4))
    ref = np.asarray(lvl.apply(jnp.asarray(u))).ravel()
    np.testing.assert_allclose(A @ u.ravel(), ref, rtol=1e-12, atol=1e-12)


def test_direct_sparse_solve_matches_krylov():
    t = uniform_tree(2, 3)
    h = DomainHierarchy(t, n=4)
    lvl = Level(h.finest)
    prob = get_problem("trig", 2)
    f, exact = init_problem(h.finest, prob)
    A = assemble_composite(h.finest).tocsc()
    u_direct = spla.spsolve(A, f.ravel())
    res = bicgstab(lvl.apply, jnp.asarray(f), tol=1e-13, max_iter=500)
    np.testing.assert_allclose(
        np.asarray(res.x).ravel(), u_direct, rtol=1e-8, atol=1e-10
    )


def test_bcoo_matvec_matches():
    t = uniform_tree(2, 2)
    h = DomainHierarchy(t, n=4)
    lvl = Level(h.finest)
    A = assemble_composite(h.finest)
    mv = bcoo_matvec(A)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((lvl.P, 4, 4)))
    np.testing.assert_allclose(
        np.asarray(mv(u)), np.asarray(lvl.apply(u)), rtol=1e-12
    )


def test_schwarz_preconditioner_accelerates():
    t = uniform_tree(2, 3)
    h = DomainHierarchy(t, n=8)
    lvl = Level(h.finest)
    f, _ = init_problem(h.finest, get_problem("trig", 2))
    f = jnp.asarray(f)
    plain = bicgstab(lvl.apply, f, tol=1e-10, max_iter=2000)
    prec = bicgstab(lvl.apply, f, M=schwarz(lvl), tol=1e-10, max_iter=2000)
    assert float(prec.residual_norm / prec.r0_norm) < 1e-9
    assert int(prec.iterations) < int(plain.iterations)


def test_poly_cheb_schur_preconditioner():
    """Chebyshev preconditioner for the interface system (3D in the
    reference; dimension-agnostic here)."""
    t = uniform_tree(2, 3)
    h = DomainHierarchy(t, n=8)
    lvl = Level(h.finest)
    f, _ = init_problem(h.finest, get_problem("trig", 2))
    f = jnp.asarray(f)

    def S(gamma):
        return lvl.interpolate(lvl.patch_solve(jnp.zeros_like(f), gamma))

    def A_schur(gamma):
        return gamma - S(gamma)

    gamma0 = jnp.zeros((lvl.num_ifaces, lvl.m), dtype=f.dtype)
    b = lvl.interpolate(lvl.patch_solve(f, gamma0))
    plain = bicgstab(A_schur, b, tol=1e-11, max_iter=2000)
    prec = bicgstab(A_schur, b, M=poly_cheb(lvl), tol=1e-11, max_iter=2000)
    assert float(prec.residual_norm / prec.r0_norm) < 1e-10
    assert int(prec.iterations) <= int(plain.iterations)
    # same answer
    u1 = lvl.patch_solve(f, plain.x)
    u2 = lvl.patch_solve(f, prec.x)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), rtol=1e-7, atol=1e-9)


def test_assembled_schur_matches_matrix_free():
    from pressurepoissonsolver_tpu.domain import DomainHierarchy
    from pressurepoissonsolver_tpu.geometry import refined_tree
    from pressurepoissonsolver_tpu.matrix import assemble_schur
    from pressurepoissonsolver_tpu.ops.level_ops import Level

    t = refined_tree(2, 2, 1)
    h = DomainHierarchy(t, n=4)
    lvl = Level(h.finest)
    A_S = assemble_schur(lvl)
    rng = np.random.default_rng(3)
    zero_f = jnp.zeros((lvl.P, 4, 4))
    for seed in range(2):
        g = rng.standard_normal((lvl.num_ifaces, lvl.m))
        ref = np.asarray(
            jnp.asarray(g) - lvl.interpolate(lvl.patch_solve(zero_f, jnp.asarray(g)))
        ).ravel()
        np.testing.assert_allclose(A_S @ g.ravel(), ref, rtol=1e-10, atol=1e-12)


def test_assembled_schur_quadratic_matches_matrix_free():
    """Probed Schur assembly under the higher-order 2D closures (depth-2
    face sources, contribution codes side*depth+d — the r3 crash case)."""
    from pressurepoissonsolver_tpu.matrix import assemble_schur

    t = refined_tree(2, 2, 1)
    h = DomainHierarchy(t, n=4)
    lvl = Level(h.finest, iface_scheme="quadratic")
    A_S = assemble_schur(lvl)
    rng = np.random.default_rng(5)
    zero_f = jnp.zeros((lvl.P, 4, 4))
    for seed in range(2):
        g = rng.standard_normal((lvl.num_ifaces, lvl.m))
        ref = np.asarray(
            jnp.asarray(g) - lvl.interpolate(lvl.patch_solve(zero_f, jnp.asarray(g)))
        ).ravel()
        np.testing.assert_allclose(A_S @ g.ravel(), ref, rtol=1e-10, atol=1e-12)


def test_schur_block_jacobi_quadratic_solves():
    """The r3 crash combo end-to-end: quadratic closures + assembled-block
    Jacobi preconditioner on the interface system (via GMRES — the
    nonsymmetric quadratic Schur system stalls plain BiCGStab even
    unpreconditioned; measured 24 GMRES / 21 GMRES+BJ iterations)."""
    from pressurepoissonsolver_tpu.krylov import gmres
    from pressurepoissonsolver_tpu.matrix import schur_block_jacobi

    t = refined_tree(2, 2, 1)
    h = DomainHierarchy(t, n=4)
    lvl = Level(h.finest, iface_scheme="quadratic")
    f, _ = init_problem(h.finest, get_problem("trig", 2))
    f = jnp.asarray(f)

    def A_schur(g):
        return g - lvl.interpolate(lvl.patch_solve(jnp.zeros_like(f), g))

    g0 = jnp.zeros((lvl.num_ifaces, lvl.m))
    b = lvl.interpolate(lvl.patch_solve(f, g0))
    M = schur_block_jacobi(lvl)
    prec = gmres(A_schur, b, M=M, tol=1e-11, max_iter=500)
    assert float(prec.residual_norm / prec.r0_norm) < 1e-10


def test_schur_block_jacobi_accelerates():
    from pressurepoissonsolver_tpu.domain import DomainHierarchy
    from pressurepoissonsolver_tpu.geometry import uniform_tree
    from pressurepoissonsolver_tpu.matrix import schur_block_jacobi
    from pressurepoissonsolver_tpu.ops.level_ops import Level

    t = uniform_tree(2, 3)
    h = DomainHierarchy(t, n=8)
    lvl = Level(h.finest)
    f, _ = init_problem(h.finest, get_problem("trig", 2))
    f = jnp.asarray(f)

    def A_schur(g):
        return g - lvl.interpolate(lvl.patch_solve(jnp.zeros_like(f), g))

    g0 = jnp.zeros((lvl.num_ifaces, lvl.m))
    b = lvl.interpolate(lvl.patch_solve(f, g0))
    M = schur_block_jacobi(lvl)
    plain = bicgstab(A_schur, b, tol=1e-11, max_iter=2000)
    prec = bicgstab(A_schur, b, M=M, tol=1e-11, max_iter=2000)
    assert float(prec.residual_norm / prec.r0_norm) < 1e-10
    assert int(prec.iterations) <= int(plain.iterations) + 2


def test_assembled_schur_3d_matches_matrix_free():
    """Canonicalized jitted probing (3D): A_S == matrix-free I - S."""
    from pressurepoissonsolver_tpu.domain import DomainHierarchy
    from pressurepoissonsolver_tpu.geometry import refined_tree
    from pressurepoissonsolver_tpu.matrix import assemble_schur
    from pressurepoissonsolver_tpu.ops.level_ops import Level

    t = refined_tree(3, 2, 1)
    h = DomainHierarchy(t, n=4)
    lvl = Level(h.finest)
    A_S = assemble_schur(lvl)
    rng = np.random.default_rng(7)
    zero_f = jnp.zeros((lvl.P, 4, 4, 4))
    g = rng.standard_normal((lvl.num_ifaces, lvl.m))
    ref = np.asarray(
        jnp.asarray(g) - lvl.interpolate(lvl.patch_solve(zero_f, jnp.asarray(g)))
    ).ravel()
    np.testing.assert_allclose(A_S @ g.ravel(), ref, rtol=1e-10, atol=1e-12)


def test_pbm_matvec_matches_assembled():
    """The pointer-block operator (reference Experimental/PBMatrix) equals
    the assembled probed Schur matrix."""
    from pressurepoissonsolver_tpu.matrix import assemble_schur, pbm_matvec

    t = refined_tree(2, 2, 1)
    h = DomainHierarchy(t, n=8)
    lvl = Level(h.finest)
    A = assemble_schur(lvl)
    mv = pbm_matvec(lvl)
    rng = np.random.default_rng(0)
    g = rng.standard_normal((lvl.num_ifaces, lvl.m))
    ref = (A @ g.ravel()).reshape(g.shape)
    out = np.asarray(mv(jnp.asarray(g)))
    assert np.abs(ref - out).max() < 1e-12


def test_cli_pbm_schur(tmp_path):
    import json

    from pressurepoissonsolver_tpu.cli import main

    out = tmp_path / "pbm.json"
    rc = main(2, ["--uniform", "2", "-n", "8", "--schur",
                  "--matrix-type", "pbm", "-t", "1e-11",
                  "--out-json", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["residual"] < 1e-9

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(2, ["--uniform", "2", "-n", "8", "--matrix-type", "pbm"])
