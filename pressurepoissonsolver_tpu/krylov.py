"""Krylov solvers: BiCGStab and CG in pure JAX.

The BiCGStab recurrence matches the reference implementation
(``BiCGStab.h:31-107``): right-preconditioned, initial residual
``r = b - A x``, convergence on ``||r|| / ||r0|| <= tol``.  The whole
iteration runs inside ``lax.while_loop`` so a complete solve is one XLA
computation; reductions become ``psum`` automatically under sharding.

Operators ``A`` and ``M`` are arbitrary jittable array->array callables on
pytrees of patch arrays (here: single ``[P, *ns]`` arrays).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.vdot(a, b)


def _norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.vdot(a, a).real)


class KrylovResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray  # int32
    residual_norm: jnp.ndarray  # final ||b - A x||
    r0_norm: jnp.ndarray


def residual_history(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-12,
    max_iter: int = 100,
) -> Tuple[KrylovResult, jnp.ndarray]:
    """BiCGStab with a per-iteration residual-norm history (observability
    the reference lacks — its BiCGStab reports only the final count,
    ``BiCGStab.h:70-105``).  Runs exactly ``max_iter`` iterations inside a
    ``fori_loop`` with converged iterates frozen; returns the history
    array ``[max_iter+1]`` (entries after convergence repeat the final
    residual)."""
    x = jnp.zeros_like(b)
    r = b - A(x)
    r0 = _norm(r)
    rhat, p, rho = r, r, _dot(r, r)
    hist0 = jnp.zeros(max_iter + 1, dtype=r0.dtype).at[0].set(r0)

    def prec(v):
        return v if M is None else M(v)

    def body(k, state):
        x, r, p, rho, hist, done = state
        mp = prec(p)
        ap = A(mp)
        denom = _dot(rhat, ap)
        alpha = jnp.where(denom != 0, rho / jnp.where(denom != 0, denom, 1.0), 0.0)
        s = r - alpha * ap
        ms = prec(s)
        as_ = A(ms)
        d2 = _dot(as_, as_)
        omega = jnp.where(d2 != 0, _dot(as_, s) / jnp.where(d2 != 0, d2, 1.0), 0.0)
        x_new = x + alpha * mp + omega * ms
        r_new = r - alpha * ap - omega * as_
        rho_new = _dot(r_new, rhat)
        beta = jnp.where(
            rho * omega != 0,
            rho_new * alpha / jnp.where(rho * omega != 0, rho * omega, 1.0),
            0.0,
        )
        p_new = beta * (p - omega * ap) + r_new
        active = jnp.logical_not(done)
        mk = active.astype(x.dtype)
        x = x + mk * (x_new - x)
        r = r + mk * (r_new - r)
        p = p + mk * (p_new - p)
        rho = jnp.where(active, rho_new, rho)
        rn = _norm(r)
        hist = hist.at[k + 1].set(rn)
        done = jnp.logical_or(done, rn / r0 <= tol)
        return (x, r, p, rho, hist, done)

    x, r, p, rho, hist, done = jax.lax.fori_loop(
        0, max_iter, body, (x, r, p, rho, hist0, jnp.bool_(False))
    )
    rel = hist / r0
    iters = jnp.argmax(rel <= tol)
    iters = jnp.where(jnp.any(rel <= tol), iters, max_iter)
    return (
        KrylovResult(x=x, iterations=iters.astype(jnp.int32), residual_norm=_norm(r), r0_norm=r0),
        hist,
    )


def cg_history(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-12,
    max_iter: int = 100,
    weight: Optional[jnp.ndarray] = None,
) -> Tuple[KrylovResult, jnp.ndarray]:
    """Preconditioned CG with a per-iteration residual-norm history (the
    ``--monitor`` observability hook; see ``residual_history``).  Runs
    exactly ``max_iter`` iterations in a ``fori_loop`` with converged
    state frozen; history entries are the *weighted* residual norms when
    ``weight`` is given (matching ``cg``'s convergence test)."""
    x = jnp.zeros_like(b)
    r = b - A(x)
    if weight is None:
        wdot = _dot
    else:
        w = weight.astype(b.dtype)

        def wdot(a, c):
            return jnp.vdot(a * w, c)

    r0 = jnp.sqrt(wdot(r, r).real)
    z = r if M is None else M(r)
    p = z
    rz = wdot(r, z)
    hist0 = jnp.zeros(max_iter + 1, dtype=r0.dtype).at[0].set(r0)

    def body(k, state):
        x, r, p, rz, hist, done = state
        ap = A(p)
        denom = wdot(p, ap)
        alpha = jnp.where(denom != 0, rz / jnp.where(denom != 0, denom, 1.0), 0.0)
        x_new = x + alpha * p
        r_new = r - alpha * ap
        z = r_new if M is None else M(r_new)
        rz_new = wdot(r_new, z)
        safe_rz = jnp.where(rz != 0, rz, 1.0)
        p_new = z + jnp.where(rz != 0, rz_new / safe_rz, 0.0) * p
        active = jnp.logical_not(done)
        mk = active.astype(x.dtype)
        x = x + mk * (x_new - x)
        r = r + mk * (r_new - r)
        p = p + mk * (p_new - p)
        rz = jnp.where(active, rz_new, rz)
        rn = jnp.sqrt(wdot(r, r).real)
        hist = hist.at[k + 1].set(rn)
        done = jnp.logical_or(done, rn / r0 <= tol)
        return (x, r, p, rz, hist, done)

    x, r, p, rz, hist, done = jax.lax.fori_loop(
        0, max_iter, body, (x, r, p, rz, hist0, jnp.bool_(False))
    )
    rel = hist / jnp.where(r0 > 0, r0, 1.0)
    iters = jnp.argmax(rel <= tol)
    iters = jnp.where(jnp.any(rel <= tol), iters, max_iter)
    return (
        KrylovResult(
            x=x,
            iterations=iters.astype(jnp.int32),
            residual_norm=jnp.sqrt(wdot(r, r).real),
            r0_norm=r0,
        ),
        hist,
    )


def bicgstab(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-12,
    max_iter: int = 1000,
) -> KrylovResult:
    """Right-preconditioned BiCGStab (``BiCGStab.h:45-106``)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    r0_norm = _norm(r)
    rhat = r
    p = r
    rho = _dot(rhat, r)

    def prec(v):
        return v if M is None else M(v)

    def cond(state):
        x, r, p, rho, k = state
        return jnp.logical_and(_norm(r) / r0_norm > tol, k < max_iter)

    def _safe_div(a, b):
        # breakdown guard (needed for f32 inner solves): a zero denominator
        # stalls the iteration instead of producing NaN
        return jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0), 0.0)

    def body(state):
        x, r, p, rho, k = state
        mp = prec(p)
        ap = A(mp)
        alpha = _safe_div(rho, _dot(rhat, ap))
        s = r - alpha * ap
        ms = prec(s)
        as_ = A(ms)
        omega = _safe_div(_dot(as_, s), _dot(as_, as_))
        x = x + alpha * mp + omega * ms
        r = r - alpha * ap - omega * as_
        rho_new = _dot(r, rhat)
        beta = _safe_div(rho_new * alpha, rho * omega)
        p = beta * (p - omega * ap) + r
        return (x, r, p, rho_new, k + 1)

    x, r, p, rho, k = jax.lax.while_loop(cond, body, (x, r, p, rho, jnp.int32(0)))
    return KrylovResult(x=x, iterations=k, residual_norm=_norm(r), r0_norm=r0_norm)


def richardson(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-12,
    max_iter: int = 100,
) -> KrylovResult:
    """Preconditioned Richardson iteration ``x += M(b - A x)``.

    With a multigrid preconditioner this is plain MG iteration.  Each step
    costs one preconditioner apply + one operator apply — half of a
    BiCGStab iteration — so whenever the V-cycle contraction factor
    ``rho`` beats BiCGStab's per-preconditioned-matvec reduction
    (measured: rho ~ 0.2-0.33 for V(1,1)/V(2,1) vs ~0.3 effective for
    GMG-BiCGStab) it reaches tolerance with less total work.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x) if x0 is not None else b
    r0_norm = _norm(r)

    def prec(v):
        return v if M is None else M(v)

    def cond(state):
        x, r, k = state
        return jnp.logical_and(_norm(r) / r0_norm > tol, k < max_iter)

    def body(state):
        x, r, k = state
        x = x + prec(r)
        r = b - A(x)
        return (x, r, k + 1)

    x, r, k = jax.lax.while_loop(cond, body, (x, r, jnp.int32(0)))
    return KrylovResult(x=x, iterations=k, residual_norm=_norm(r), r0_norm=r0_norm)


def gmres(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-12,
    restart: int = 30,
    max_iter: int = 1000,
    history: bool = False,
):
    """Right-preconditioned restarted GMRES(restart), fully jittable.

    The matrix-free Krylov method the reference reaches through PETSc KSP
    (``-ksp_type gmres`` via ``--petsc_opts``, ``apps/2d/steady.cpp:195``)
    and the BASELINE "Schur-complement interface system solved with
    matrix-free GMRES" configuration.  Arnoldi runs as a fixed-length
    ``fori_loop`` with masked modified-Gram-Schmidt (converged state is
    frozen), Givens rotations triangularize H on the fly, and restart
    cycles run under ``lax.while_loop`` — one XLA computation per solve.

    With ``history=True`` returns ``(result, hist)`` where ``hist[k]`` is
    the residual norm after iteration ``k``: the running Givens estimate
    within a cycle, overwritten by the true residual at each cycle
    boundary (the ``--monitor`` observability hook).
    """
    shape = b.shape
    dtype = b.dtype
    N = int(b.size)
    bf = b.ravel()

    def Af(v):
        return A(v.reshape(shape)).ravel()

    def Mf(v):
        return v if M is None else M(v.reshape(shape)).ravel()

    x = jnp.zeros_like(bf) if x0 is None else x0.ravel()
    r = bf - Af(x)
    r0_norm = _norm(r)
    # tolerance on ||r||/||r0|| (matches bicgstab/cg above)
    target = r0_norm * tol
    # history slots: a final cycle may overshoot max_iter by restart-1
    hist0 = jnp.zeros(
        (max_iter + restart + 1) if history else 1, dtype=dtype
    ).at[0].set(r0_norm)

    def cycle(state):
        # r is carried from the previous cycle's true-residual check (one
        # operator apply per cycle total — recomputing it here would pay a
        # second apply XLA cannot CSE across while_loop iterations)
        x, r, rnorm, it, hist = state
        beta = rnorm
        safe_beta = jnp.where(beta != 0, beta, 1.0)
        V0 = jnp.zeros((restart + 1, N), dtype=dtype).at[0].set(r / safe_beta)
        H = jnp.zeros((restart + 1, restart), dtype=dtype)
        cs = jnp.zeros(restart, dtype=dtype)
        sn = jnp.zeros(restart, dtype=dtype)
        g = jnp.zeros(restart + 1, dtype=dtype).at[0].set(beta)
        done0 = beta <= target

        def arnoldi(j, st):
            V, H, cs, sn, g, done, kdone, hist = st
            w = Af(Mf(V[j]))
            # masked modified Gram-Schmidt (one CGS pass + re-orth pass,
            # masked to rows i <= j; adequate with the re-orthogonalization)
            mask = (jnp.arange(restart + 1) <= j).astype(dtype)
            h1 = (V @ w) * mask
            w = w - V.T @ h1
            h2 = (V @ w) * mask
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = _norm(w)
            h = h.at[j + 1].set(wnorm)
            safe_w = jnp.where(wnorm != 0, wnorm, 1.0)
            V_new = V.at[j + 1].set(w / safe_w)
            # apply previous Givens rotations to the new column (masked scan
            # over all slots; inactive slots are identity since cs=1 sn=0
            # only after being set — we mask explicitly instead)
            def rot(i, hcol):
                act = (i < j).astype(dtype)
                t1 = cs[i] * hcol[i] + sn[i] * hcol[i + 1]
                t2 = -sn[i] * hcol[i] + cs[i] * hcol[i + 1]
                hcol = hcol.at[i].set(act * t1 + (1 - act) * hcol[i])
                hcol = hcol.at[i + 1].set(act * t2 + (1 - act) * hcol[i + 1])
                return hcol

            h = jax.lax.fori_loop(0, restart, rot, h)
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            safe_d = jnp.where(denom != 0, denom, 1.0)
            cj = jnp.where(denom != 0, h[j] / safe_d, 1.0)
            sj = jnp.where(denom != 0, h[j + 1] / safe_d, 0.0)
            h = h.at[j].set(cj * h[j] + sj * h[j + 1]).at[j + 1].set(0.0)
            g_j1 = -sj * g[j]
            g_new = g.at[j + 1].set(g_j1).at[j].set(cj * g[j])
            active = jnp.logical_not(done)
            # degenerate column: the rotated diagonal is (numerically)
            # zero, i.e. A M V[j] lies entirely in the previous Krylov
            # subspace (happens after a lucky breakdown — w = 0 — once
            # the preconditioned system converges mid-cycle).  Counting
            # this column would put a zero on the active diagonal of R
            # and NaN the triangular solve; freeze the state instead and
            # let the cycle-boundary true-residual check decide.
            degenerate = denom <= 0.0
            take = jnp.logical_and(active, jnp.logical_not(degenerate))

            def upd(orig, new):
                return jnp.where(take, new, orig)

            V = upd(V, V_new)
            H = upd(H, H.at[:, j].set(h))
            cs = upd(cs, cs.at[j].set(cj))
            sn = upd(sn, sn.at[j].set(sj))
            g = upd(g, g_new)
            kdone = jnp.where(take, j + 1, kdone)
            done = jnp.logical_or(
                done,
                jnp.logical_or(degenerate, jnp.abs(g_j1) <= target),
            )
            if history:
                hist = jnp.where(
                    take, hist.at[it + j + 1].set(jnp.abs(g_j1)), hist
                )
            return (V, H, cs, sn, g, done, kdone, hist)

        V, H, cs, sn, g, done, kdone, hist = jax.lax.fori_loop(
            0, restart, arnoldi,
            (V0, H, cs, sn, g, done0, jnp.int32(0), hist),
        )
        # solve the (masked) triangular system R y = g: inactive columns
        # get an identity diagonal and zero rhs so their y is 0
        act = jnp.arange(restart) < kdone
        R = H[:restart, :]
        R = jnp.where(act[None, :] & act[:, None], R, 0.0)
        R = R + jnp.diag(jnp.where(act, 0.0, 1.0).astype(dtype))
        y = jax.scipy.linalg.solve_triangular(R, jnp.where(act, g[:restart], 0.0))
        dx = V[:restart].T @ y
        # the Givens estimate |g[kdone]| drifts from the true residual when
        # the (masked-MGS) Arnoldi basis loses orthogonality on hard
        # nonsymmetric systems — it can claim convergence spuriously.
        # Check the TRUE residual at every cycle boundary (one apply per
        # `restart` iterations, reused as the next cycle's r); a false
        # estimate then just triggers another (orthogonality-restoring)
        # restart instead of a wrong exit.
        x_new = x + Mf(dx)
        r_new = bf - Af(x_new)
        rnorm_new = _norm(r_new)
        # reject a non-finite update (breakdown despite the degenerate-
        # column guard): keep the last good iterate; `it` still advances
        # (>= 1 per cycle) so the loop terminates at max_iter
        ok = jnp.isfinite(rnorm_new)
        x = jnp.where(ok, x_new, x)
        r = jnp.where(ok, r_new, r)
        rnorm = jnp.where(ok, rnorm_new, rnorm)
        if history:
            # cycle boundary: replace the estimate with the true residual
            hist = jnp.where(ok, hist.at[it + kdone].set(rnorm_new), hist)
        return (x, r, rnorm, it + jnp.maximum(kdone, 1), hist)

    def cond(state):
        x, r, rnorm, it, hist = state
        return jnp.logical_and(rnorm > target, it < max_iter)

    x, r, rnorm, it, hist = jax.lax.while_loop(
        cond, cycle, (x, r, r0_norm, jnp.int32(0), hist0)
    )
    x = x.reshape(shape)
    res = KrylovResult(
        x=x, iterations=it, residual_norm=rnorm, r0_norm=r0_norm
    )
    return (res, hist) if history else res


def cg(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-12,
    max_iter: int = 1000,
    weight: Optional[jnp.ndarray] = None,
) -> KrylovResult:
    """Preconditioned conjugate gradient.

    ``weight`` selects the inner product ``<x, y>_D = sum(weight * x * y)``.
    The composite FAC operator is *exactly* self-adjoint (and definite) in
    the cell-volume inner product — ``D A`` with ``D = diag(cell volumes)``
    is symmetric even on adaptive meshes with coarse/fine interface
    closures, and the V(1,1) GMG cycle with cell-average restriction /
    constant prolongation is D-self-adjoint too (both verified
    numerically).  Passing ``weight = per-cell volume`` therefore turns the
    composite solve into a true PCG — one operator and one preconditioner
    apply per iteration, against BiCGStab's two of each.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    if weight is None:
        wdot = _dot
    else:
        w = weight.astype(b.dtype)

        def wdot(a, c):
            return jnp.vdot(a * w, c)

    r0 = wdot(r, r).real
    z = r if M is None else M(r)
    p = z
    rz = wdot(r, z)

    def cond(state):
        x, r, p, rz, k = state
        return jnp.logical_and(wdot(r, r).real / r0 > tol * tol, k < max_iter)

    def body(state):
        x, r, p, rz, k = state
        ap = A(p)
        alpha = rz / wdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = r if M is None else M(r)
        rz_new = wdot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.int32(0)))
    return KrylovResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(wdot(r, r).real),
        r0_norm=jnp.sqrt(r0),
    )
