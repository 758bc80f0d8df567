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


def cg(
    A: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-12,
    max_iter: int = 1000,
) -> KrylovResult:
    """Preconditioned conjugate gradient (for SPD systems)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    r0_norm = _norm(r)
    z = r if M is None else M(r)
    p = z
    rz = _dot(r, z)

    def cond(state):
        x, r, p, rz, k = state
        return jnp.logical_and(_norm(r) / r0_norm > tol, k < max_iter)

    def body(state):
        x, r, p, rz, k = state
        ap = A(p)
        alpha = rz / _dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = r if M is None else M(r)
        rz_new = _dot(r, z)
        p = z + (rz_new / rz) * p
        return (x, r, p, rz_new, k + 1)

    x, r, p, rz, k = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.int32(0)))
    return KrylovResult(x=x, iterations=k, residual_norm=_norm(r), r0_norm=r0_norm)
