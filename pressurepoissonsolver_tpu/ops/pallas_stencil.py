"""Fused ghost-closure star stencil as a Pallas TPU kernel (2D).

Motivation (round 5, measured at 42M DOF f32 on a v5e): XLA materializes
every shifted operand of the star stencil as its own full-field pass —
the concat/pad/roll formulations all measure ~10-12% of HBM roofline
(3.4-4.0 ms), while a fused single-pass kernel is bandwidth-bound at
~1.0 ms.  The reference's equivalent loop is ``StarPatchOp.h:28-184``;
algebra here matches ``level_ops._star_stencil`` exactly:

    out = sum_a h2[a] * (lo_a - 2 u + hi_a),
    boundary rows use ghost = coef[side] * u_b + 2 * gf[side].

Design notes (see /opt/skills/guides/pallas_guide.md):
* the patch field is processed as flat ``[P, n*n]`` rows — the rank-3
  ``[bP, n, n]`` layout (64-lane minor) halves Mosaic's effective
  bandwidth; flat rows are perfectly 128-lane tiled,
* neighbor shifts are ``pltpu.roll`` on the flat axis with boundary
  masks from a lane iota (``cx = col & (n-1)`` — n must be a power of
  two),
* the ``2*gf`` ghost-face injection is ONE small MXU matmul against a
  constant 0/1 placement matrix ``G [2D*n, n*n]`` (per-face rows of the
  pre-scaled trace block land on their boundary lanes); the
  ``coef * u_b`` term needs no gather at all — it lives on the same
  lanes the correction targets,
* BlockSpec index maps use int32 constants (the package enables x64
  globally; Mosaic rejects i64 index arithmetic).

f64 stays on the XLA path (no Mosaic f64 vectors); non-power-of-two n
falls back too.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import kept lazy-safe for non-TPU environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_Z = np.int32(0)


def supported(D: int, n: int, dtype, P: int = 8) -> bool:
    """The fused kernel covers 2D, power-of-two n >= 8, f32, on TPU."""
    import os

    if os.environ.get("PPS_FUSED_STENCIL", "1") == "0":
        return False
    if not _HAS_PALLAS or jax.default_backend() != "tpu":
        return False
    if D != 2 or dtype != jnp.float32:
        return False
    if not (n >= 8 and (n & (n - 1)) == 0):
        return False
    # below ~32 MB the XLA concat form wins: the solve's loop-resident
    # operands stay VMEM-cached (measured 46 vs 106 us apply at 2.6M DOF)
    # while the kernel always streams HBM; above it the fused single
    # pass wins (XLA pays one full-field pass per shifted operand)
    if P * n * n * 4 < int(os.environ.get("PPS_FUSED_MIN_BYTES", 32_000_000)):
        return False
    return _pick_bp(P, 4 * n * n * 4, 48 * 2**20) is not None


def _placement_matrix(n: int) -> np.ndarray:
    """[4n, n*n] 0/1 matrix: row (side, k) -> the flat cell of that
    boundary face entry (side order: x_lo, x_hi, y_lo, y_hi; x fastest
    in the flat index, matching ``PatchLevel.ns_shape``)."""
    C = n * n
    G = np.zeros((4 * n, C), dtype=np.float32)
    for k in range(n):
        G[0 * n + k, k * n + 0] = 1.0  # x_lo: row k, col 0
        G[1 * n + k, k * n + (n - 1)] = 1.0  # x_hi
        G[2 * n + k, 0 * n + k] = 1.0  # y_lo: row 0, col k
        G[3 * n + k, (n - 1) * n + k] = 1.0  # y_hi
    return G


def _kernel_2d(n, u_ref, gfs_ref, h2_ref, coef_ref, G_ref, o_ref):
    C = n * n
    ub = u_ref[...]  # [bP, C]
    col = jax.lax.broadcasted_iota(jnp.int32, ub.shape, 1)
    cx = jnp.bitwise_and(col, n - 1)
    xm = jnp.where(cx > 0, pltpu.roll(ub, np.int32(1), 1), 0.0)
    xp = jnp.where(cx < n - 1, pltpu.roll(ub, np.int32(C - 1), 1), 0.0)
    ym = jnp.where(col >= n, pltpu.roll(ub, np.int32(n), 1), 0.0)
    yp = jnp.where(col < C - n, pltpu.roll(ub, np.int32(C - n), 1), 0.0)
    h2x = h2_ref[...][:, 0][:, None]
    h2y = h2_ref[...][:, 1][:, None]
    cb = coef_ref[...]  # [bP, 4]
    # ghost coef * u_b lives on the very lanes the correction targets
    bnd = (
        h2x * cb[:, 0][:, None] * jnp.where(cx == 0, ub, 0.0)
        + h2x * cb[:, 1][:, None] * jnp.where(cx == n - 1, ub, 0.0)
        + h2y * cb[:, 2][:, None] * jnp.where(col < n, ub, 0.0)
        + h2y * cb[:, 3][:, None] * jnp.where(col >= C - n, ub, 0.0)
    )
    # 2 * h2 * gf (pre-scaled in gfs) placed on boundary lanes: one
    # small exact matmul against the 0/1 placement matrix
    gvec = jax.lax.dot_general(
        gfs_ref[...], G_ref[...], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (
        h2x * (xm + xp - 2.0 * ub)
        + h2y * (ym + yp - 2.0 * ub)
        + bnd
        + gvec
    )


@functools.lru_cache(maxsize=None)
def _build_call(P: int, n: int, bP: int):
    C = n * n
    kern = functools.partial(_kernel_2d, n)
    grid = (P // bP,)

    def call(uf, gfs, h2, coef, G):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bP, C), lambda i: (i, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bP, 4 * n), lambda i: (i, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bP, 2), lambda i: (i, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bP, 4), lambda i: (i, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * n, C), lambda i: (_Z, _Z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bP, C), lambda i: (i, _Z),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2**20,
            ),
        )(uf, gfs, h2, coef, G)

    return call


def _pick_bp(P: int, cell_bytes: int, budget: int) -> Optional[int]:
    """Largest multiple-of-8 divisor of P within the VMEM budget (4 live
    copies of the block).  Mosaic requires the block sublane dim to be a
    multiple of 8 OR equal to the array dim — if no multiple-of-8 divisor
    exists, fall back to the whole array when it fits, else None (caller
    uses the XLA path)."""
    cap = max(budget // (4 * cell_bytes), 1)
    best = None
    bp = 8
    while bp <= min(cap, P):
        if P % bp == 0:
            best = bp
        bp *= 2
    if best is not None:
        return best
    if P * cell_bytes * 4 <= budget or P < 8:
        return P  # single whole-array block
    return None


class FusedStencil2D:
    """Callable ``(u, gf, coef, h2) -> A_local u`` on ``[P, n, n]`` f32
    fields; ``gf [P, 4, n]`` are the interface trace values, ``coef
    [P, 4]`` the ghost closure coefficients, ``h2 [P, 2]`` = 1/h^2."""

    def __init__(self, P: int, n: int):
        self.P, self.n = P, n
        self.bP = _pick_bp(P, 4 * n * n * 4, 48 * 2**20)
        # host array: building a device array here would cache a tracer
        # when the constructor first runs under a trace
        self.G = _placement_matrix(n)
        self._call = _build_call(P, n, self.bP)

    def __call__(self, u, gf, coef, h2):
        P, n = self.P, self.n
        uf = u.reshape(P, n * n)
        # pre-scale the traces by 2 * h2 of their axis ([P, 4, n] — a
        # face-sized elementwise op XLA fuses with the reshape)
        s = 2.0 * jnp.stack(
            [h2[:, 0], h2[:, 0], h2[:, 1], h2[:, 1]], axis=1
        )[..., None]
        gfs = (gf * s).reshape(P, 4 * n)
        out = self._call(uf, gfs, h2, coef, self.G)
        return out.reshape(u.shape)


# ---------------------------------------------------------------------------
# 3D variant: the patch block is processed as [bP, n(z), n*n(y,x)] — flat
# (y,x) lanes so x/y neighbor shifts are lane rolls and z shifts sublane
# rolls.  gf faces enter as rank-3/4 blocks: z faces broadcast onto the
# boundary slabs, y faces lane-pad, and x faces spread onto their stride-n
# lanes with one tiny one-hot MXU matmul (measured 4.50 -> 1.43 ms per
# apply-stencil at a 30M-cell probe, [960, 32^3] f32).


def supported3d(D: int, n: int, dtype, P: int = 8) -> bool:
    import os

    if os.environ.get("PPS_FUSED_STENCIL", "1") == "0":
        return False
    if not _HAS_PALLAS or jax.default_backend() != "tpu":
        return False
    if D != 3 or dtype != jnp.float32:
        return False
    if not (n >= 8 and (n & (n - 1)) == 0):
        return False
    return _pick_bp(P, 4 * n * n * n * 4, 24 * 2**20) is not None


def _xspread_matrix(n: int) -> np.ndarray:
    """[n, n*n] one-hot: y -> lane y*n (the x_lo boundary lane of row y)."""
    S = np.zeros((n, n * n), dtype=np.float32)
    for y in range(n):
        S[y, y * n] = 1.0
    return S


def _kernel_3d(n, bP, u_ref, gfz_ref, gfy_ref, gfx_ref, h2_ref, coef_ref,
               Sx_ref, o_ref):
    m = n * n
    ub = u_ref[...]  # [bP, n, m]
    h2b = h2_ref[...]
    cb = coef_ref[...]
    Sxm = Sx_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, (bP, n, m), 2)
    cx = jnp.bitwise_and(col, n - 1)
    zrow = jax.lax.broadcasted_iota(jnp.int32, (bP, n, m), 1)
    xm = jnp.where(cx > 0, pltpu.roll(ub, np.int32(1), 2), 0.0)
    xp = jnp.where(cx < n - 1, pltpu.roll(ub, np.int32(m - 1), 2), 0.0)
    ym = jnp.where(col >= n, pltpu.roll(ub, np.int32(n), 2), 0.0)
    yp = jnp.where(col < m - n, pltpu.roll(ub, np.int32(m - n), 2), 0.0)
    zm = jnp.where(zrow > 0, pltpu.roll(ub, np.int32(1), 1), 0.0)
    zp = jnp.where(zrow < n - 1, pltpu.roll(ub, np.int32(n - 1), 1), 0.0)
    h2x = h2b[:, 0][:, None, None]
    h2y = h2b[:, 1][:, None, None]
    h2z = h2b[:, 2][:, None, None]
    bnd = (
        h2x * cb[:, 0][:, None, None] * jnp.where(cx == 0, ub, 0.0)
        + h2x * cb[:, 1][:, None, None] * jnp.where(cx == n - 1, ub, 0.0)
        + h2y * cb[:, 2][:, None, None] * jnp.where(col < n, ub, 0.0)
        + h2y * cb[:, 3][:, None, None] * jnp.where(col >= m - n, ub, 0.0)
        + h2z * cb[:, 4][:, None, None] * jnp.where(zrow == 0, ub, 0.0)
        + h2z * cb[:, 5][:, None, None] * jnp.where(zrow == n - 1, ub, 0.0)
    )
    gfzb = gfz_ref[...]  # [bP, 2, m]
    gz = (
        jnp.where(zrow == 0, gfzb[:, 0][:, None, :], 0.0)
        + jnp.where(zrow == n - 1, gfzb[:, 1][:, None, :], 0.0)
    ) * (2.0 * h2z)
    gfyb = gfy_ref[...]  # [bP, 2, n(z), n(x)]
    ylo = jnp.pad(gfyb[:, 0], ((0, 0), (0, 0), (0, m - n)))
    yhi = jnp.pad(gfyb[:, 1], ((0, 0), (0, 0), (0, m - n)))
    gy = (
        jnp.where(col < n, ylo, 0.0)
        + jnp.where(col >= m - n, pltpu.roll(yhi, np.int32(m - n), 2), 0.0)
    ) * (2.0 * h2y)
    gfxb = gfx_ref[...]  # [bP, 2, n(z), n(y)]

    def spread(v):
        vm = v.reshape(bP * n, n)
        s = jax.lax.dot_general(
            vm, Sxm, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return s.reshape(bP, n, m)

    gx = (
        jnp.where(cx == 0, spread(gfxb[:, 0]), 0.0)
        + jnp.where(
            cx == n - 1,
            pltpu.roll(spread(gfxb[:, 1]), np.int32(n - 1), 2),
            0.0,
        )
    ) * (2.0 * h2x)
    o_ref[...] = (
        h2x * (xm + xp - 2.0 * ub)
        + h2y * (ym + yp - 2.0 * ub)
        + h2z * (zm + zp - 2.0 * ub)
        + bnd + gx + gy + gz
    )


@functools.lru_cache(maxsize=None)
def _build_call_3d(P: int, n: int, bP: int):
    m = n * n
    kern = functools.partial(_kernel_3d, n, bP)
    grid = (P // bP,)

    def call(uf, gfz, gfy, gfx, h2, coef, Sx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((P, n, m), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bP, n, m), lambda i: (i, _Z, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bP, 2, m), lambda i: (i, _Z, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bP, 2, n, n), lambda i: (i, _Z, _Z, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bP, 2, n, n), lambda i: (i, _Z, _Z, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bP, 3), lambda i: (i, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bP, 6), lambda i: (i, _Z),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, m), lambda i: (_Z, _Z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bP, n, m), lambda i: (i, _Z, _Z),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 2**20,
            ),
        )(uf, gfz, gfy, gfx, h2, coef, Sx)

    return call


class FusedStencil3D:
    """Callable ``(u, gf, coef, h2) -> A_local u`` on ``[P, n, n, n]`` f32
    fields; ``gf [P, 6, n*n]`` traces, ``coef [P, 6]``, ``h2 [P, 3]``."""

    def __init__(self, P: int, n: int):
        self.P, self.n = P, n
        self.bP = _pick_bp(P, 4 * n * n * n * 4, 24 * 2**20)
        self.Sx = _xspread_matrix(n)  # host array (see FusedStencil2D)
        self._call = _build_call_3d(P, n, self.bP)

    def __call__(self, u, gf, coef, h2):
        P, n = self.P, self.n
        uf = u.reshape(P, n, n * n)
        gfz = gf[:, 4:6]
        gfy = gf[:, 2:4].reshape(P, 2, n, n)
        gfx = gf[:, 0:2].reshape(P, 2, n, n)
        out = self._call(uf, gfz, gfy, gfx, h2, coef, self.Sx)
        return out.reshape(u.shape)
