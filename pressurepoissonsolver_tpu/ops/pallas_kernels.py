"""Pallas TPU kernels for the hot per-patch operations.

Two fused kernels replace multi-pass XLA pipelines with single-pass VMEM
compute:

* :func:`spectral_solve_block` — the whole per-patch spectral solve
  (forward DST/DCT transforms per axis -> eigenvalue divide -> inverse
  transforms -> scale) in one kernel: the XLA path round-trips HBM
  between each of the 2D+1 stages; here one block of patches stays in
  VMEM for all of them.  Transforms are MXU matmuls.
* :func:`stencil_block` — the star stencil with ghost-closure faces in a
  single pass over each patch block.

Both operate on one BC-homogeneous group (fixed transform matrices) and
are invoked by ``Level`` when ``use_pallas`` is enabled; the XLA
implementations remain the reference path (tests compare them
bit-for-bit in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (used for interpret-mode tests)
    from jax.experimental.pallas import tpu as pltpu

    _MEMSPACE = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _MEMSPACE = None


def _vmem_spec(block_shape=None, index_map=None):
    kwargs = {}
    if _MEMSPACE is not None:
        kwargs["memory_space"] = _MEMSPACE
    if block_shape is None:
        return pl.BlockSpec(**kwargs)
    return pl.BlockSpec(block_shape, index_map, **kwargs)


# ---------------------------------------------------------------------------
# fused spectral patch solve
# ---------------------------------------------------------------------------


def _solve_kernel(D: int, n: int, scale: float, pin_dc: bool,
                  f_ref, denom_ref, *refs):
    """Spectral solve on one VMEM-resident patch block.

    All axis motion is expressed through ``dot_general`` contractions
    (which append the transformed axis at the end) — no reshape or
    transpose ops, which Mosaic cannot always lower.  Contracting the
    spatial axes x, y(, z) in order turns layout ``[B, (z, y,) x]`` into
    the reversed ``[B, X(, Y, Z)]``; the denominator is fed in that
    permuted layout, and the inverse transforms (reverse order) restore
    the original layout exactly.
    """
    fwd = refs[:D]
    inv = refs[D : 2 * D]
    out_ref = refs[2 * D]
    x = f_ref[...]  # [B, (z, y,) x]
    ndim = D + 1

    def contract(x, M, axis):
        dn = (((axis,), (1,)), ((), ()))
        return jax.lax.dot_general(x, M, dn, preferred_element_type=x.dtype,
                                   precision=jax.lax.Precision.HIGHEST)

    for a in range(D):  # forward: contract spatial axis a at array pos ndim-1-a
        x = contract(x, fwd[a][...], ndim - 1 - a)
    x = x / denom_ref[...]
    if pin_dc:
        mask = jnp.zeros(x.shape, dtype=jnp.bool_)
        for a in range(1, ndim):
            ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=a)
            mask = jnp.logical_or(mask, ids != 0)
        x = jnp.where(mask, x, jnp.zeros_like(x))
    for a in range(D - 1, -1, -1):  # inverse: axis a now sits at pos a+1
        x = contract(x, inv[a][...], a + 1)
    out_ref[...] = x * scale


def spectral_solve_block(
    f: jnp.ndarray,
    denom: jnp.ndarray,
    fwd_mats: Sequence[jnp.ndarray],
    inv_mats: Sequence[jnp.ndarray],
    scale: float,
    pin_dc: bool = False,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Spectral patch solve for one BC group: ``f, denom`` are
    ``[P, *ns]``; returns ``u`` of the same shape."""
    P = f.shape[0]
    D = f.ndim - 1
    n = f.shape[-1]
    # the kernel's post-transform layout is spatially reversed; feed the
    # denominator pre-permuted
    denom = jnp.transpose(denom, (0,) + tuple(range(D, 0, -1)))
    B = min(block, P)
    pad = (-P) % B
    if pad:
        padding = [(0, pad)] + [(0, 0)] * D
        f = jnp.pad(f, padding)
        denom = jnp.pad(denom, padding, constant_values=1.0)
    grid = (f.shape[0] // B,)
    blk = (B,) + (n,) * D
    # under x64 mode, Python-int index-map constants trace as i64 which the
    # Mosaic compiler rejects — pin them to int32
    zero = np.int32(0)
    imap = lambda i: (i,) + (zero,) * D
    mat_spec = _vmem_spec((n, n), lambda i: (zero, zero))
    kernel = functools.partial(_solve_kernel, D, n, scale, pin_dc)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        grid=grid,
        in_specs=[_vmem_spec(blk, imap), _vmem_spec(blk, imap)]
        + [mat_spec] * (2 * D),
        out_specs=_vmem_spec(blk, imap),
        interpret=interpret,
    )(f, denom, *fwd_mats, *inv_mats)
    return out[:P] if pad else out


# ---------------------------------------------------------------------------
# fused stencil with ghost faces
# ---------------------------------------------------------------------------


def _stencil_kernel(D: int, n: int, u_ref, gf_ref, h2inv_ref, coef_ref, out_ref):
    u = u_ref[...]  # [B, *ns]
    gf = gf_ref[...]  # [B, 2D, m]
    h2inv = h2inv_ref[...]  # [B, D]
    coef = coef_ref[...]  # [B, 2D]
    B = u.shape[0]
    face_shape = (B,) + (n,) * (D - 1)
    out = jnp.zeros_like(u)
    for a in range(D):
        ax = 1 + (D - 1 - a)
        # static integer indexing (slices, not gathers — Mosaic-lowerable)
        idx_lo = tuple([slice(None)] * ax + [0])
        idx_hi = tuple([slice(None)] * ax + [n - 1])
        u_lo = u[idx_lo]
        u_hi = u[idx_hi]
        c_lo = coef[:, 2 * a].reshape((B,) + (1,) * (D - 1))
        c_hi = coef[:, 2 * a + 1].reshape((B,) + (1,) * (D - 1))
        g_lo = gf[:, 2 * a].reshape(face_shape)
        g_hi = gf[:, 2 * a + 1].reshape(face_shape)
        ghost_lo = c_lo * u_lo + 2.0 * g_lo
        ghost_hi = c_hi * u_hi + 2.0 * g_hi
        lo = jnp.concatenate(
            [jnp.expand_dims(ghost_lo, ax), jax.lax.slice_in_dim(u, 0, n - 1, axis=ax)],
            axis=ax,
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(u, 1, n, axis=ax), jnp.expand_dims(ghost_hi, ax)],
            axis=ax,
        )
        h2i = h2inv[:, a].reshape((B,) + (1,) * D)
        out = out + (lo - 2.0 * u + hi) * h2i
    out_ref[...] = out


def stencil_block(
    u: jnp.ndarray,
    gf: jnp.ndarray,
    h2inv: jnp.ndarray,
    coef: jnp.ndarray,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Star stencil with ghost closure: one fused pass per patch block."""
    P = u.shape[0]
    D = u.ndim - 1
    n = u.shape[-1]
    m = gf.shape[-1]
    B = min(block, P)
    pad = (-P) % B
    if pad:
        u = jnp.pad(u, [(0, pad)] + [(0, 0)] * D)
        gf = jnp.pad(gf, [(0, pad), (0, 0), (0, 0)])
        h2inv = jnp.pad(h2inv, [(0, pad), (0, 0)], constant_values=1.0)
        coef = jnp.pad(coef, [(0, pad), (0, 0)])
    grid = (u.shape[0] // B,)
    blk = (B,) + (n,) * D
    zero = np.int32(0)
    imap = lambda i: (i,) + (zero,) * D
    out = pl.pallas_call(
        functools.partial(_stencil_kernel, D, n),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        grid=grid,
        in_specs=[
            _vmem_spec(blk, imap),
            _vmem_spec((B, 2 * D, m), lambda i: (i, zero, zero)),
            _vmem_spec((B, D), lambda i: (i, zero)),
            _vmem_spec((B, 2 * D), lambda i: (i, zero)),
        ],
        out_specs=_vmem_spec(blk, imap),
        interpret=interpret,
    )(u, gf, h2inv, coef)
    return out[:P] if pad else out
