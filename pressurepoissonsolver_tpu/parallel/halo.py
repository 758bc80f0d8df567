"""Explicit halo-exchange operator over a patch-sharded mesh (shard_map).

The pjit path (`parallel/sharding.py`) lets XLA partition the global
gathers; this module is the hand-scheduled alternative the reference's
VecScatter pipeline maps to on TPU (SURVEY.md §5 "Distributed
communication backend"):

1. each shard extracts the face traces of its local patches
   (surface data only — 2D: 25%, 3D: ~37% of the volume data);
2. faces are exchanged across the mesh (`all_gather` over ICI — the
   patch graph's cross-shard coupling is face-only, so this bounds the
   communication volume at the faces, not the cells; a point-to-point
   `ppermute` ring over only the cut faces is the planned refinement);
3. the interface traces and the ghost-closure stencil are evaluated
   purely locally.

`HaloApply` is numerically identical to `Level.apply` (tests compare on
an 8-device virtual mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.level_ops import Level, extract_faces


class HaloApply:
    """Sharded composite-operator apply with explicit face exchange."""

    def __init__(self, level: Level, mesh: Mesh):
        self.level = level
        self.mesh = mesh
        self.ndev = mesh.devices.size
        if level.P % self.ndev != 0:
            raise ValueError(
                f"pad the level first: P={level.P} not divisible by {self.ndev}"
            )
        self.p_local = level.P // self.ndev

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        lvl = self.level
        D, n, m = lvl.D, lvl.n, lvl.m
        mesh = self.mesh

        from jax.experimental.shard_map import shard_map

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=P("p"),
            out_specs=P("p"),
            check_rep=False,
        )
        def apply_sharded(u_loc):
            # 1. local face extraction (surface-only data)
            faces_loc = extract_faces(u_loc, D, n)  # [Pl, 2D, m]
            # 2. exchange: all shards see all faces (face-volume bounded)
            faces = jax.lax.all_gather(faces_loc, "p", axis=0, tiled=True)
            # 3. local trace interpolation for the interfaces this shard's
            #    patches read, then the local stencil
            gamma = self._interpolate_from_faces(faces)
            my = jax.lax.axis_index("p")
            start = my * self.p_local
            gf = self._gamma_faces_local(gamma, start)
            return self._stencil_local(u_loc, gf, start)

        return apply_sharded(u)

    # -- pieces reusing the level's tables, windowed to the local shard ----

    def _interpolate_from_faces(self, faces):
        lvl = self.level
        g = faces[lvl._c_patch_sorted, lvl._c_side_sorted]
        parts = []
        for case, start, stop in lvl._contrib_groups:
            rows = jax.lax.slice_in_dim(g, start, stop, axis=0)
            w = lvl._case_scalar[case]
            if w is not None:
                parts.append(rows * jnp.asarray(w, dtype=faces.dtype))
            else:
                parts.append(
                    jnp.matmul(rows, lvl._case_T[case].T.astype(faces.dtype),
                               precision=jax.lax.Precision.HIGHEST)
                )
        vals = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        vals_padded = jnp.concatenate(
            [vals, jnp.zeros((1, lvl.m), dtype=vals.dtype)], axis=0
        )
        return jnp.sum(vals_padded[lvl._iface_gather], axis=1)

    def _gamma_faces_local(self, gamma, start):
        lvl = self.level
        idx = jax.lax.dynamic_slice_in_dim(lvl.iface_idx, start, self.p_local, 0)
        mask = jax.lax.dynamic_slice_in_dim(lvl.iface_mask, start, self.p_local, 0)
        return gamma[idx] * mask[..., None]

    def _stencil_local(self, u_loc, gf, start):
        lvl = self.level
        D, n = lvl.D, lvl.n
        Pl = self.p_local
        h2inv = jax.lax.dynamic_slice_in_dim(lvl.h2inv, start, Pl, 0)
        coef = jax.lax.dynamic_slice_in_dim(lvl.ghost_coef, start, Pl, 0)
        out = jnp.zeros_like(u_loc)
        for a in range(D):
            ax = 1 + (D - 1 - a)
            u_lo = jnp.take(u_loc, 0, axis=ax)
            u_hi = jnp.take(u_loc, n - 1, axis=ax)
            c_lo = coef[:, 2 * a].reshape((Pl,) + (1,) * (D - 1))
            c_hi = coef[:, 2 * a + 1].reshape((Pl,) + (1,) * (D - 1))
            fs = (Pl,) + (n,) * (D - 1)
            ghost_lo = c_lo * u_lo + 2.0 * gf[:, 2 * a].reshape(fs)
            ghost_hi = c_hi * u_hi + 2.0 * gf[:, 2 * a + 1].reshape(fs)
            lo = jnp.concatenate(
                [jnp.expand_dims(ghost_lo, ax),
                 jax.lax.slice_in_dim(u_loc, 0, n - 1, axis=ax)],
                axis=ax,
            )
            hi = jnp.concatenate(
                [jax.lax.slice_in_dim(u_loc, 1, n, axis=ax),
                 jnp.expand_dims(ghost_hi, ax)],
                axis=ax,
            )
            h2i = h2inv[:, a].reshape((Pl,) + (1,) * D)
            out = out + (lo - 2.0 * u_loc + hi) * h2i
        return out
