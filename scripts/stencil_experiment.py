"""Stencil formulation shootout at HBM-honest sizes.

At 42M DOF (f32 [10240, 64, 64]) the concat-form star stencil measured
11.5% of HBM roofline (OP_REPORT r5 probe) — the concat/slice assembly
materializes full-size intermediates that VMEM hid at bench sizes.
Candidates: pad-shift form, conv form, rolled form.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pressurepoissonsolver_tpu.utils.profiling import _device_bw, time_op

P, n = int(os.environ.get("SP", "10240")), int(os.environ.get("SN", "64"))
dtype = jnp.float32
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((P, n, n)), dtype=dtype)
h2 = jnp.asarray(rng.uniform(1.0, 2.0, (P, 2)), dtype=dtype)
coef = jnp.asarray(rng.uniform(-1.0, 1.0, (P, 4)), dtype=dtype)
gf = jnp.asarray(rng.standard_normal((P, 4, n)), dtype=dtype)
bw = _device_bw()
field = P * n * n * 4


def report(name, fn, *args):
    t = time_op(fn, *args, reps=100, in_graph=True)
    print(f"{name:22s} {t*1e3:8.4f} ms  {100*2*field/bw/t:6.2f}% roofline",
          flush=True)
    return t


# --- baseline: concat form (current _star_stencil) -----------------------
def concat_form(u):
    out = jnp.zeros_like(u)
    for a in range(2):
        ax = 1 + (1 - a)
        u_lo = jnp.take(u, 0, axis=ax)
        u_hi = jnp.take(u, n - 1, axis=ax)
        c_lo = coef[:, 2 * a].reshape(P, 1)
        c_hi = coef[:, 2 * a + 1].reshape(P, 1)
        ghost_lo = c_lo * u_lo + 2.0 * gf[:, 2 * a]
        ghost_hi = c_hi * u_hi + 2.0 * gf[:, 2 * a + 1]
        lo = jnp.concatenate(
            [jnp.expand_dims(ghost_lo, ax),
             jax.lax.slice_in_dim(u, 0, n - 1, axis=ax)], axis=ax)
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(u, 1, n, axis=ax),
             jnp.expand_dims(ghost_hi, ax)], axis=ax)
        h2i = h2[:, a].reshape(P, 1, 1)
        out = out + (lo - 2.0 * u + hi) * h2i
    return out


# --- pad-shift form: lo/hi built by jnp.pad of slices --------------------
def pad_form(u):
    out = jnp.zeros_like(u)
    for a in range(2):
        ax = 1 + (1 - a)
        w_lo = [(0, 0)] * 3
        w_lo[ax] = (1, 0)
        w_hi = [(0, 0)] * 3
        w_hi[ax] = (0, 1)
        lo = jnp.pad(jax.lax.slice_in_dim(u, 0, n - 1, axis=ax), w_lo)
        hi = jnp.pad(jax.lax.slice_in_dim(u, 1, n, axis=ax), w_hi)
        h2i = h2[:, a].reshape(P, 1, 1)
        out = out + (lo - 2.0 * u + hi) * h2i
    # boundary corrections: ghost rows via pad-spread
    for a in range(2):
        ax = 1 + (1 - a)
        h2i = h2[:, a].reshape(P, 1, 1)
        for side, pos in ((2 * a, 0), (2 * a + 1, n - 1)):
            face = coef[:, side].reshape(P, 1) * jnp.take(u, pos, axis=ax) \
                + 2.0 * gf[:, side]
            w = [(0, 0)] * 3
            w[ax] = (pos, n - 1 - pos)
            out = out + h2i * jnp.pad(jnp.expand_dims(face, ax), w)
    return out


# --- conv form: two 1D 3-tap convs + per-patch scale ----------------------
kx = jnp.asarray([1.0, 0.0, 1.0], dtype).reshape(1, 1, 1, 3)
ky = jnp.asarray([1.0, 0.0, 1.0], dtype).reshape(1, 1, 3, 1)


def conv_form(u):
    x = u[:, None]  # NCHW
    sx = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (1, 1)], precision=jax.lax.Precision.HIGHEST)
    sy = jax.lax.conv_general_dilated(x, ky, (1, 1), [(1, 1), (0, 0)], precision=jax.lax.Precision.HIGHEST)
    out = (
        h2[:, 0].reshape(P, 1, 1) * (sx[:, 0] - 2.0 * u)
        + h2[:, 1].reshape(P, 1, 1) * (sy[:, 0] - 2.0 * u)
    )
    for a in range(2):
        ax = 1 + (1 - a)
        h2i = h2[:, a].reshape(P, 1, 1)
        for side, pos in ((2 * a, 0), (2 * a + 1, n - 1)):
            face = coef[:, side].reshape(P, 1) * jnp.take(u, pos, axis=ax) \
                + 2.0 * gf[:, side]
            w = [(0, 0)] * 3
            w[ax] = (pos, n - 1 - pos)
            out = out + h2i * jnp.pad(jnp.expand_dims(face, ax), w)
    return out


# --- flat-rows form: operate on [P*n, n] rows for the x axis and
#     [P, n, n] only for y (concat on the cheap axis) ----------------------
def roll_form(u):
    lo_x = jnp.pad(u[:, :, : n - 1], ((0, 0), (0, 0), (1, 0)))
    hi_x = jnp.pad(u[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    lo_y = jnp.pad(u[:, : n - 1, :], ((0, 0), (1, 0), (0, 0)))
    hi_y = jnp.pad(u[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
    out = (
        h2[:, 0].reshape(P, 1, 1) * (lo_x + hi_x - 2.0 * u)
        + h2[:, 1].reshape(P, 1, 1) * (lo_y + hi_y - 2.0 * u)
    )
    for a in range(2):
        ax = 1 + (1 - a)
        h2i = h2[:, a].reshape(P, 1, 1)
        for side, pos in ((2 * a, 0), (2 * a + 1, n - 1)):
            face = coef[:, side].reshape(P, 1) * jnp.take(u, pos, axis=ax) \
                + 2.0 * gf[:, side]
            w = [(0, 0)] * 3
            w[ax] = (pos, n - 1 - pos)
            out = out + h2i * jnp.pad(jnp.expand_dims(face, ax), w)
    return out


def main():
    ref = concat_form(u)
    for name, fn in (("concat(base)", concat_form), ("pad", pad_form),
                     ("conv", conv_form), ("roll", roll_form)):
        d = float(jnp.max(jnp.abs(fn(u) - ref)))
        assert d < 1e-4, (name, d)
        report(name, fn, u)


if __name__ == "__main__":
    main()
