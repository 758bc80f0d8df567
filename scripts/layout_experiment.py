"""Layout microbenchmark: [P,16,16] vs flat [P,256] patch fields.

OP_REPORT_r3 found every hot op pinned at ~1.1-1.3 ms f32 regardless of
intrinsic cost.  Hypothesis: the [P,16,16] layout wastes 8x on the TPU
(8,128) tile grid (16-lane minor dim), and the per-op floor is layout
traffic, not compute.  This script times, at bench size (P=10240, n=16):

  1. elementwise axpy on [P,16,16] vs [P,256]          (pure padding test)
  2. star stencil: current concat form vs flat masked-roll vs flat matmul
  3. spectral solve: per-axis matmuls vs flat kron [P,256]@[256,256]
  4. row-gather granularity: [C,16] / [C,64] / [C,128] / [C,256]

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/layout_experiment.py
Writes /tmp/layout_experiment.json and prints the table (flushed).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pressurepoissonsolver_tpu.ops.level_ops import _star_stencil
from pressurepoissonsolver_tpu.ops import transforms as tr
from pressurepoissonsolver_tpu.utils import profiling

P = int(os.environ.get("PPS_LAYOUT_P", "10240"))
N = 16
M = N * N
DT = jnp.float32


def spread_face(g, side):
    """[P,16] face values -> [P,256] flat field, nonzero on that face only."""
    if side == "ylo":
        return jnp.pad(g, ((0, 0), (0, M - N)))
    if side == "yhi":
        return jnp.pad(g, ((0, 0), (M - N, 0)))
    if side == "xlo":
        return jnp.pad(g[:, :, None], ((0, 0), (0, 0), (0, N - 1))).reshape(-1, M)
    if side == "xhi":
        return jnp.pad(g[:, :, None], ((0, 0), (0, 0), (N - 1, 0))).reshape(-1, M)
    raise ValueError(side)


lane = np.arange(M)
X, Y = lane % N, lane // N
m_xlo = jnp.asarray((X > 0).astype(np.float32))
m_xhi = jnp.asarray((X < N - 1).astype(np.float32))
m_ylo = jnp.asarray((Y > 0).astype(np.float32))
m_yhi = jnp.asarray((Y < N - 1).astype(np.float32))
b_xlo = jnp.asarray((X == 0).astype(np.float32))
b_xhi = jnp.asarray((X == N - 1).astype(np.float32))
b_ylo = jnp.asarray((Y == 0).astype(np.float32))
b_yhi = jnp.asarray((Y == N - 1).astype(np.float32))


def stencil_flat_roll(u, gf, coef, h2inv):
    """u,out: [P,256]; gf [P,4,16] (xlo,xhi,ylo,yhi); coef [P,4]; h2inv [P,2]."""
    gxl = spread_face(gf[:, 0], "xlo")
    gxh = spread_face(gf[:, 1], "xhi")
    gyl = spread_face(gf[:, 2], "ylo")
    gyh = spread_face(gf[:, 3], "yhi")
    r1 = jnp.roll(u, 1, axis=1)
    r_1 = jnp.roll(u, -1, axis=1)
    rN = jnp.roll(u, N, axis=1)
    r_N = jnp.roll(u, -N, axis=1)
    cxl = coef[:, 0:1]
    cxh = coef[:, 1:2]
    cyl = coef[:, 2:3]
    cyh = coef[:, 3:4]
    Lx = r1 * m_xlo + cxl * u * b_xlo + 2.0 * gxl
    Rx = r_1 * m_xhi + cxh * u * b_xhi + 2.0 * gxh
    Ly = rN * m_ylo + cyl * u * b_ylo + 2.0 * gyl
    Ry = r_N * m_yhi + cyh * u * b_yhi + 2.0 * gyh
    return h2inv[:, 0:1] * (Lx + Rx - 2.0 * u) + h2inv[:, 1:2] * (Ly + Ry - 2.0 * u)


def _axis_matrices():
    """A_x, A_y [256,256]: interior-neighbor + diag part of the stencil."""
    Ax = np.zeros((M, M), np.float32)
    Ay = np.zeros((M, M), np.float32)
    for l in range(M):
        x, y = l % N, l // N
        Ax[l, l] -= 2.0
        Ay[l, l] -= 2.0
        if x > 0:
            Ax[l - 1, l] += 1.0
        if x < N - 1:
            Ax[l + 1, l] += 1.0
        if y > 0:
            Ay[l - N, l] += 1.0
        if y < N - 1:
            Ay[l + N, l] += 1.0
    return jnp.asarray(Ax), jnp.asarray(Ay)


A_x, A_y = _axis_matrices()


def stencil_flat_mm(u, gf, coef, h2inv):
    hp = jax.lax.Precision.HIGHEST
    sx = u @ A_x.astype(u.dtype)
    sy = u @ A_y.astype(u.dtype)
    sx = jnp.dot(u, A_x.astype(u.dtype), precision=hp)
    sy = jnp.dot(u, A_y.astype(u.dtype), precision=hp)
    bx = coef[:, 0:1] * u * b_xlo + coef[:, 1:2] * u * b_xhi \
        + 2.0 * (spread_face(gf[:, 0], "xlo") + spread_face(gf[:, 1], "xhi"))
    by = coef[:, 2:3] * u * b_ylo + coef[:, 3:4] * u * b_yhi \
        + 2.0 * (spread_face(gf[:, 2], "ylo") + spread_face(gf[:, 3], "yhi"))
    return h2inv[:, 0:1] * (sx + bx) + h2inv[:, 1:2] * (sy + by)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    bw = profiling._device_bw()
    report = {"device": str(dev), "P": P, "hbm_bytes_per_s": bw}
    fb = P * M * 4  # f32 field bytes

    u3 = jnp.asarray(rng.standard_normal((P, N, N)), dtype=DT)
    v3 = jnp.asarray(rng.standard_normal((P, N, N)), dtype=DT)
    u2 = u3.reshape(P, M)
    v2 = v3.reshape(P, M)
    gf = jnp.asarray(rng.standard_normal((P, 4, N)), dtype=DT)
    coef = jnp.asarray(rng.choice([-1.0, 1.0], size=(P, 4)), dtype=DT)
    h2 = jnp.asarray(rng.uniform(1.0, 2.0, size=(P, 2)), dtype=DT)

    def add(name, fn, args, bytes_needed, reps=500):
        t = profiling.time_op(fn, *args, reps=reps, in_graph=True)
        report[name] = {
            "ms": round(t * 1e3, 4),
            "roofline_pct": round(100 * bytes_needed / bw / t, 2),
        }
        print(f"{name:24s} {report[name]}", flush=True)

    # 1. padding test
    add("axpy_[P,16,16]", lambda a, b: 2.0 * a + b, (u3, v3), 3 * fb)
    add("axpy_[P,256]", lambda a, b: 2.0 * a + b, (u2, v2), 3 * fb)

    # 2. stencil — correctness first
    # reference form expects gf rows (xlo,xhi,ylo,yhi) == axis order a=0 x
    ref = _star_stencil(u3, gf, coef, h2, 2, N)
    got_roll = stencil_flat_roll(u2, gf, coef, h2)
    err_roll = float(jnp.max(jnp.abs(ref.reshape(P, M) - got_roll)))
    got_mm = stencil_flat_mm(u2, gf, coef, h2)
    err_mm = float(jnp.max(jnp.abs(ref.reshape(P, M) - got_mm)))
    report["stencil_err"] = {"roll": err_roll, "mm": err_mm}
    print(f"stencil max-abs err: roll={err_roll:.2e} mm={err_mm:.2e}", flush=True)
    add("stencil_cur", lambda x: _star_stencil(x, gf, coef, h2, 2, N), (u3,), 2 * fb)
    add("stencil_flat_roll", lambda x: stencil_flat_roll(x, gf, coef, h2), (u2,), 2 * fb)
    add("stencil_flat_mm", lambda x: stencil_flat_mm(x, gf, coef, h2), (u2,), 2 * fb)

    # 3. spectral: per-axis (current form) vs kron flat
    Tx = jnp.asarray(tr.transform_matrix(tr.DST_II, N)).astype(DT)
    Txi = jnp.asarray(tr.transform_matrix(tr.DST_III, N)).astype(DT)
    denom3 = jnp.asarray(
        rng.uniform(-3.0, -1.0, size=(P, N, N)), dtype=DT
    )
    denom2 = denom3.reshape(P, M)
    W1 = jnp.asarray(np.kron(np.asarray(Tx), np.asarray(Tx)).T).astype(DT)
    W2 = jnp.asarray(np.kron(np.asarray(Txi), np.asarray(Txi)).T).astype(DT)

    def spectral_axes(x):
        scale = (2.0 / N) ** 2
        y = jnp.moveaxis((jnp.moveaxis(x, 2, -1).reshape(-1, N) @ Tx.T).reshape(P, N, N), -1, 2)
        y = jnp.moveaxis((jnp.moveaxis(y, 1, -1).reshape(-1, N) @ Tx.T).reshape(P, N, N), -1, 1)
        y = y / denom3
        y = jnp.moveaxis((jnp.moveaxis(y, 2, -1).reshape(-1, N) @ Txi.T).reshape(P, N, N), -1, 2)
        y = jnp.moveaxis((jnp.moveaxis(y, 1, -1).reshape(-1, N) @ Txi.T).reshape(P, N, N), -1, 1)
        return y * scale

    def spectral_kron(x):
        scale = (2.0 / N) ** 2
        return ((x @ W1) / denom2) @ (W2 * scale)

    ek = float(jnp.max(jnp.abs(spectral_axes(u3).reshape(P, M) - spectral_kron(u2))))
    report["spectral_err_kron_vs_axes"] = ek
    print(f"spectral kron-vs-axes max-abs err: {ek:.2e}", flush=True)
    add("spectral_axes", spectral_axes, (u3,), 2 * fb)
    add("spectral_kron", spectral_kron, (u2,), 2 * fb)

    # 4. gather granularity (same useful bytes each: C rows of 16 useful lanes)
    C = 4 * P
    idx = jnp.asarray(rng.integers(0, C, size=C))
    for w in (16, 64, 128, 256):
        a = jnp.asarray(rng.standard_normal((C, w)), dtype=DT)
        add(f"gather_[C,{w}]", lambda t, ix=idx: t[ix], (a,), 2 * C * w * 4)

    with open("/tmp/layout_experiment.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print("wrote /tmp/layout_experiment.json", flush=True)


if __name__ == "__main__":
    main()
