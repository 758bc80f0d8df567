"""Pallas kernel correctness: interpret mode on CPU must match the XLA
reference path bit-for-bit (up to roundoff)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pressurepoissonsolver_tpu.domain import DomainHierarchy
from pressurepoissonsolver_tpu.geometry import refined_tree, uniform_tree
from pressurepoissonsolver_tpu.ops.level_ops import Level


def _pair(D=2, n=8, neumann=False, adaptive=True):
    t = refined_tree(D, 2, 1) if adaptive else uniform_tree(D, 2)
    h = DomainHierarchy(t, n=n, neumann=neumann)
    ref = Level(h.finest, use_pallas=False)
    pal = Level(h.finest, use_pallas=True)
    pal._pallas_interpret = True
    return ref, pal


@pytest.mark.parametrize("D", [2, 3])
@pytest.mark.parametrize("neumann", [False, True])
def test_pallas_stencil_matches(D, neumann):
    ref, pal = _pair(D=D, n=4, neumann=neumann)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((ref.P,) + ref.pl.ns_shape))
    g = jnp.asarray(rng.standard_normal((ref.num_ifaces, ref.m)))
    a = np.asarray(ref.apply_with_interface(u, g))
    b = np.asarray(pal.apply_with_interface(u, g))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("D", [2, 3])
@pytest.mark.parametrize("neumann", [False, True])
def test_pallas_patch_solve_matches(D, neumann):
    ref, pal = _pair(D=D, n=4, neumann=neumann)
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((ref.P,) + ref.pl.ns_shape))
    g = jnp.asarray(rng.standard_normal((ref.num_ifaces, ref.m)))
    a = np.asarray(ref.patch_solve(f, g))
    b = np.asarray(pal.patch_solve(f, g))
    np.testing.assert_allclose(b, a, rtol=1e-11, atol=1e-11)


def test_pallas_block_padding():
    """Patch counts that don't divide the block size must pad correctly."""
    ref, pal = _pair(D=2, n=8, adaptive=True)  # P=7 patches
    assert ref.P % 256 != 0
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((ref.P, 8, 8)))
    a = np.asarray(ref.apply(u))
    b = np.asarray(pal.apply(u))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12)
