"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pressurepoissonsolver_tpu.domain import DomainHierarchy
from pressurepoissonsolver_tpu.geometry import refined_tree, uniform_tree
from pressurepoissonsolver_tpu.ops.level_ops import Level
from pressurepoissonsolver_tpu.parallel.sharding import (
    make_mesh,
    pad_level,
    patch_sharding,
    shard_patch_array,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8


def test_pad_level_noop_ops():
    """Dummy patches stay identically zero under apply/smooth."""
    t = uniform_tree(2, 3)
    h = DomainHierarchy(t, n=4)
    pl = pad_level(h.finest, 7)  # 16 -> 21
    assert pl.num_patches == 21
    lvl = Level(pl)
    rng = np.random.default_rng(0)
    u = np.zeros((21, 4, 4))
    u[:16] = rng.standard_normal((16, 4, 4))
    au = np.asarray(lvl.apply(jnp.asarray(u)))
    assert np.abs(au[16:]).max() == 0.0
    # real patches unaffected by padding
    lvl0 = Level(h.finest)
    au0 = np.asarray(lvl0.apply(jnp.asarray(u[:16])))
    np.testing.assert_allclose(au[:16], au0, rtol=1e-12)


def test_sharded_apply_matches_single_device():
    ndev = 8
    mesh = make_mesh(ndev)
    t = refined_tree(2, 3, 1)
    h = DomainHierarchy(t, n=4)
    pl = pad_level(h.finest, ndev)
    lvl = Level(pl)
    rng = np.random.default_rng(1)
    u_np = rng.standard_normal((pl.num_patches, 4, 4))

    ref = np.asarray(lvl.apply(jnp.asarray(u_np)))

    u = shard_patch_array(jnp.asarray(u_np), mesh)
    sh = patch_sharding(mesh)
    f = jax.jit(
        lambda x: jax.lax.with_sharding_constraint(lvl.apply(x), sh)
    )
    out = f(u)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12, atol=1e-12)
    assert out.sharding.is_equivalent_to(sh, out.ndim)


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == args[0].shape


def test_halo_apply_matches_global():
    """Explicit shard_map halo-exchange apply == global apply, 8 devices."""
    from pressurepoissonsolver_tpu.parallel.halo import HaloApply

    ndev = 8
    mesh = make_mesh(ndev)
    t = refined_tree(2, 3, 1)
    h = DomainHierarchy(t, n=8)
    pl = pad_level(h.finest, ndev)
    lvl = Level(pl)
    rng = np.random.default_rng(5)
    u_np = rng.standard_normal((pl.num_patches, 8, 8))
    ref = np.asarray(lvl.apply(jnp.asarray(u_np)))
    ha = HaloApply(lvl, mesh)
    u = shard_patch_array(jnp.asarray(u_np), mesh)
    out = jax.jit(ha)(u)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12, atol=1e-12)
    assert out.sharding.is_equivalent_to(patch_sharding(mesh), out.ndim)


def test_halo_apply_3d():
    from pressurepoissonsolver_tpu.parallel.halo import HaloApply

    ndev = 4
    mesh = make_mesh(ndev)
    t = refined_tree(3, 2, 1)
    h = DomainHierarchy(t, n=4)
    pl = pad_level(h.finest, ndev)
    lvl = Level(pl)
    rng = np.random.default_rng(6)
    u_np = rng.standard_normal((pl.num_patches, 4, 4, 4))
    ref = np.asarray(lvl.apply(jnp.asarray(u_np)))
    ha = HaloApply(lvl, mesh)
    u = shard_patch_array(jnp.asarray(u_np), mesh)
    out = jax.jit(ha)(u)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12, atol=1e-12)
