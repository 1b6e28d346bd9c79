"""Mesh/sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.core.mesh import (DATA_AXIS, MEM_AXIS, MeshSpec, build_mesh,
                                   data_sharding, mem_sharding)
from panst3r_tpu.ops.attention import dot_product_attention
from panst3r_tpu.ops.sharded_attention import sharded_memory_attention


def test_mesh_spec_resolution():
    assert MeshSpec(data=-1, mem=2).resolve(8) == (4, 2)
    assert MeshSpec(data=8, mem=1).resolve(8) == (8, 1)
    with pytest.raises(ValueError):
        MeshSpec(data=3, mem=2).resolve(8)


def test_build_mesh_axes():
    mesh = build_mesh(MeshSpec(data=4, mem=2))
    assert mesh.axis_names == (DATA_AXIS, MEM_AXIS)
    assert mesh.devices.shape == (4, 2)


def test_sharded_memory_attention_matches_dense(rng):
    mesh = build_mesh(MeshSpec(data=1, mem=8))
    B, H, Nq, M, D = 2, 4, 16, 64, 32
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, M, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, M, D)), jnp.float32)

    out = sharded_memory_attention(mesh, q, k, v)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_sharded_memory_attention_with_validity(rng):
    mesh = build_mesh(MeshSpec(data=1, mem=8))
    B, H, Nq, M, D = 1, 2, 8, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, M, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, M, D)), jnp.float32)
    valid = jnp.asarray(np.arange(M) < 40)[None].repeat(B, 0)

    out = sharded_memory_attention(mesh, q, k, v, valid)
    ref = dot_product_attention(q, k[:, :, :40], v[:, :, :40])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharding_helpers():
    mesh = build_mesh(MeshSpec(data=4, mem=2))
    s = data_sharding(mesh, None, None)
    assert s.spec == jax.sharding.PartitionSpec(DATA_AXIS, None, None)
    s2 = mem_sharding(mesh, 1, 3)
    assert s2.spec == jax.sharding.PartitionSpec(None, MEM_AXIS, None)
