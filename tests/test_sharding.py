"""Mesh/sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.core.mesh import (DATA_AXIS, MEM_AXIS, MeshSpec, build_mesh,
                                   data_sharding, mem_sharding)
from panst3r_tpu.ops.attention import dot_product_attention
from panst3r_tpu.ops.sharded_attention import (ring_memory_attention,
                                               sharded_memory_attention)


def test_mesh_spec_resolution():
    assert MeshSpec(data=-1, mem=2).resolve(8) == (4, 2, 1)
    assert MeshSpec(data=8, mem=1).resolve(8) == (8, 1, 1)
    assert MeshSpec(data=2, mem=2, model=-1).resolve(8) == (2, 2, 2)
    with pytest.raises(ValueError):
        MeshSpec(data=3, mem=2).resolve(8)


def test_build_mesh_axes():
    mesh = build_mesh(MeshSpec(data=4, mem=2))
    assert mesh.axis_names == (DATA_AXIS, MEM_AXIS, 'model')
    assert mesh.devices.shape == (4, 2, 1)


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


def test_ring_memory_attention_matches_dense(rng):
    mesh = build_mesh(MeshSpec(data=1, mem=8))
    B, H, Nq, M, D = 1, 2, 16, 64, 32
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, M, D)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, M, D)), jnp.float32)

    out = ring_memory_attention(mesh, q, k, v)
    ref = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    valid = jnp.asarray(np.arange(M) < 40)[None]
    out2 = ring_memory_attention(mesh, q, k, v, valid)
    ref2 = dot_product_attention(q, k[:, :, :40], v[:, :, :40])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_kv_sharded_training_matches_unsharded(rng):
    """The GSPMD kv-sharding constraint must not change the math."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from panst3r_tpu.engine.criterion import PanopticLossConfig
    from panst3r_tpu.engine.train import (TrainConfig, TrainState,
                                          build_optimizer, make_train_step,
                                          shard_batch)
    from panst3r_tpu.models.panst3r import PanSt3R
    from tests.test_train import GRID, make_batch, tiny_model

    mesh = build_mesh(MeshSpec(data=4, mem=2))
    base = tiny_model()
    sharded = PanSt3R(base.config,
                      kv_shard=NamedSharding(mesh, P(DATA_AXIS, MEM_AXIS,
                                                     None)))
    B = 4
    batch = make_batch(rng, B)
    cls_emb = jnp.asarray(rng.standard_normal((5, 24)), jnp.float32)
    params = base.init(jax.random.PRNGKey(0), batch["images"][:1],
                       batch["portrait"][:1], cls_emb, GRID)

    tcfg = TrainConfig(lr=1e-3, accum_iter=1,
                       loss=PanopticLossConfig(num_points=32))
    tx, _ = build_optimizer(tcfg, 8, steps_per_epoch=4)

    losses = {}
    for name, model in [("base", base), ("sharded", sharded)]:
        state = TrainState.create(params, tx)
        step = make_train_step(model, tx, tcfg.loss, GRID, donate=False)
        with mesh:
            sbatch = shard_batch(batch, mesh)
            _, loss, _ = step(state, sbatch, cls_emb, jax.random.PRNGKey(0))
        losses[name] = float(loss)
    np.testing.assert_allclose(losses["sharded"], losses["base"], rtol=1e-5)


def test_sharding_helpers():
    mesh = build_mesh(MeshSpec(data=4, mem=2))
    s = data_sharding(mesh, None, None)
    assert s.spec == jax.sharding.PartitionSpec(DATA_AXIS, None, None)
    s2 = mem_sharding(mesh, 1, 3)
    assert s2.spec == jax.sharding.PartitionSpec(None, MEM_AXIS, None)


def test_fusion_sharded_matches(rng):
    """View-sharded fusion (SURVEY §5.8 distributed query-fusion): pan /
    conf / selection bit-exact vs the single-device `_fusion_full` — the
    cross-view coupling is integer area psums only."""
    from panst3r_tpu.engine.fusion import _fusion_full, fusion_sharded

    B, V, Q, h, w = 1, 8, 12, 16, 24
    H, W = 32, 48
    mask_cls = jnp.asarray(rng.standard_normal((B, Q, 5)) * 2, jnp.float32)
    mask_pred = jnp.asarray(rng.standard_normal((B, V, Q, h, w)) * 3,
                            jnp.float32)

    ref = _fusion_full(mask_cls, mask_pred, (H, W), "sigmoid", 0.1, None,
                       0.25, 0.5, 2, 0.1)

    mesh = build_mesh(MeshSpec(data=2, mem=4))
    out = fusion_sharded(mask_cls, mask_pred, (H, W), mesh, axis=MEM_AXIS)

    names = ("pan", "conf", "seg_ids", "labels", "selected")
    for name, a, b in zip(names, out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
