"""Tensor parallelism (core/tp.py): Megatron param shardings over the
``model`` mesh axis — output parity vs replicated execution, real weight
splits, and a TP train step."""
import jax
import jax.numpy as jnp
import numpy as np

from panst3r_tpu.core.mesh import (DATA_AXIS, MODEL_AXIS, MeshSpec,
                                   build_mesh)
from panst3r_tpu.core.tp import apply_tp, tp_shardings, tp_spec
from jax.sharding import NamedSharding, PartitionSpec as P

NCLS = 5
GRID = (2, 3)
H, W = 32, 48


def _setup(rng, B=2, V=2):
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import tiny_config

    model = PanSt3R(tiny_config())
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)) * 0.2,
                         jnp.float32)
    portrait = jnp.zeros((B, V), bool)
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1], portrait[:1],
                        cls_emb, GRID)
    return model, params, images, portrait, cls_emb


def test_tp_spec_rules(rng):
    model, params, *_ = _setup(rng)
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: tp_spec(p, l, 2), params)
    flat = {jax.tree_util.keystr(p): s for p, s in
            jax.tree_util.tree_leaves_with_path(
                specs, is_leaf=lambda x: isinstance(x, P))}
    col = [k for k, s in flat.items()
           if s and s[-1] == MODEL_AXIS and "kernel" in k]
    row = [k for k, s in flat.items()
           if len(s) >= 2 and s[-2] == MODEL_AXIS and "kernel" in k]
    assert any("qkv" in k for k in col)
    assert any("fc1" in k for k in col)
    assert any("proj" in k or "out_proj" in k for k in row)
    assert any("fc2" in k for k in row)
    # pointmap head (p*p*7 output) must stay replicated
    head = [s for k, s in flat.items()
            if "must3r_decoder" in k and "head" in k and "kernel" in k]
    assert head and all(all(ax is None for ax in s) for s in head)


def test_tp_forward_matches_replicated(rng):
    mesh = build_mesh(MeshSpec(data=2, mem=1, model=4))
    model, params, images, portrait, cls_emb = _setup(rng)

    ref, _ = jax.jit(model.apply, static_argnums=(4,))(
        params, images, portrait, cls_emb, GRID)

    tp_params = apply_tp(params, mesh)
    # Confirm the weights are actually split over the model axis.
    sharded_leaves = [
        l for l in jax.tree_util.tree_leaves(tp_params)
        if any(ax == MODEL_AXIS
               for ax in (l.sharding.spec or ()) if ax is not None)]
    assert len(sharded_leaves) > 0

    with mesh:
        out, _ = jax.jit(model.apply, static_argnums=(4,))(
            tp_params, images, portrait, cls_emb, GRID)
    np.testing.assert_allclose(np.asarray(out["pred_masks"]),
                               np.asarray(ref["pred_masks"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                               np.asarray(ref["pred_logits"]),
                               rtol=2e-4, atol=2e-4)


def test_tp_train_step_runs_and_learns(rng):
    from panst3r_tpu.engine.criterion import PanopticLossConfig
    from panst3r_tpu.engine.train import (TrainConfig, TrainState,
                                          build_optimizer, make_train_step,
                                          shard_batch)
    from tests.test_train import make_batch, tiny_model

    mesh = build_mesh(MeshSpec(data=2, mem=1, model=4))
    model = tiny_model()
    batch = make_batch(rng, 2)
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), batch["images"][:1],
                        batch["portrait"][:1], cls_emb, GRID)

    tcfg = TrainConfig(lr=1e-3, accum_iter=1, epochs=2, warmup_epochs=0,
                       loss=PanopticLossConfig(num_points=32))
    tx, _ = build_optimizer(tcfg, 2, steps_per_epoch=4)
    with mesh:
        tp_params = apply_tp(params, mesh)
        state = TrainState.create(tp_params, tx)
        step = make_train_step(model, tx, tcfg.loss, GRID, donate=False)
        sbatch = shard_batch(batch, mesh)
        losses = []
        for i in range(3):
            state, loss, _ = step(state, sbatch, cls_emb,
                                  jax.random.PRNGKey(i))
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
