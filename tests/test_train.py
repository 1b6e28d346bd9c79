"""Train step on the virtual 8-device mesh + checkpoint round-trip."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.core.checkpoint import (latest_checkpoint, load_checkpoint,
                                         save_checkpoint)
from panst3r_tpu.core.mesh import MeshSpec, build_mesh
from panst3r_tpu.engine.criterion import PanopticLossConfig, Targets
from panst3r_tpu.engine.train import (TrainConfig, TrainState,
                                      build_optimizer, cosine_lr,
                                      make_train_step, shard_batch)
from panst3r_tpu.models.decoder import MemoryDecoderConfig
from panst3r_tpu.models.dino import DinoEncoderConfig
from panst3r_tpu.models.encoder import ViTEncoderConfig
from panst3r_tpu.models.mask_transformer import MaskTransformerConfig
from panst3r_tpu.models.panoptic_decoder import PanopticDecoderConfig
from panst3r_tpu.models.panst3r import PanSt3R, PanSt3RConfig
from panst3r_tpu.models.upscalers import PixelShuffleUpscalerConfig

H, W = 32, 48
GRID = (2, 3)
NCLS, T, V = 5, 4, 2


def tiny_model():
    return PanSt3R(PanSt3RConfig(
        encoder=ViTEncoderConfig(embed_dim=64, depth=1, num_heads=4),
        decoder=MemoryDecoderConfig(enc_dim=64, dim=48, depth=1, num_heads=4),
        dino=DinoEncoderConfig(embed_dim=32, depth=1, num_heads=2,
                               pos_grid=5),
        panoptic=PanopticDecoderConfig(
            upscaler=PixelShuffleUpscalerConfig(fp_dim=(32, 24, 16, 8)),
            mask_transformer=MaskTransformerConfig(
                hidden_dim=32, ff_dim=64, mask_dim=8, num_queries=8,
                num_heads=4, dec_layers=1, lang_dim=24, fpn_dims=(32,)),
        ),
    ))


def make_batch(rng, B):
    return {
        "images": jnp.asarray(rng.standard_normal((B, V, H, W, 3)) * 0.2,
                              jnp.float32),
        "portrait": jnp.zeros((B, V), bool),
        "targets": Targets(
            labels=jnp.asarray(rng.integers(0, NCLS, (B, T)), jnp.int32),
            masks=jnp.asarray((rng.random((B, T, V, H, W)) < 0.3),
                              jnp.float32),
            valid=jnp.asarray(np.tile([True, True, False, False], (B, 1))),
            output_mask=jnp.ones((B, NCLS), bool)),
    }


def test_cosine_lr_schedule():
    cfg = TrainConfig(epochs=10, warmup_epochs=2, lr=1e-3, min_lr=1e-5)
    sched = cosine_lr(cfg, world_size=1, steps_per_epoch=10)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(20)), 1e-3, rtol=1e-5)
    assert float(sched(99)) < 2e-4
    # blr scaling when lr unset (reference train.py:211-214)
    cfg2 = TrainConfig(lr=None, blr=1.5e-4, batch_size=2, accum_iter=2)
    assert abs(cfg2.effective_lr(4) - 1.5e-4 * 16 / 256) < 1e-12


def test_train_step_dp_mesh(rng):
    mesh = build_mesh(MeshSpec(data=8, mem=1))
    model = tiny_model()
    B = 8
    batch = make_batch(rng, B)
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), batch["images"][:1],
                        batch["portrait"][:1], cls_emb, GRID)

    tcfg = TrainConfig(lr=1e-3, accum_iter=1, epochs=2, warmup_epochs=0,
                       loss=PanopticLossConfig(num_points=32))
    tx, sched = build_optimizer(tcfg, 8, steps_per_epoch=4)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, tcfg.loss, GRID)

    with mesh:
        sbatch = shard_batch(batch, mesh)
        losses = []
        for i in range(3):
            state, loss, details = step(state, sbatch, cls_emb,
                                        jax.random.PRNGKey(i))
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3
    # training on the same batch must reduce loss
    assert losses[-1] < losses[0]


def test_precompile_step_fns_matches_real_call(rng):
    """Concurrent AOT bucket precompile: the spec-lowered HLO must be
    byte-identical to the real call's lowering (that identity is what
    makes the first real step a persistent-cache hit), and the real step
    must run cleanly afterwards."""
    from panst3r_tpu.engine.train import (precompile_step_fns,
                                          step_arg_specs)

    mesh = build_mesh(MeshSpec(data=8, mem=1))
    model = tiny_model()
    B = 8
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 24)), jnp.float32)
    batch = make_batch(rng, B)
    params = model.init(jax.random.PRNGKey(0), batch["images"][:1],
                        batch["portrait"][:1], cls_emb, GRID)
    tcfg = TrainConfig(lr=1e-3, accum_iter=1, epochs=2, warmup_epochs=0,
                       loss=PanopticLossConfig(num_points=32))
    tx, _ = build_optimizer(tcfg, 8, steps_per_epoch=4)
    state = TrainState.create(params, tx)
    step_fns = {(H, W): make_train_step(model, tx, tcfg.loss, GRID,
                                        donate=False)}

    with mesh:
        fn = step_fns[(H, W)]
        specs = step_arg_specs(state, cls_emb, mesh, B, V, T, NCLS, (H, W))
        sbatch = shard_batch(batch, mesh)
        spec_hlo = fn.lower(*specs).as_text()
        real_hlo = fn.lower(state, sbatch, cls_emb,
                            jax.random.PRNGKey(0)).as_text()
        assert spec_hlo == real_hlo

        dt = precompile_step_fns(step_fns, state, cls_emb, mesh, B, V,
                                 T, NCLS)
        assert dt >= 0
        state2, loss, _ = fn(state, sbatch, cls_emb, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1


def test_frozen_submodules_receive_zero_grads(rng):
    model = tiny_model()
    B = 1
    batch = make_batch(rng, B)
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), batch["images"],
                        batch["portrait"], cls_emb, GRID)

    from panst3r_tpu.engine.criterion import panoptic_loss

    def loss_fn(p):
        panout, _ = model.apply(p, batch["images"], batch["portrait"],
                                cls_emb, GRID)
        total, _ = panoptic_loss(jax.random.PRNGKey(0), panout,
                                 batch["targets"],
                                 PanopticLossConfig(num_points=32))
        return total

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        mag = float(jnp.abs(g).max())
        if any(s in name for s in ("must3r_encoder", "dino_encoder",
                                   "must3r_decoder")):
            assert mag == 0.0, f"frozen param {name} got gradient {mag}"
    pan_grads = [float(jnp.abs(g).max()) for path, g in flat
                 if "panoptic_decoder" in "/".join(
                     str(p.key) for p in path if hasattr(p, "key"))]
    assert max(pan_grads) > 0.0


def test_checkpoint_roundtrip(rng):
    tree = {"params": {"w": jnp.asarray(rng.standard_normal((4, 4)),
                                        jnp.float32)},
            "step": jnp.asarray(7)}
    from panst3r_tpu.models.encoder import ViTEncoderConfig

    with tempfile.TemporaryDirectory() as d:
        assert latest_checkpoint(d) is None
        save_checkpoint(d, "last", tree, ViTEncoderConfig(depth=3),
                        meta={"epoch": 5})
        assert latest_checkpoint(d) == "last"
        restored, mcfg, meta = load_checkpoint(d, "last", tree)
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                                   np.asarray(tree["params"]["w"]))
        assert mcfg.depth == 3
        assert meta["epoch"] == 5


def test_train_mask_freezes_and_matches(rng):
    """train_mask (no-backward-through-frozen) must leave frozen params
    bit-identical, produce the same loss as the maskless step, and still
    train the panoptic decoder."""
    from panst3r_tpu.engine.train import trainable_mask

    model = tiny_model()
    batch = make_batch(rng, 1)
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), batch["images"],
                        batch["portrait"], cls_emb, GRID)
    tmask = trainable_mask(params, ("panoptic_decoder",))

    tcfg = TrainConfig(lr=1e-3, accum_iter=1, epochs=2, warmup_epochs=0,
                       loss=PanopticLossConfig(num_points=32))
    tx, _ = build_optimizer(tcfg, 1, steps_per_epoch=4,
                            trainable_mask=tmask)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, tcfg.loss, GRID, donate=False,
                           train_mask=tmask)
    ref_step = make_train_step(model, tx, tcfg.loss, GRID, donate=False)

    key = jax.random.PRNGKey(0)
    _, ref_loss, _ = ref_step(state, batch, cls_emb, key)
    new_state, loss, _ = step(state, batch, cls_emb, key)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    flat_old = jax.tree_util.tree_leaves_with_path(state.params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    flat_mask = dict(jax.tree_util.tree_leaves_with_path(tmask))
    changed_trainable = 0
    for path, old in flat_old:
        new = flat_new[path]
        if flat_mask[path]:
            changed_trainable += int(not np.array_equal(np.asarray(old),
                                                        np.asarray(new)))
        else:
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new),
                                          err_msg=str(path))
    assert changed_trainable > 0

    losses = [float(loss)]
    st = new_state
    for i in range(1, 3):
        st, l, _ = step(st, batch, cls_emb, jax.random.PRNGKey(i))
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_train_one_epoch_sync_every(rng):
    """Pipelined loss fetching (sync_every > 1): identical losses/state to
    per-step sync, and the NaN abort still fires (at most N-1 steps late)."""
    from panst3r_tpu.engine.train import train_one_epoch

    mesh = build_mesh(MeshSpec(data=1, mem=1))
    model = tiny_model()
    batch_np = make_batch(rng, 1)
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 24)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), batch_np["images"],
                        batch_np["portrait"], cls_emb, GRID)
    tcfg = TrainConfig(lr=1e-3, accum_iter=1, epochs=2, warmup_epochs=0,
                       loss=PanopticLossConfig(num_points=32))
    tx, _ = build_optimizer(tcfg, 1, steps_per_epoch=4)
    step = make_train_step(model, tx, tcfg.loss, GRID, donate=False)

    def run(sync_every):
        state = TrainState.create(params, tx)
        return train_one_epoch(state, step, [batch_np] * 4, cls_emb, mesh,
                               epoch=0, seed=0, sync_every=sync_every)

    st1, stats1 = run(1)
    st3, stats3 = run(3)
    assert stats1["loss"] == stats3["loss"]
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # NaN abort still fires under deferred sync.
    def nan_step(state, batch, cls, key):
        st, loss, det = step(state, batch, cls, key)
        return st, loss * jnp.nan, det

    state = TrainState.create(params, tx)
    with pytest.raises(FloatingPointError):
        train_one_epoch(state, nan_step, [batch_np] * 4, cls_emb, mesh,
                        epoch=0, seed=0, sync_every=4)
