"""Flagship multi-epoch training smoke on the real chip: PanSt3R v1 at
256x512, structured synthetic scenes, masked optimizer + bf16 frozen
backbones.  Round-1 result: loss 206 -> 22.6 over 80 steps, ~1.4 s/step."""
import os, sys, time
_root = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, _root); sys.path.insert(0, os.path.join(_root, "tests"))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.abspath(os.path.join(_root, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import tempfile
from test_data import _make_scannetpp
from panst3r_tpu.data.scannetpp import ScanNetppPanoptic
from panst3r_tpu.data.loader import epoch_batches
from panst3r_tpu.models.presets import panst3r_v1_config
from panst3r_tpu.models.panst3r import PanSt3R
from panst3r_tpu.engine.train import (TrainConfig, TrainState, build_optimizer,
                                      make_train_step, trainable_mask,
                                      cast_frozen_params)
from panst3r_tpu.engine.criterion import PanopticLossConfig

tmp = tempfile.mkdtemp()
_make_scannetpp(tmp, n_scenes=2, n_views=6, hw=(256, 512))
ds = ScanNetppPanoptic(tmp, resolution=(512, 256), num_views=3, aug_crop=0)
classes = sorted(set(ds.classes))
rng = np.random.default_rng(0)
cls_emb = rng.standard_normal((len(classes), 768)).astype(np.float32)
cls_emb /= np.linalg.norm(cls_emb, axis=-1, keepdims=True)
GRID = (16, 32)

model = PanSt3R(panst3r_v1_config())
t0 = time.time()
params = jax.jit(model.init, static_argnums=(4,))(
    jax.random.PRNGKey(0), jnp.zeros((1, 3, 256, 512, 3)),
    jnp.zeros((1, 3), bool), jnp.asarray(cls_emb), GRID)
params = cast_frozen_params(params)
print(f"init {time.time()-t0:.0f}s", flush=True)

tcfg = TrainConfig(lr=2e-4, accum_iter=1, warmup_epochs=0, epochs=10,
                   batch_size=1, max_instances=16,
                   loss=PanopticLossConfig(num_points=2048))
tx, _ = build_optimizer(tcfg, 1, steps_per_epoch=10,
                        trainable_mask=trainable_mask(params))
state = TrainState.create(params, tx)
step = make_train_step(model, tx, tcfg.loss, GRID, donate=False,
                       train_mask=trainable_mask(params))

losses = []
t0 = time.time()
n_steps = 0
for epoch in range(8):
    for batch in epoch_batches(ds, 1, classes, 16, epoch):
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        state, loss, _ = step(state, batch, jnp.asarray(cls_emb),
                              jax.random.PRNGKey(n_steps))
        losses.append(float(loss)); n_steps += 1
    print(f"epoch {epoch}: loss {np.mean(losses[-10:]):.2f} "
          f"({time.time()-t0:.0f}s, {n_steps} steps)", flush=True)
print(f"first loss {losses[0]:.2f} -> last {losses[-1]:.2f}; "
      f"steady step {np.median(np.diff([0]+list(np.cumsum(np.ones(len(losses)))))):.2f}")
assert all(np.isfinite(losses))
print("FLAGSHIP TRAIN SMOKE OK", flush=True)
