"""Flagship multi-epoch training smoke on the real chip: PanSt3R v1,
structured synthetic scenes, masked optimizer + bf16 frozen backbones.

Round-1 result (grid sampling, one 512x256 bucket): loss 206 -> 22.6 over
80 steps, ~1.4 s/step.

Options close VERDICT r2 #3c — the PQ-parity acceptance run must be
possible at the reference's semantics, not just the TPU grid defaults:
  --sampling random   matcher_sampling=loss_sampling="random" (the
                      reference's shared-uniform matcher points,
                      matcher.py:152-171, + PointRend uncertainty loss
                      sampling, panoptic.py:410-463)
  --buckets 2         train across two resolution buckets (512x256 +
                      512x384) with one compiled step per bucket routed
                      by batch shape, as apps/train.py does.
"""
import argparse
import os
import sys
import time

_root = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, _root)
sys.path.insert(0, os.path.join(_root, "tests"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(_root, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tempfile
from test_data import _make_scannetpp
from panst3r_tpu.data.scannetpp import ScanNetppPanoptic
from panst3r_tpu.data.loader import epoch_batches
from panst3r_tpu.models.presets import panst3r_v1_config
from panst3r_tpu.models.panst3r import PanSt3R
from panst3r_tpu.engine.train import (TrainConfig, TrainState,
                                      build_optimizer, make_train_step,
                                      trainable_mask, cast_frozen_params)
from panst3r_tpu.engine.criterion import PanopticLossConfig

ap = argparse.ArgumentParser()
ap.add_argument("--sampling", choices=["grid", "random"], default="grid")
ap.add_argument("--buckets", type=int, default=1, choices=[1, 2])
ap.add_argument("--epochs", type=int, default=8)
ap.add_argument("--num-points", type=int, default=2048)
args = ap.parse_args()

# (W, H) landscape-canonical buckets, reference base.yaml:46 style.
resolutions = [(512, 256), (512, 384)][: args.buckets]

tmp = tempfile.mkdtemp()
_make_scannetpp(tmp, n_scenes=2, n_views=6, hw=(384, 512))
ds = ScanNetppPanoptic(tmp, resolution=resolutions, num_views=3, aug_crop=0)
classes = sorted(set(ds.classes))
rng = np.random.default_rng(0)
cls_emb = rng.standard_normal((len(classes), 768)).astype(np.float32)
cls_emb /= np.linalg.norm(cls_emb, axis=-1, keepdims=True)
grids = {(h, w): (h // 16, w // 16) for (w, h) in resolutions}

model = PanSt3R(panst3r_v1_config())
t0 = time.time()
h0, w0 = resolutions[0][1], resolutions[0][0]
params = jax.jit(model.init, static_argnums=(4,))(
    jax.random.PRNGKey(0), jnp.zeros((1, 3, h0, w0, 3)),
    jnp.zeros((1, 3), bool), jnp.asarray(cls_emb), (h0 // 16, w0 // 16))
params = cast_frozen_params(params)
print(f"init {time.time()-t0:.0f}s", flush=True)

tcfg = TrainConfig(lr=2e-4, accum_iter=1, warmup_epochs=0, epochs=10,
                   batch_size=1, max_instances=16,
                   loss=PanopticLossConfig(
                       num_points=args.num_points,
                       matcher_sampling=args.sampling,
                       loss_sampling=args.sampling))
tx, _ = build_optimizer(tcfg, 1, steps_per_epoch=10,
                        trainable_mask=trainable_mask(params))
state = TrainState.create(params, tx)
# One compiled step per bucket, routed by the batch image shape
# (apps/train.py:180-186).
step_fns = {hw: make_train_step(model, tx, tcfg.loss, g, donate=False,
                                train_mask=trainable_mask(params))
            for hw, g in grids.items()}

losses = []
step_times: dict = {hw: [] for hw in grids}
t0 = time.time()
n_steps = 0
for epoch in range(args.epochs):
    for batch in epoch_batches(ds, 1, classes, 16, epoch,
                               num_resolutions=len(resolutions)):
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        hw = tuple(batch["images"].shape[2:4])
        ts = time.time()
        state, loss, _ = step_fns[hw](state, batch, jnp.asarray(cls_emb),
                                      jax.random.PRNGKey(n_steps))
        loss = float(loss)  # sync
        step_times[hw].append(time.time() - ts)
        losses.append(loss)
        n_steps += 1
    print(f"epoch {epoch}: loss {np.mean(losses[-10:]):.2f} "
          f"({time.time()-t0:.0f}s, {n_steps} steps)", flush=True)
print(f"first loss {losses[0]:.2f} -> last {losses[-1]:.2f}")
for hw, ts in step_times.items():
    steady = np.median(ts[2:]) if len(ts) > 2 else float("nan")
    print(f"bucket {hw}: {len(ts)} steps, first (compile) {ts[0]:.1f}s, "
          f"steady {steady:.2f} s/step", flush=True)
assert all(np.isfinite(losses))
print(f"FLAGSHIP TRAIN SMOKE OK sampling={args.sampling} "
      f"buckets={args.buckets}", flush=True)
