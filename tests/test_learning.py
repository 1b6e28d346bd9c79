"""End-to-end learning test: the full stack (data → training → matcher/
losses → checkpointless inference → fusion → PQ) must overfit a synthetic
scene.  This is the framework's strongest integration guarantee: every
gradient path, the assignment problem, and the evaluation protocol all have
to be right for PQ to reach 100 on the toy scene."""
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panst3r_tpu.apps.eval import evaluate_scene
from panst3r_tpu.core.bucketing import Bucket
from panst3r_tpu.core.mesh import MeshSpec, build_mesh
from panst3r_tpu.data.loader import epoch_batches
from panst3r_tpu.data.scannetpp import ScanNetppPanoptic
from panst3r_tpu.engine.criterion import PanopticLossConfig
from panst3r_tpu.engine.eval import PQStat, summarize
from panst3r_tpu.engine.inference import InferenceEngine
from panst3r_tpu.engine.train import (TrainConfig, TrainState,
                                      build_optimizer, make_train_step)
from panst3r_tpu.models.panst3r import PanSt3R
from panst3r_tpu.models.presets import tiny_config

from tests.test_data import _make_scannetpp

GRID = (2, 3)


def _pq(model, params, ds, classes, cls_emb):
    eng = InferenceEngine(model, params, Bucket(32, 48), num_keyframes=3,
                          chunk=3, amp=False)
    pc = defaultdict(PQStat)
    for i in range(3):
        evaluate_scene(eng, ds[i], classes, cls_emb, "standard_v2", pc)
    return summarize(pc)


def test_overfit_synthetic_scene_improves_pq(tmp_path, rng):
    _make_scannetpp(str(tmp_path), n_scenes=1, n_views=6, hw=(32, 48))
    ds = ScanNetppPanoptic(str(tmp_path), resolution=(48, 32), num_views=3,
                           aug_crop=0)
    classes = sorted(set(ds.classes))
    cls_emb = rng.standard_normal((len(classes), 24)).astype(np.float32)
    cls_emb /= np.linalg.norm(cls_emb, axis=-1, keepdims=True)

    model = PanSt3R(tiny_config())
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 48, 3)),
                        jnp.zeros((1, 3), bool), jnp.asarray(cls_emb), GRID)
    pq_before = _pq(model, params, ds, classes, cls_emb)

    tcfg = TrainConfig(lr=3e-3, accum_iter=1, warmup_epochs=0, epochs=12,
                       batch_size=2, max_instances=8,
                       loss=PanopticLossConfig(num_points=64))
    mesh = build_mesh(MeshSpec(data=1, mem=1))
    tx, _ = build_optimizer(tcfg, 1, steps_per_epoch=3)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, tcfg.loss, GRID, donate=False)

    losses = []
    with mesh:
        for epoch in range(12):
            for it, batch in enumerate(
                    epoch_batches(ds, 2, classes, 8, epoch)):
                batch = jax.tree_util.tree_map(jnp.asarray, batch)
                state, loss, _ = step(state, batch, jnp.asarray(cls_emb),
                                      jax.random.PRNGKey(epoch * 10 + it))
                losses.append(float(loss))

    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    pq_after = _pq(model, state.params, ds, classes, cls_emb)
    assert pq_after["PQ"] > 95.0, (pq_before, pq_after)
