"""One real training step of the flagship model on the TPU (timing + NaN
check).  Validates the full train graph (forward + matcher + PointRend
losses + backward + AdamW) compiles and runs at realistic shapes."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from panst3r_tpu.engine.criterion import PanopticLossConfig, Targets
    from panst3r_tpu.engine.train import (TrainConfig, TrainState,
                                          build_optimizer,
                                          cast_frozen_params,
                                          make_train_step, trainable_mask)
    from panst3r_tpu.models.panst3r import PanSt3R
    from panst3r_tpu.models.presets import panst3r_v1_config

    H, W = int(os.environ.get("TSB_H", "256")), 512
    B = int(os.environ.get("TSB_B", "1"))
    V = int(os.environ.get("TSB_V", "3"))
    T = int(os.environ.get("TSB_T", "16"))
    NCLS = 32
    GRID = (H // 16, W // 16)
    NPTS = int(os.environ.get("TSB_PTS", "2048"))

    model = PanSt3R(panst3r_v1_config())
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.standard_normal((B, V, H, W, 3)) * 0.3,
                              jnp.float32),
        "portrait": jnp.zeros((B, V), bool),
        "targets": Targets(
            labels=jnp.asarray(rng.integers(0, NCLS, (B, T)), jnp.int32),
            masks=jnp.asarray((rng.random((B, T, V, H, W)) < 0.2),
                              jnp.float32),
            valid=jnp.asarray(
                np.arange(T)[None] < 6).astype(bool).repeat(B, 0),
            output_mask=jnp.ones((B, NCLS), bool)),
    }
    cls_emb = jnp.asarray(rng.standard_normal((NCLS, 768)), jnp.float32)

    t0 = time.perf_counter()
    params = jax.jit(model.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), batch["images"][:, :2], batch["portrait"][:, :2],
        cls_emb, GRID)
    jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.1f}s")

    params = cast_frozen_params(params)
    # TSB_SAMPLING=random: reference point-sampling semantics for both the
    # matcher and the mask loss (the PQ-parity acceptance recipe,
    # VERDICT r2 #3c) instead of the grid-quadrature default.
    sampling = os.environ.get("TSB_SAMPLING", "grid")
    # TSB_AMP=bf16: the torch-autocast analog (reference train.py:37-40;
    # base.yaml:76 ships amp: false, so the default here is off too).
    amp = os.environ.get("TSB_AMP") or None
    tcfg = TrainConfig(lr=1e-4, accum_iter=1, amp=amp,
                       loss=PanopticLossConfig(
                           num_points=NPTS,
                           matcher_sampling=sampling,
                           loss_sampling=sampling))
    print(f"sampling={sampling}  bucket={H}x{W}  amp={amp}")
    tx, _ = build_optimizer(tcfg, 1, steps_per_epoch=100,
                            trainable_mask=trainable_mask(params))
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, tcfg.loss, GRID, donate=False,
                           amp=amp, train_mask=trainable_mask(params))

    t0 = time.perf_counter()
    state, loss, details = step(state, batch, cls_emb, jax.random.PRNGKey(0))
    print(f"first step (compile+run): {time.perf_counter() - t0:.1f}s "
          f"loss={float(loss):.3f}")
    times = []
    for i in range(int(os.environ.get("TSB_STEPS", "5"))):
        t0 = time.perf_counter()
        state, loss, _ = step(state, batch, cls_emb, jax.random.PRNGKey(i))
        loss_v = float(loss)
        times.append(time.perf_counter() - t0)
        print(f"step {i}: {times[-1]:.3f}s loss={loss_v:.3f}")
        assert np.isfinite(loss_v)

    # TSB_PROFILE=<dir>: capture an xplane trace of 2 steady steps
    # (summarize with tools/xplane_summary.py).
    prof_dir = os.environ.get("TSB_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            for i in range(2):
                state, loss, _ = step(state, batch, cls_emb,
                                      jax.random.PRNGKey(100 + i))
            jax.block_until_ready(loss)
        print(f"trace written to {prof_dir}")

    # Pipelined stepping (train_one_epoch sync_every > 1): dispatch N
    # steps back-to-back, one sync at the end — the steady-state training
    # number without the per-step loss-fetch round-trip (33 ms/step on
    # the tunneled link here).
    npipe = int(os.environ.get("TSB_PIPELINE", "10"))
    t0 = time.perf_counter()
    pend = []
    for i in range(npipe):
        state, loss, _ = step(state, batch, cls_emb,
                              jax.random.PRNGKey(1000 + i))
        pend.append(loss)
    vals = [float(l) for l in pend]
    pipe_s = (time.perf_counter() - t0) / npipe
    assert all(np.isfinite(v) for v in vals)
    print(f"pipelined ({npipe} steps, one sync): {pipe_s:.3f}s/step")

    # TSB_BREAKDOWN=1: attribute the step by timing jitted sub-graphs
    # (VERDICT r4 #3 — the xplane splits towers out but leaves panoptic
    # fwd+bwd+matcher+loss+AdamW as one residual).  Components:
    # fwd_model (towers + panoptic fwd), criterion (matcher + PointRend
    # losses on precomputed head outputs), fwd+loss (one graph),
    # fwd+loss+bwd (value_and_grad, no optimizer); then
    # bwd = t_grad - t_fwdloss and in-step optimizer = t_step - t_grad.
    if os.environ.get("TSB_BREAKDOWN") == "1":
        from panst3r_tpu.engine.criterion import panoptic_loss

        def timeit(fn, *args, n=6):
            # rebind per iteration so only one output pytree is ever
            # referenced — a list of n step-size outputs OOMs HBM
            out = None
            for _ in range(2):
                out = fn(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            jax.block_until_ready(out)
            return (time.perf_counter() - t0) / n

        @jax.jit
        def f_model(p, batch, cls_emb):
            panout, _ = model.apply(p, batch["images"], batch["portrait"],
                                    cls_emb, GRID)
            return panout

        @jax.jit
        def f_fwdloss(p, batch, cls_emb, key):
            panout, _ = model.apply(p, batch["images"], batch["portrait"],
                                    cls_emb, GRID)
            return panoptic_loss(key, panout, batch["targets"],
                                 tcfg.loss)[0]

        @jax.jit
        def f_crit(key, panout):
            return panoptic_loss(key, panout, batch["targets"],
                                 tcfg.loss)[0]

        # Sequence the timings with explicit frees — panout (with aux
        # outputs), a full-params grads pytree and a step's output state
        # alive TOGETHER exhaust the 16 GB HBM at the 256 bucket.
        # value_and_grad WITHOUT the optimizer: bwd = t_grad - t_fwdloss,
        # in-step optimizer = t_step - t_grad.  (A standalone optimizer
        # timing is NOT comparable: its zero grads arrive as runtime
        # arguments, so the global-norm clip reads the full 3.5 GB tree
        # that the fused step constant-folds away.)
        mask2 = trainable_mask(state.params)

        @jax.jit
        def f_grad(p, batch, cls_emb, key):
            def lf(diff):
                merged = jax.tree_util.tree_map(
                    lambda m, t, f: t if m else f, mask2, diff, p)
                panout, _ = model.apply(merged, batch["images"],
                                        batch["portrait"], cls_emb, GRID)
                return panoptic_loss(key, panout, batch["targets"],
                                     tcfg.loss)[0]
            return jax.value_and_grad(lf)(p)[0]

        key0 = jax.random.PRNGKey(7)
        panout_dev = f_model(state.params, batch, cls_emb)
        t_crit = timeit(f_crit, key0, panout_dev)
        del panout_dev
        t_model = timeit(f_model, state.params, batch, cls_emb)
        t_fwdloss = timeit(f_fwdloss, state.params, batch, cls_emb, key0)
        t_grad = timeit(f_grad, state.params, batch, cls_emb, key0, n=3)
        t_step = timeit(lambda: step(state, batch, cls_emb, key0)[1], n=3)
        print(f"breakdown (s, pipelined): fwd_model={t_model:.4f}  "
              f"criterion={t_crit:.4f}  fwd+loss={t_fwdloss:.4f}  "
              f"fwd+loss+bwd={t_grad:.4f}  full_step={t_step:.4f}  "
              f"bwd~={t_grad - t_fwdloss:.4f}  "
              f"opt~={t_step - t_grad:.4f}")

    # MFU by the jaxpr matmul/conv counter (scan-aware; XLA's HLO cost
    # model undercounts while-bodies ~6x — PERFORMANCE.md round 2).
    from panst3r_tpu.ops.flops import fn_matmul_flops
    tf_step = fn_matmul_flops(step, state, batch, cls_emb,
                              jax.random.PRNGKey(0))
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    best = min(times)
    print(f"train step ok: {best:.3f}s/step best (per-step sync)  "
          f"pipelined {pipe_s:.3f}s/step  {tf_step / 1e12:.2f} TF/step  "
          f"MFU {100 * tf_step / best / peak:.1f}% synced / "
          f"{100 * tf_step / pipe_s / peak:.1f}% pipelined")


if __name__ == "__main__":
    main()
