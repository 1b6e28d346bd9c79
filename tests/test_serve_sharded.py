"""Multi-chip serving: the serve wire path under a (data, mem, model)
mesh — TP-sharded weights and data-parallel scene batches both produce
the single-device wire (GSPMD partitions the one-program pipeline)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from panst3r_tpu.core.mesh import DATA_AXIS, MeshSpec, build_mesh
from panst3r_tpu.core.tp import apply_tp
from tests.test_serve import _engine, _scene, H, W, V


def test_serve_tensor_parallel_matches_single(rng):
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)
    ref = np.asarray(eng.serve_device(images, portrait, cls_emb))
    dec_ref = eng.unpack_wire(ref, V)

    mesh = build_mesh(MeshSpec(data=2, mem=1, model=4))
    tp_eng = _engine(rng)
    tp_eng.params = eng.params          # same weights
    with mesh:
        tp_eng.params = apply_tp(eng.params, mesh)
        wire = np.asarray(tp_eng.serve_device(images, portrait, cls_emb))
    dec = tp_eng.unpack_wire(wire, V)

    # f32 reductions reassociate across shards — compare decoded outputs.
    agree = (dec["pan"] == dec_ref["pan"]).mean()
    assert agree > 0.99, agree
    np.testing.assert_allclose(dec["conf"], dec_ref["conf"], atol=0.05)


def test_serve_many_data_parallel_matches_single(rng):
    eng = _engine(rng)
    images, portrait, cls_emb = _scene(rng)
    scenes = np.stack([images, images[::-1].copy()])
    ports = np.zeros((2, V), bool)

    ref = np.asarray(eng.serve_many_device(scenes, ports, cls_emb))

    mesh = build_mesh(MeshSpec(data=2, mem=1, model=1))
    with mesh:
        sharded = jax.device_put(
            jnp.asarray(scenes), NamedSharding(mesh, P(DATA_AXIS)))
        wires = np.asarray(eng.serve_many_device(sharded, ports, cls_emb))
    np.testing.assert_array_equal(wires, ref)
