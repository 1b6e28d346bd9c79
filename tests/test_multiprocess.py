"""Multi-host correctness rehearsal: 2-process CPU cluster.

Replaces the reference's untested torchrun/NCCL path
(/root/reference/train.py:132, README.md:184-190) with a real 2-process
`jax.distributed` run on CPU: each process holds its rank's slice of the
global batch (data/loader.py rank sharding), `shard_batch` assembles the
global array from process-local shards, and the jitted global-batch loss
must equal the single-process result bit-for-bit on BOTH processes (the
GSPMD design makes the logged loss globally consistent by construction —
no all_reduce_mean needed).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from panst3r_tpu.engine.train import shard_batch

assert jax.process_count() == nproc
assert len(jax.devices()) == 2 * nproc        # 2 local CPU devices each

mesh = Mesh(np.array(jax.devices()), ("data",))

# Global batch = concat of per-process slices (loader rank sharding).
full = (np.arange(8 * 6, dtype=np.float32).reshape(8, 6) / 10.0)
labels = (np.arange(8) % 3).astype(np.int32)
local = {"x": full[pid * 4:(pid + 1) * 4],
         "y": labels[pid * 4:(pid + 1) * 4]}

w = np.linspace(-1, 1, 6 * 3, dtype=np.float32).reshape(6, 3)

@jax.jit
def loss_fn(w, batch):
    logits = batch["x"] @ w
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, batch["y"][:, None], -1)
    return nll.mean()

with mesh:
    batch = shard_batch(local, mesh)
    loss = float(loss_fn(jnp.asarray(w), batch))

with open(os.path.join(outdir, f"rank{pid}.json"), "w") as f:
    json.dump({"loss": loss, "nproc": jax.process_count()}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_loss_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo}
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port),
         str(tmp_path)],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    r0 = json.loads((tmp_path / "rank0.json").read_text())
    r1 = json.loads((tmp_path / "rank1.json").read_text())
    assert r0["nproc"] == 2

    # single-process ground truth on the full global batch
    full = (np.arange(8 * 6, dtype=np.float32).reshape(8, 6) / 10.0)
    labels = (np.arange(8) % 3)
    w = np.linspace(-1, 1, 6 * 3, dtype=np.float32).reshape(6, 3)
    logits = full @ w
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    expected = float(-logp[np.arange(8), labels].mean())

    # both ranks log the SAME global loss, equal to single-process
    assert abs(r0["loss"] - r1["loss"]) < 1e-7, (r0, r1)
    np.testing.assert_allclose(r0["loss"], expected, rtol=1e-5)
