"""Two-process jax.distributed test (SURVEY §2.12 multi-host backend).

Real multi-host hardware is unavailable here, but jax.distributed itself is
exercised for real: two OS processes, each with its own CPU backend, form a
cluster over a local coordinator (the same code path a 2-host DCN cluster
takes), run `init_distributed()` + `global_mesh()`, execute a psum-style
global reduction over a 4-device global mesh (2 devices per process), and a
sharded computation whose result every process must agree on.
"""
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from touchgs_tpu.parallel.distributed import (
    global_mesh, init_distributed, local_batch_slice)

is_multi = init_distributed()
assert is_multi, "init_distributed did not go multi-process"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = global_mesh(model=2)
assert dict(mesh.shape) == {"data": 2, "model": 2}, mesh.shape

# global array sharded over all 4 devices across the 2 processes: each
# process contributes its addressable shards; value = global row index
sharding = NamedSharding(mesh, P(("data", "model")))
gshape = (8, 4)

def cb(index):
    row0 = index[0].start or 0
    n = (index[0].stop or gshape[0]) - row0
    return np.tile(np.arange(row0, row0 + n, dtype=np.float32)[:, None],
                   (1, gshape[1]))

arr = jax.make_array_from_callback(gshape, sharding, cb)

@jax.jit
def total(a):
    return jnp.sum(a)

t = float(total(arr))          # cross-process reduction
expect = float(np.arange(8).sum() * 4)
assert t == expect, (t, expect)

sl = local_batch_slice(10)
assert len(sl) == 5            # this process owns half the global batch

# --- the real thing: one SHARDED TRAIN STEP over the 2-process mesh -------
from touchgs_tpu.config import (DensifyConfig, DepthLossConfig, ModelConfig,
                                OptimConfig, RasterizeConfig, TrainConfig)
from touchgs_tpu.data.cameras import Camera
from touchgs_tpu.models.densify import DensifyState
from touchgs_tpu.models.gaussians import init_random
from touchgs_tpu.parallel.mesh import state_shardings
from touchgs_tpu.parallel.sharded import make_sharded_train_step
from touchgs_tpu.train.optim import make_optimizer
from touchgs_tpu.train.trainer import TrainState, _diff_params

W = H = 64
CAP = 512
cfg = TrainConfig(
    model=ModelConfig(max_gaussians=CAP, sh_degree=1,
                      rasterize=RasterizeConfig(gaussian_chunk=128,
                                                use_pallas=True)),
    depth=DepthLossConfig(), densify=DensifyConfig(), optim=OptimConfig())
params = init_random(n=256, capacity=CAP, sh_degree=1)
opt = make_optimizer(cfg.optim)
state = TrainState(params=params, opt_state=opt.init(_diff_params(params)),
                   densify=DensifyState.zeros(CAP), step=jnp.int32(0))
# every process holds the same full host copy; scatter to the global mesh
state = jax.tree.map(
    lambda leaf, sh: jax.make_array_from_process_local_data(
        sh, np.asarray(leaf)),
    state, state_shardings(mesh, state))

cam = Camera(fx=jnp.float32(50.), fy=jnp.float32(50.),
             cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
             c2w=jnp.asarray([[1., 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.5],
                              [0, 0, 0, 1]], jnp.float32),
             width=W, height=H)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
dep = jnp.asarray(rng.uniform(1, 3, (H, W)), jnp.float32)
unc = jnp.ones((H, W), jnp.float32)

step = make_sharded_train_step(cfg, mesh, opt)

# collective census of the compiled cross-process step (recorded in
# SCALING_r05.md): the per-Gaussian grad reduction must compile to
# reduce-scatter, not a plain all-reduce
hlo = step.lower(state, cam, img, dep, unc, jnp.int32(1)).compile().as_text()
census = {name: hlo.count(name + "(")
          for name in ("reduce-scatter", "all-gather", "all-reduce",
                       "collective-permute")}
assert census["reduce-scatter"] >= 1, census

# MULTIPLE steps across the cluster, loss finite at every one
from jax.experimental import multihost_utils
losses = []
for _ in range(3):
    state, metrics = step(state, cam, img, dep, unc, jnp.int32(1))
    losses.append(float(multihost_utils.process_allgather(
        metrics["loss"], tiled=True).ravel()[0]))
assert all(np.isfinite(l) for l in losses), losses
loss = losses[-1]

# checkpoint save/restore ROUND-TRIP under the sharded state: orbax
# coordinates the multiprocess write (every process saves its shards);
# restore into the live sharded template must reproduce every leaf
import orbax.checkpoint as ocp
ckpt_dir = os.environ["TGS_CKPT_DIR"]
mgr = ocp.CheckpointManager(ckpt_dir)
mgr.save(3, args=ocp.args.StandardSave(state))
mgr.wait_until_finished()
template = jax.tree.map(jnp.zeros_like, state)
restored = mgr.restore(3, args=ocp.args.StandardRestore(template))
mgr.close()
for got, want in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
    np.testing.assert_array_equal(
        np.asarray(multihost_utils.process_allgather(got, tiled=True)),
        np.asarray(multihost_utils.process_allgather(want, tiled=True)))
# and the restored state trains on
state2, metrics2 = step(restored, cam, img, dep, unc, jnp.int32(1))
loss2 = float(multihost_utils.process_allgather(
    metrics2["loss"], tiled=True).ravel()[0])
assert np.isfinite(loss2), loss2

print(f"OK pid={jax.process_index()} total={t} slice={list(sl)} "
      f"losses={['%%.4f' %% l for l in losses]} resumed_loss={loss2:.4f} "
      f"census={census}", flush=True)
""" % {"repo": _REPO}


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_reduces_globally(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   NUM_PROCESSES="2", PROCESS_ID=str(pid),
                   JAX_PLATFORMS="cpu",
                   TGS_CKPT_DIR=str(tmp_path / "ckpt"))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process cluster deadlocked")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-2000:]}"
        assert "OK pid=" in out, out
