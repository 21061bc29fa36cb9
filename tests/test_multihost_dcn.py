"""Two-process DCN smoke test: jax.distributed on localhost (CPU).

Each process contributes its CPU devices to one global mesh and runs a
data-parallel BPR step; process 0 checks the loss is finite and both
processes agree. Runs in the default suite (~30s, 2 subprocesses on a
dynamically allocated port); skipped only if no localhost port can be
bound.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    try:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]
    except OSError:
        return None


WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4          # 2 local x 2 processes

import numpy as np
import jax.numpy as jnp
from openrec_tpu.models import BPR
from openrec_tpu.parallel import (batch_sharding, make_mesh,
                                  make_parallel_train_step)
from openrec_tpu.training.optim import lazy_adam
from jax.experimental import multihost_utils

mesh = make_mesh(data=4, model=1)
model = BPR(total_users=16, total_items=32, dim_user_embed=4,
            dim_item_embed=4, l2_weight=0.0)
step_fn, init_fn = make_parallel_train_step(model, lazy_adam(0.01), mesh,
                                            rules=())
params, opt_state, _ = init_fn(jax.random.PRNGKey(0))

rng = np.random.default_rng(0)   # same seed on both hosts → same batch
host_batch = {
    "user_id": rng.integers(0, 16, 16).astype(np.int32),
    "p_item_id": rng.integers(0, 32, 16).astype(np.int32),
    "n_item_id": rng.integers(0, 32, 16).astype(np.int32),
}
batch = {k: multihost_utils.host_local_array_to_global_array(
             v.reshape(2, -1)[pid], mesh, jax.sharding.PartitionSpec("data"))
         for k, v in host_batch.items()}
params, opt_state, loss, _ = step_fn(params, opt_state, batch,
                                     jax.random.PRNGKey(1))
loss_val = float(np.asarray(loss.addressable_shards[0].data))
assert np.isfinite(loss_val), loss_val
print(f"proc {pid} loss {loss_val:.6f}", flush=True)
jax.distributed.shutdown()
"""


def test_two_process_dcn(tmp_path):
    port = _free_port()
    if port is None:
        pytest.skip("no localhost port available")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # avoid the axon sitecustomize
    env["PYTHONPATH"] = os.getcwd()
    procs = [subprocess.Popen(
                [sys.executable, "-c", WORKER, str(pid), str(port)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, env=env)
             for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "loss" in out
    # both processes computed the same global loss
    l0 = [ln for ln in outs[0].splitlines() if "loss" in ln][-1].split()[-1]
    l1 = [ln for ln in outs[1].splitlines() if "loss" in ln][-1].split()[-1]
    assert l0 == l1, (l0, l1)
