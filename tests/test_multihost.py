"""Multi-host (multi-process) execution of the data-parallel train step.

The DP equivalence matrix (test_parallel.py) proves sharded == unsharded
on a single-process 8-device virtual mesh. This test exercises the piece
that cannot be validated in-process: the DISTRIBUTED RUNTIME itself —
`parallel.init_distributed` bringing up jax.distributed across two real
OS processes (4 virtual CPU devices each, Gloo collectives), a global
8-device mesh assembled from per-process device sets, cross-process
`device_put` sharding/replication, and one jitted pix2pix train step
whose gradient all-reduce and global-BatchNorm reductions ride
cross-process collectives.

Pass criteria: both processes report identical losses and BN stats, and
they equal the same step computed on THIS process's single-controller
8-device mesh (the conftest virtual mesh) with identical weights/batches
to fp32 tolerance — the multi-host runtime is semantics-preserving.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-2000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out[-2000:]
        outs.append(json.loads(line[-1][len("RESULT "):]))

    # both controllers observed the same training step
    assert outs[0].keys() == outs[1].keys()
    for k in outs[0]:
        assert abs(outs[0][k] - outs[1][k]) < 1e-6, (k, outs)

    # spatial partitioning across process boundaries: conv halos +
    # InstanceNorm all-reduces crossed Gloo and still reproduce the
    # unsharded single-device forward
    assert outs[0]["_spatial_max_delta"] < 1e-5, outs[0]

    # and it matches the single-process 8-device mesh (conftest devices)
    import jax
    from gcc_tpu.config import Config
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    from gcc_tpu.parallel import make_mesh, replicate_state, shard_batch

    cfg = Config(model="pix2pix", ngf=4, ndf=4, num_downs=5, crop_size=32,
                 no_dropout=True, gan_mode="hinge")
    eng = Pix2PixEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=32)
    mesh = make_mesh(8)
    state = replicate_state(state, mesh)
    rng = np.random.RandomState(7)
    batch = {"A": (rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1),
             "B": (rng.rand(8, 32, 32, 3).astype(np.float32) * 2 - 1)}
    state, losses = eng.train_step(state, shard_batch(batch, mesh), 2e-4)
    for k, v in losses.items():
        assert abs(outs[0][k] - float(v)) < 1e-5, \
            f"{k}: multihost {outs[0][k]} vs single-process {float(v)}"
    bs = state.nets["d"].get("batch_stats", {})
    if bs and "_bn_leaf_sum" in outs[0]:
        leaf = jax.tree_util.tree_leaves(bs)[0]
        assert abs(outs[0]["_bn_leaf_sum"]
                   - float(np.sum(np.asarray(leaf)))) < 1e-5
