"""True multi-process distributed-BA test: two OS processes, each owning one
CPU device, joined via jax.distributed — the closest single-machine analogue
of a 2-host pod run (SURVEY.md section 4's multi-host test strategy).

Each process runs the SAME distributed_bundle_adjust over the global 2-device
mesh; process 0 writes its result, and the test compares it against the
single-process solver.
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
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

sys.path.insert(0, sys.argv[4])
from rso.ba import BAProblem, distributed_bundle_adjust
from rso.ba.ba import _project_grid
from rso.ba.multihost import global_landmark_mesh
from rso.geometry.stereo_camera import StereoCamera

assert jax.process_count() == 2
assert len(jax.devices()) == 2  # global devices across both processes

CAM = StereoCamera.make(fx_l=500.0, fy_l=500.0, cx_l=320.0, cy_l=240.0,
                        baseline=0.5)
rng = np.random.default_rng(7)
P, L = 4, 64
true_poses = []
for p in range(P):
    T_wc = np.array([0.01 * p, -0.005 * p, 0.4 * p])
    w = np.array([0.0, 0.002 * p, 0.0])
    R = Rotation.from_rotvec(w).as_matrix()
    Rwc = R.T
    t = -Rwc @ T_wc
    true_poses.append(np.concatenate([Rotation.from_matrix(Rwc).as_rotvec(), t]))
true_poses = jnp.asarray(np.stack(true_poses), jnp.float32)
lmks_true = jnp.asarray(np.stack([
    rng.uniform(-8, 8, L), rng.uniform(-4, 4, L), rng.uniform(5, 30, L)], -1),
    jnp.float32)
pix, _, _ = _project_grid(CAM, true_poses, lmks_true)
obs = pix + jnp.asarray(rng.normal(0, 0.2, pix.shape), jnp.float32)
prob = BAProblem(
    poses=(true_poses + 0.01).at[0].set(true_poses[0]),
    lmks=lmks_true + 0.05,
    obs=obs,
    mask=jnp.ones((P, L), bool),
)
mesh = global_landmark_mesh()
assert mesh.devices.size == 2
res = distributed_bundle_adjust(CAM, prob, mesh, max_iters=10)
# out_specs are fully replicated, so every process holds the whole answer
poses = np.asarray(jax.device_get(res.poses))
if jax.process_index() == 0:
    with open(sys.argv[3], "w") as f:
        json.dump({"poses": poses.tolist()}, f)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    out_json = tmp_path / "out.json"

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), addr, str(pid), str(out_json),
             repo],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    assert out_json.exists()

    dist_poses = np.asarray(json.loads(out_json.read_text())["poses"])

    # single-process reference
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from rso.ba import BAProblem, bundle_adjust
    from rso.ba.ba import _project_grid
    from rso.geometry.stereo_camera import StereoCamera

    CAM = StereoCamera.make(fx_l=500.0, fy_l=500.0, cx_l=320.0, cy_l=240.0,
                            baseline=0.5)
    rng = np.random.default_rng(7)
    P, L = 4, 64
    true_poses = []
    for p in range(P):
        T_wc = np.array([0.01 * p, -0.005 * p, 0.4 * p])
        w = np.array([0.0, 0.002 * p, 0.0])
        R = Rotation.from_rotvec(w).as_matrix()
        Rwc = R.T
        t = -Rwc @ T_wc
        true_poses.append(
            np.concatenate([Rotation.from_matrix(Rwc).as_rotvec(), t]))
    true_poses = jnp.asarray(np.stack(true_poses), jnp.float32)
    lmks_true = jnp.asarray(np.stack([
        rng.uniform(-8, 8, L), rng.uniform(-4, 4, L),
        rng.uniform(5, 30, L)], -1), jnp.float32)
    pix, _, _ = _project_grid(CAM, true_poses, lmks_true)
    obs = pix + jnp.asarray(rng.normal(0, 0.2, pix.shape), jnp.float32)
    prob = BAProblem(
        poses=(true_poses + 0.01).at[0].set(true_poses[0]),
        lmks=lmks_true + 0.05,
        obs=obs,
        mask=jnp.ones((P, L), bool),
    )
    ref = bundle_adjust(CAM, prob, max_iters=10)
    np.testing.assert_allclose(dist_poses, np.asarray(ref.poses), atol=1e-3)
