"""Genuine multi-process data-parallel training test.

Spawns two OS processes that each bring up ``jax.distributed.initialize``
against a localhost coordinator (Gloo CPU collectives), feed their OWN
half of every global batch through ``process_local_indices`` +
``shard_host_batch``, and run the real sharded train step.  The resulting
parameters must match a single-process run consuming the same global
index stream — the property the reference cannot test at all (it is
single-GPU, SURVEY.md §2.8) and that converts core/mesh.py's multi-host
seams from unit-faked to integration-proven.

Skipped automatically when the parent session holds a TPU backend
(subprocesses force CPU regardless, but chip boxes have one host core).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from givepose_tpu.data.synthetic import make_synthetic_nocs

WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # drop any inherited distributed config from the parent
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID"):
        env.pop(k, None)
    return env


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("dist")
    data_dir, ivfc_dir = make_synthetic_nocs(str(root), n_images=4, seed=5)
    return data_dir, ivfc_dir


def test_two_process_matches_single_process(fixture, tmp_path):
    data_dir, ivfc_dir = fixture

    # single-process reference: 8 local devices, same global batches
    single_npz = str(tmp_path / "single.npz")
    r = subprocess.run(
        [sys.executable, WORKER, "0", "0", "1", data_dir, ivfc_dir,
         single_npz],
        env=_env(8), capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f"single-proc worker failed:\n{r.stderr[-3000:]}"

    # two processes x 4 local devices = the same 8-device global mesh
    port = _free_port()
    dist_npz = str(tmp_path / "dist.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", data_dir,
             ivfc_dir, dist_npz],
            env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"dist worker failed:\n{out[-3000:]}"

    single = np.load(single_npz)
    dist = np.load(dist_npz)
    assert set(single.files) == set(dist.files)
    np.testing.assert_allclose(single["loss"], dist["loss"], atol=1e-5)
    for k in single.files:
        np.testing.assert_allclose(single[k], dist[k], atol=1e-5,
                                   err_msg=f"params diverged at leaf {k}")
