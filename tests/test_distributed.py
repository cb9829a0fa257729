"""Two-process jax.distributed test (new capability; SURVEY §2 parallel
inventory).  Spawns 2 CPU processes with 4 virtual devices each — a
2-host × 4-chip world — and runs tests/_dist_worker.py in both:
host×chip mesh construction, the two-level (intra-host then cross-host)
psum, one walker-sharded VMC step with cross-process pmean'd gradients,
and the host-0-writes multihost checkpoint."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]



def test_two_process_distributed(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # clean CPU interpreters: drop the axon platform gate so the
    # sitecustomize does not register the TPU backend, and force 4
    # virtual CPU devices per process
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    worker = str(REPO / "tests" / "_dist_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"

    results = []
    for i in range(2):
        with open(tmp_path / f"ok_{i}.json") as f:
            results.append(json.load(f))
    # pmean'd loss must agree exactly across hosts (replicated output)
    assert results[0]["loss"] == results[1]["loss"], results
    assert results[0]["psum"] == results[1]["psum"], results
    # host 0 wrote the checkpoint; exactly one file
    assert (tmp_path / "multihost_ckpt").exists()


def test_four_process_mcmc_spring_resume(tmp_path):
    """4 processes x 2 devices each (VERDICT r3 item 8): the sharded
    Metropolis window driven by the SPRING train step — the newest sharded
    paths — across a real multi-process world, with BITWISE-stable resume:
    phase 'full' runs window A, checkpoints shard-locally, runs window B;
    phase 'resume' restarts all four processes, loads the checkpoint, and
    reruns window B.  Losses, parameters, walker positions, and the
    collective step size must match byte-for-byte."""
    import numpy as np

    n_proc = 4
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    worker = str(REPO / "tests" / "_dist_worker_mcmc.py")

    for phase in ("full", "resume"):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), str(n_proc), str(port),
                 str(tmp_path), phase],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True)
            for i in range(n_proc)
        ]
        outs = [p.communicate(timeout=540)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"{phase} proc {i} failed:\n{out}"

    for i in range(n_proc):
        a = np.load(tmp_path / f"out_full_{i}.npz")
        b = np.load(tmp_path / f"out_resume_{i}.npz")
        for k in ("losses", "flat_params", "step_size", "positions"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"proc {i} {k}")
        with open(tmp_path / f"ok_resume_{i}.json") as f:
            assert json.load(f)["skipped"] == 0


def test_two_process_trainer_hosts(tmp_path):
    """The production VMCTrainer's multi-host path (VERDICT r4 item 5):
    2 processes x 2 devices, data_parallel='hosts' (2-D host×chip mesh,
    walkers sharded over both axes), Metropolis sampler, driven through
    train -> checkpoint -> resume BY THE TRAINER ITSELF.  Window B after
    resume must match window B of the uninterrupted run byte-for-byte."""
    import numpy as np

    n_proc = 2
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    worker = str(REPO / "tests" / "_dist_worker_trainer.py")

    for phase in ("full", "resume"):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), str(n_proc), str(port),
                 str(tmp_path), phase],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True)
            for i in range(n_proc)
        ]
        outs = [p.communicate(timeout=540)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"{phase} proc {i} failed:\n{out}"

    for i in range(n_proc):
        a = np.load(tmp_path / f"tr_full_{i}.npz")
        b = np.load(tmp_path / f"tr_resume_{i}.npz")
        for k in ("losses", "flat_params", "step_size", "positions"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"proc {i} {k}")
