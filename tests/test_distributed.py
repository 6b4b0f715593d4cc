"""Two-process jax.distributed test (CPU, one device each).

Closes r4 review missing-item #5: parallel/runtime.py's bootstrap, the
global (hosts x chips) mesh, and cross-process sharding semantics are
exercised by REAL multi-controller processes, not just one process with
8 virtual devices.  Each worker proves its addressable half of a
4-voter batch through the fused sharded prover and verifies its own
proofs against the dev verification key.
"""
import json
import os
import pathlib
import socket
import subprocess
import sys

import pytest

HERE = pathlib.Path(__file__).resolve().parent


def _worker_env():
    """Env for a worker process, set BEFORE the interpreter starts: the
    image's sitecustomize imports jax at startup, so platform/device
    flags must come from the environment, not the worker's own code."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)      # no TPU backend
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1"
                        + " --xla_cpu_multi_thread_eigen=false")
    # this box has 2 cores: without thread caps the 8 virtual devices'
    # pools starve the coordination-service thread and Gloo context
    # init times out (30 s) during execution
    env["OMP_NUM_THREADS"] = "1"
    env["OPENBLAS_NUM_THREADS"] = "1"
    env["JAX_COMPILATION_CACHE_DIR"] = str(HERE.parent / ".jax_cache")
    env["PYTHONPATH"] = str(HERE.parent) + os.pathsep + \
        env.get("PYTHONPATH", "")
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_prove(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(HERE / "distributed_worker.py"),
             str(port), str(pid), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_worker_env()))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    results = [json.load(open(o)) for o in outs]
    results.sort(key=lambda r: r["process"])
    # both processes verified their own half of the batch
    assert [r["n_local"] for r in results] == [2, 2]
    assert results[0]["first_voter"] == 0
    assert results[1]["first_voter"] == 2
    assert all(all(r["verified"]) for r in results), results
    assert all(r["psum_ok"] for r in results), results
