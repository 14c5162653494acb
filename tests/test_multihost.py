"""Real multi-host execution smoke test (VERDICT r1 item 6 / SURVEY section
2.14): two OS processes under ``jax.distributed`` form a (2 hosts x 4 chips)
CPU mesh and must reproduce the single-process correlator bit-for-bit, plus
exercise 2D-mesh collectives and the per-host shard writer.

The worker (tests/multihost_worker.py) runs in clean subprocesses because
this test process's JAX is already initialized single-controller.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(worker_file: str, n_procs: int, devs_per_proc: int,
                 tmp_path, pass_token: str, timeout: int = 540):
    worker = os.path.join(os.path.dirname(__file__), worker_file)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{devs_per_proc}")
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(n_procs)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    assert pass_token in outs[0], outs[0][-3000:]


def test_two_process_distributed_correlate(tmp_path):
    _run_workers("multihost_worker.py", 2, 4, tmp_path, "MULTIHOST_PASS")


def test_four_process_sgm_dispshard_writes(tmp_path):
    """North-star topology smoke (VERDICT r4 item 6): 4 hosts x 2 chips
    drive hierarchical SGM/MGM + disparity-axis sharding + per-host shard
    writes in one job (tests/multihost_worker4.py)."""
    _run_workers("multihost_worker4.py", 4, 2, tmp_path, "MULTIHOST4_PASS",
                 timeout=900)
