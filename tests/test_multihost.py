"""Real 2-process ``jax.distributed`` integration test (no cluster needed).

The reference has zero multi-node anything (SURVEY.md §2: communication
backend "None").  Our multi-host layer must actually initialize, form a
global mesh across processes, and agree on globally-reduced values — this
spawns two OS processes on the CPU backend (2 virtual devices each) and
checks exactly that via tests/_multihost_worker.py.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_mesh():
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # Drop any sitecustomize that eagerly initializes a remote TPU backend
    # (that would beat jax.distributed.initialize to backend creation).
    env["PYTHONPATH"] = ROOT
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=ROOT)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_proc = {o["process"]: o for o in outs}
    assert set(by_proc) == {0, 1}
    assert by_proc[0]["primary"] and not by_proc[1]["primary"]
    for o in outs:
        assert o["ok"], o
    # every host sees the same globally-reduced values
    assert by_proc[0]["total"] == by_proc[1]["total"]
    assert by_proc[0]["mean_sq"] == by_proc[1]["mean_sq"]


def test_local_worker_range_divisibility_assert():
    """Non-divisible n_workers must fail loudly, not silently starve workers
    (single-process: process_count() == 1 accepts everything; the assert
    message itself is what we pin here)."""
    from etmppo_tpu.parallel.multihost import local_worker_range
    r = local_worker_range(16)
    assert list(r) == list(range(16))
