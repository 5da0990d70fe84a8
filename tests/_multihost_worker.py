"""Subprocess body for the 2-process jax.distributed integration test.

Run as:  python tests/_multihost_worker.py <coordinator> <num_procs> <proc_id>

Each process gets 2 virtual CPU devices (4 global).  Exercises the real
multi-host code path the reference never had (SURVEY.md §2 parallelism
inventory): ``initialize_multihost`` -> global ("data",) mesh spanning both
processes -> per-host worker shards assembled into one global array ->
jitted global reduction (a DCN all-reduce on real pods) -> identical global
result on every host.  Prints one JSON line for the parent to verify.
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax
import jax.numpy as jnp


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from etmppo_tpu.parallel.multihost import (
        global_worker_array, initialize_multihost, is_primary_host,
        local_worker_range)
    from etmppo_tpu.parallel.mesh import make_mesh

    initialize_multihost(coordinator_address=coordinator,
                         num_processes=num_processes,
                         process_id=process_id)
    assert jax.process_count() == num_processes
    assert jax.device_count() == 2 * num_processes
    assert len(jax.local_devices()) == 2

    mesh = make_mesh()  # global mesh over all processes' devices
    assert mesh.size == 2 * num_processes

    # Each host feeds its own contiguous worker block: global worker w holds
    # row value w (so the global sum is process-independent and checkable).
    n_workers = 8
    rng_rows = local_worker_range(n_workers)
    local = np.stack([np.full((4,), w, np.float32) for w in rng_rows])
    global_arr = global_worker_array(local, mesh)
    assert global_arr.shape == (n_workers, 4)

    @jax.jit
    def global_stats(x):
        # Global mean/sum require cross-host collectives under GSPMD.
        return jnp.sum(x), jnp.mean(x * x)

    total, mean_sq = global_stats(global_arr)
    expect_total = float(sum(range(n_workers)) * 4)
    expect_mean_sq = float(np.mean(np.arange(n_workers, dtype=np.float32)
                                   [:, None].repeat(4, 1) ** 2))
    print(json.dumps({
        "process": process_id,
        "primary": is_primary_host(),
        "total": float(total),
        "mean_sq": float(mean_sq),
        "ok": (abs(float(total) - expect_total) < 1e-5
               and abs(float(mean_sq) - expect_mean_sq) < 1e-5),
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
