"""Multi-host (DCN) initialization for TPU pod slices.

The reference has no distributed story at all (SURVEY.md §2: the only
parallelism is env worker processes).  Here multi-host training is the same
SPMD program as single-host: call ``initialize_multihost()`` before building
the trainer, size the mesh to ``jax.device_count()`` (global), and keep
``n_workers`` divisible by the global device count — each host feeds the
worker shard that lives on its local devices; gradients and global statistics
ride XLA collectives (ICI within a slice, DCN across hosts).
"""
from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Wraps ``jax.distributed.initialize``; on Cloud TPU the arguments are
    auto-detected from the environment and may be omitted."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def is_primary_host() -> bool:
    return jax.process_index() == 0


def global_worker_array(local_data, mesh) -> jax.Array:
    """Assemble a GLOBAL worker-sharded array from each host's local shard.

    ``local_data`` is this host's slice of the worker-leading axis (numpy or
    device array); the returned global array has leading size
    ``local * num_processes`` and is sharded over the mesh's data axis.  This
    is the multi-host analogue of ``mesh.shard_worker_tree``: on one process
    the two are identical, across processes each host contributes only the
    worker rows its devices own (host-env feeding, SURVEY.md §5 DCN notes).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, local_data)


def local_worker_range(n_workers_global: int) -> range:
    """The contiguous block of global worker indices this host feeds."""
    n_proc = jax.process_count()
    assert n_workers_global % n_proc == 0, (
        f"n_workers={n_workers_global} must be divisible by the number of "
        f"hosts ({n_proc}); otherwise the trailing "
        f"{n_workers_global % n_proc} workers would never be fed and the "
        f"assembled global array would be smaller than n_workers.")
    per = n_workers_global // n_proc
    lo = jax.process_index() * per
    return range(lo, lo + per)
