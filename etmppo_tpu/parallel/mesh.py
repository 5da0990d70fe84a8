"""Device-mesh data parallelism (no reference equivalent — the reference is
strictly single-device, train.py:26-31; SURVEY.md §2 parallelism inventory).

Strategy: GSPMD auto-partitioning over a 1-D ``("data",)`` mesh.

* Rollout: every worker-leading array (env states, obs, episodic memory,
  rollout outputs) is sharded over ``data``; params are replicated.  The
  vmapped env step and the batched model forward partition cleanly along the
  worker axis with zero communication.
* Update: the flat sample axis stays sharded; global advantage-normalization
  means/stds and loss means become XLA ``all-reduce``s over ICI, and the global
  shuffle (reference: buffer.py:80) becomes an all-to-all gather — semantics
  are bit-identical to the single-device program, not a per-shard
  approximation.
* Gradients are averaged implicitly by the same mechanism (the loss mean is
  global), so the optimizer step is replicated-consistent.

Multi-host (DCN) extension: call ``jax.distributed.initialize()`` before
``make_mesh`` and the same code spans pod slices; each host feeds its local
shard of workers.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if num_devices > len(devices):
        raise ValueError(
            f"requested {num_devices} devices, only {len(devices)} available")
    return Mesh(np.array(devices[:num_devices]), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (worker / sample) axis over the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_worker_tree(tree: Any, mesh: Mesh, n_workers: int) -> Any:
    """Places a pytree onto the mesh: leaves with a leading axis of size
    ``n_workers`` are sharded over ``data``; everything else (RNG keys,
    counters) is replicated."""
    data = data_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        is_worker_leading = getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_workers
        return jax.device_put(x, data if is_worker_leading else rep)

    return jax.tree.map(place, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
