"""Functional environment protocol (TPU-native replacement for worker.py).

The reference runs one OS process per environment with blocking pipe RPC
(worker.py:36-48; trainer.py:189-194).  Here environments are pure functions of
(state, action, key) so N of them become *data*: ``jax.vmap`` vectorizes across
workers and the whole rollout compiles into a single ``lax.scan`` — the process
boundary disappears entirely.

Protocol (duck-typed like the reference's env protocol, README.md:216, but
functional):

* ``observation_shape`` — tuple; images are NHWC (TPU layout).
* ``action_branches``  — tuple of per-branch arities (multi-discrete).
* ``max_episode_steps`` — static int.
* ``info_keys``        — static tuple of per-episode scalar statistic names
  reported when an episode completes (e.g. ``("reward", "length", "success")``,
  mirroring the reference's info dicts).
* ``reset(key) -> (state, obs)``
* ``step(state, action, key) -> (state, obs, reward, done, info)`` where
  ``info`` is a dict of scalars (meaningful only when ``done``), and the
  returned reward is the *scaled* training reward while ``info["reward"]`` is
  the raw episode return (matching e.g. cartpole_env.py:36's /100 scaling).

Auto-reset composition lives in the rollout (training/rollout.py), matching the
reference's immediate-reset-on-done worker loop (trainer.py:195-213).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax


class JaxEnv:
    """Base class documenting the functional env interface."""

    observation_shape: Tuple[int, ...]
    action_branches: Tuple[int, ...]
    max_episode_steps: int
    info_keys: Tuple[str, ...]

    def reset(self, key: jax.Array):
        raise NotImplementedError

    def step(self, state: Any, action: jax.Array, key: jax.Array):
        raise NotImplementedError
