"""Checkpoint / resume (TPU-native upgrade over the reference).

The reference saves only the final model: ``pickle.dump((state_dict, config))``
(trainer.py:356-362) and has **no resume path**.  Here:

* ``save_model`` / ``load_model`` — final inference artifact: Flax params
  (msgpack bytes) + the full config dict, consumed by enjoy.py.  Same
  "config travels with the weights" contract as the reference (enjoy.py:48-54).
* ``Checkpointer`` — periodic full training-state checkpoints via Orbax
  (params, optimizer state, rollout/env/memory state, RNG, update counter)
  enabling exact resume (SURVEY.md §5 "Checkpoint / resume").
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

from ..config import TrainConfig, config_from_dict, config_to_dict


def save_model(path: str, params: Any, config: TrainConfig) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "params_bytes": serialization.to_bytes(params),
        "config": config_to_dict(config),
        "format": "etmppo_tpu/flax-msgpack/v1",
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def read_model_config(path: str) -> TrainConfig:
    """Reads only the travelling config from a saved model artifact (lets a
    consumer build env/model/params-template once and then call ``load_model``
    with the template, instead of load_model reconstructing them itself)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return config_from_dict(payload["config"])


def load_model(path: str, params_template: Optional[Any] = None
               ) -> Tuple[Any, TrainConfig]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    config = config_from_dict(payload["config"])
    if params_template is None:
        # Rebuild a template from the config by reconstructing the model.
        from ..envs.factory import create_env
        from ..models.actor_critic import ActorCriticModel
        env = create_env(config.environment)
        model = ActorCriticModel(
            config=config, obs_shape=env.observation_shape,
            action_branches=env.action_branches,
            max_episode_steps=env.max_episode_steps)
        params_template = model.init_params(jax.random.PRNGKey(0))
    params = serialization.from_bytes(params_template, payload["params_bytes"])
    return params, config


class Checkpointer:
    """Periodic full-training-state checkpoints (Orbax)."""

    def __init__(self, directory: str, run_id: str):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(os.path.join(directory, run_id + "_ckpt"))
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True))

    def save(self, update: int, state: Dict[str, Any]) -> None:
        self.manager.save(
            update, args=self._ocp.args.StandardSave(state))

    def latest_update(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Dict[str, Any],
                update: Optional[int] = None) -> Dict[str, Any]:
        step = update if update is not None else self.manager.latest_step()
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(state_template))

    def close(self) -> None:
        self.manager.close()
