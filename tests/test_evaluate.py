"""Batched evaluation protocol."""
import dataclasses

import numpy as np

import jax

from etmppo_tpu.config import load_config
from etmppo_tpu.evaluate import evaluate_params, interquartile_mean
from etmppo_tpu.models.actor_critic import ActorCriticModel
from etmppo_tpu.envs.factory import create_env


def test_iqm():
    values = np.arange(100.0)
    assert interquartile_mean(values) == np.mean(np.arange(25, 75))
    assert interquartile_mean(np.asarray([3.0])) == 3.0


def test_evaluate_untrained_policy_runs():
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(
        cfg, hidden_layer_size=16,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=8))
    env = create_env(cfg.environment)
    model = ActorCriticModel(
        config=cfg, obs_shape=env.observation_shape,
        action_branches=env.action_branches,
        max_episode_steps=env.max_episode_steps)
    params = model.init_params(jax.random.PRNGKey(0))
    infos = evaluate_params(params, cfg, episodes=8, seed=1)
    assert set(infos) == {"reward", "length", "success"}
    assert infos["length"].shape == (8,)
    assert (infos["length"] >= 1).all() and (infos["length"] <= 32).all()


def test_evaluate_trained_policy_succeeds():
    """A briefly-trained PocMemory policy should evaluate well above chance."""
    from etmppo_tpu.training.trainer import PPOTrainer
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(cfg, updates=20, updates_per_launch=20)
    trainer = PPOTrainer(cfg, run_id="evaltest", enable_metrics=False)
    trainer.train_chunk(20)
    infos = evaluate_params(trainer.params, cfg, episodes=32, seed=5)
    assert infos["success"].mean() >= 0.8
