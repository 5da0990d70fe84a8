"""Batched evaluation protocol."""
import dataclasses

import numpy as np

import jax

from etmppo_tpu.config import load_config
from etmppo_tpu.evaluate import (evaluate_params, evaluate_protocol,
                                 interquartile_mean, stratified_bootstrap_ci)
from etmppo_tpu.models.actor_critic import ActorCriticModel
from etmppo_tpu.envs.factory import create_env


def test_iqm():
    values = np.arange(100.0)
    assert interquartile_mean(values) == np.mean(np.arange(25, 75))
    assert interquartile_mean(np.asarray([3.0])) == 3.0


def test_stratified_bootstrap_ci():
    rng = np.random.default_rng(0)
    # 5 "seeds" drawn around distinct means; the CI must bracket the pooled
    # IQM and be reproducible for a fixed bootstrap seed.
    per_seed = [rng.normal(loc=m, scale=0.1, size=100)
                for m in (0.9, 1.0, 1.0, 1.1, 1.0)]
    pooled_iqm = interquartile_mean(np.concatenate(per_seed))
    lo, hi = stratified_bootstrap_ci(per_seed, n_boot=500, seed=3)
    assert lo < pooled_iqm < hi
    assert hi - lo < 0.2  # tight-ish with 500 samples/seed
    assert (lo, hi) == stratified_bootstrap_ci(per_seed, n_boot=500, seed=3)
    # A degenerate single-seed case still returns an ordered interval.
    lo1, hi1 = stratified_bootstrap_ci([per_seed[0]], n_boot=200, seed=1)
    assert lo1 <= hi1


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


def test_evaluate_protocol_cross_seed(tmp_path):
    """evaluate_protocol: fixed env seeds across repeats, cross-seed IQM +
    CI over multiple model files (the reference's 5-seed protocol shape)."""
    from etmppo_tpu.training.checkpoint import save_model
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
    paths = []
    for s in range(2):
        params = model.init_params(jax.random.PRNGKey(s))
        p = str(tmp_path / f"seed{s}.nn")
        save_model(p, params, cfg)
        paths.append(p)
    per_seed, aggregate = evaluate_protocol(
        paths, episodes=4, repeats=2, seed=7, n_boot=50)
    assert set(per_seed) == set(paths)
    for infos in per_seed.values():
        assert infos["reward"].shape == (8,)  # episodes x repeats pooled
    iqm, lo, hi = aggregate["reward"]
    assert lo <= iqm <= hi

    # Same env_seed => identical env episodes: a greedy-free check is hard,
    # but repeats with different policy rng must still share the reset seeds,
    # so lengths can differ while the protocol stays reproducible end-to-end.
    per_seed2, aggregate2 = evaluate_protocol(
        paths, episodes=4, repeats=2, seed=7, n_boot=50)
    np.testing.assert_array_equal(per_seed[paths[0]]["reward"],
                                  per_seed2[paths[0]]["reward"])
    assert aggregate == aggregate2


def test_evaluate_trained_policy_succeeds():
    """A briefly-trained PocMemory policy should evaluate well above chance."""
    from etmppo_tpu.training.trainer import PPOTrainer
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(cfg, updates=20, updates_per_launch=20)
    trainer = PPOTrainer(cfg, run_id="evaltest", enable_metrics=False)
    trainer.train_chunk(20)
    infos = evaluate_params(trainer.params, cfg, episodes=32, seed=5)
    assert infos["success"].mean() >= 0.8
