"""Checkpoint / resume and model save / load round trips."""
import dataclasses
import os

import numpy as np
import pytest

import jax

from etmppo_tpu.config import load_config
from etmppo_tpu.training.checkpoint import load_model, save_model
from etmppo_tpu.training.trainer import PPOTrainer


def _tiny_cfg(tmp_path, **overrides):
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    return dataclasses.replace(
        cfg, n_workers=4, worker_steps=16, n_mini_batch=2, epochs=2,
        hidden_layer_size=16, updates=4,
        checkpoint_dir=str(tmp_path / "models"),
        summary_dir=str(tmp_path / "summaries"),
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=8),
        **overrides)


def test_model_save_load_roundtrip(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    trainer = PPOTrainer(cfg, run_id="saveload", enable_metrics=False)
    trainer.train_one_update()
    path = str(tmp_path / "models" / "saveload.nn")
    save_model(path, trainer.params, cfg)

    params, loaded_cfg = load_model(path)
    assert loaded_cfg.transformer.embed_dim == cfg.transformer.embed_dim
    assert loaded_cfg.environment.type == "PocMemoryEnv"
    for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_exact(tmp_path):
    """Resume must reproduce the uninterrupted run bit-for-bit."""
    cfg = _tiny_cfg(tmp_path, checkpoint_interval=2, updates_per_launch=2)

    # Uninterrupted: 4 updates.
    t_full = PPOTrainer(cfg, run_id="full", enable_metrics=False)
    t_full.run_training(print_every=0)

    # Interrupted: 2 updates, checkpoint, then a fresh trainer resumes.
    cfg_half = dataclasses.replace(cfg, updates=2)
    t_half = PPOTrainer(cfg_half, run_id="resume", enable_metrics=False)
    t_half.run_training(print_every=0)
    t_half.close()

    t_resumed = PPOTrainer(cfg, run_id="resume", enable_metrics=False)
    assert t_resumed.resume_from_checkpoint()
    assert t_resumed.update == 2
    t_resumed.run_training(print_every=0)

    for a, b in zip(jax.tree.leaves(t_full.params),
                    jax.tree.leaves(t_resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_enjoy_runs_trained_model(tmp_path, capsys):
    from etmppo_tpu.enjoy import run_episodes
    cfg = _tiny_cfg(tmp_path)
    trainer = PPOTrainer(cfg, run_id="enjoytest", enable_metrics=False)
    trainer.train_one_update()
    trainer._save_model()
    path = os.path.join(cfg.checkpoint_dir, "enjoytest.nn")
    returns = run_episodes(path, episodes=2, render=False, seed=3)
    assert len(returns) == 2
    out = capsys.readouterr().out
    assert "Episode length" in out and "Episode reward" in out
