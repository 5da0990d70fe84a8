"""End-to-end learning: PocMemoryEnv success must rise fast (SURVEY.md §4:
the reference's own correctness check is PocMemory success -> ~1.0).

The full 200-update reference budget reaches success == 1.0 (verified on CPU;
success crosses 1.0 by ~update 10-15 with the reference hyperparameters); this
test runs a quarter of the budget to keep the suite fast.
"""
import dataclasses

import pytest

from etmppo_tpu.config import load_config
from etmppo_tpu.training.trainer import PPOTrainer


def test_poc_memory_learns():
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    cfg = dataclasses.replace(cfg, updates=30, updates_per_launch=10)
    trainer = PPOTrainer(cfg, run_id="e2e", enable_metrics=False)
    result = {}
    for _ in range(3):
        result = trainer.train_chunk(10)[-1]
    assert result["success_percent"] >= 0.9, result
    assert result["reward_mean"] > 0.5, result


@pytest.mark.slow
def test_poc_memory_full_budget_solves():
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    trainer = PPOTrainer(cfg, run_id="e2e-full", enable_metrics=False)
    result = {}
    for _ in range(cfg.updates // cfg.updates_per_launch):
        result = trainer.train_chunk(cfg.updates_per_launch)[-1]
    assert result["success_percent"] >= 0.95, result
