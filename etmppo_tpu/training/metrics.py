"""Metrics / observability (reference: trainer.py:325-354 + stdout line).

Writes the same TensorBoard scalar groups as the reference (``episode/*``,
``losses/*``, ``training/*``, ``other/*``, ``gradients/*``) so learning curves
are directly comparable, plus a CSV mirror that needs no TensorBoard install.

Note: the reference writes ``other/clip_fraction`` from ``training_stats[4]``
which is actually the KL estimate, and ``other/kl`` from the clip fraction
(trainer.py:343-344 vs the stat order returned at trainer.py:318-323).  We log
them under the correct names.
"""
from __future__ import annotations

import csv
import os
import time
from collections import deque
from typing import Dict, List, Optional

import numpy as np


def process_episode_info(episode_info: List[dict]) -> Dict[str, float]:
    """Mean/std per info key over recent episodes (reference: utils.py:77-95)."""
    result: Dict[str, float] = {}
    if len(episode_info) > 0:
        for key in episode_info[0].keys():
            if key == "success":
                values = [info[key] for info in episode_info]
                result["success_percent"] = float(np.sum(values) / len(values))
                result["success"] = float(np.mean(values))
            result[key + "_mean"] = float(np.mean([i[key] for i in episode_info]))
            result[key + "_std"] = float(np.std([i[key] for i in episode_info]))
    return result


class MetricsWriter:
    def __init__(self, summary_dir: str, run_id: str, use_tensorboard: bool = True):
        timestamp = time.strftime("%Y%m%d-%H%M%S")
        self.log_dir = os.path.join(summary_dir, run_id, timestamp)
        os.makedirs(self.log_dir, exist_ok=True)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(self.log_dir)
            except Exception:
                self._tb = None
        self._csv_path = os.path.join(self.log_dir, "metrics.csv")
        self._csv_file = open(self._csv_path, "w", newline="")
        self._csv = None
        self._fieldnames: Optional[List[str]] = None

    def write(self, update: int, scalars: Dict[str, float]) -> None:
        if self._tb is not None:
            for key, value in scalars.items():
                self._tb.add_scalar(key, value, update)
        row = {"update": update, **scalars}
        if self._csv is None:
            self._fieldnames = list(row.keys())
            self._csv = csv.DictWriter(
                self._csv_file, fieldnames=self._fieldnames, extrasaction="ignore")
            self._csv.writeheader()
        self._csv.writerow(row)
        self._csv_file.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._csv_file.close()


def training_scalars(stats: Dict[str, float], episode_result: Dict[str, float],
                     value_mean: float, advantage_mean: float) -> Dict[str, float]:
    """Scalar dict in the reference's TensorBoard naming scheme."""
    scalars = {}
    for key, value in episode_result.items():
        if "std" not in key:
            scalars["episode/" + key] = value
    scalars["losses/loss"] = stats["loss"]
    scalars["losses/policy_loss"] = stats["policy_loss"]
    scalars["losses/value_loss"] = stats["value_loss"]
    scalars["losses/entropy"] = stats["entropy"]
    scalars["training/value_mean"] = value_mean
    scalars["training/advantage_mean"] = advantage_mean
    scalars["other/clip_fraction"] = stats["clip_fraction"]
    scalars["other/kl"] = stats["kl"]
    return scalars
