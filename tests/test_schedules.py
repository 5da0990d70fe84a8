"""Schedule + config tests (reference semantics: utils.py:32-50)."""
import numpy as np
import pytest

from etmppo_tpu.config import ScheduleConfig, load_config, config_from_dict
from etmppo_tpu.utils.schedules import polynomial_decay


def test_linear_decay():
    for step, expected in [(0, 1.0), (50, 0.55), (100, 0.1), (101, 0.1),
                           (1000, 0.1)]:
        assert polynomial_decay(1.0, 0.1, 100, 1.0, step) == pytest.approx(expected)


def test_power_decay():
    # power 2: value = (init - final) * (1 - s/max)^2 + final
    assert polynomial_decay(1.0, 0.0, 10, 2.0, 5) == pytest.approx(0.25)


def test_equal_initial_final_short_circuits():
    assert polynomial_decay(0.2, 0.2, 100, 1.0, 3) == 0.2


def test_step_equal_to_max_still_decays():
    # Reference uses strict `>` (utils.py:46): at exactly max_decay_steps the
    # formula evaluates (to `final` for power 1).
    assert polynomial_decay(1.0, 0.1, 100, 1.0, 100) == pytest.approx(0.1)


def test_schedule_config_matches_function():
    sched = ScheduleConfig(3e-4, 1e-5, 1.0, 1000)
    for step in [0, 1, 500, 999, 1000, 1001]:
        assert sched.value(step) == pytest.approx(
            polynomial_decay(3e-4, 1e-5, 1000, 1.0, step))


def test_load_reference_format_yaml(tmp_path):
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    assert cfg.environment.type == "PocMemoryEnv"
    assert cfg.transformer.num_blocks == 4
    assert cfg.transformer.gtrxl is True
    assert cfg.n_workers == 16
    assert cfg.learning_rate_schedule.initial == pytest.approx(3e-4)
    assert cfg.batch_size == 16 * 128
    assert cfg.mini_batch_size == 16 * 128 // 8


def test_config_validation():
    with pytest.raises(ValueError):
        config_from_dict({"transformer": {"embed_dim": 65, "num_heads": 2}})
    with pytest.raises(ValueError):
        config_from_dict({"n_workers": 3, "worker_steps": 5, "n_mini_batch": 4})
