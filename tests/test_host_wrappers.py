"""Conformance tests for the host-bridge env wrappers.

The optional packages (memory-gym, gym-minigrid) are not installed in this
image, so these tests drive the wrappers against in-process stub envs that
mimic the packages' API surface, and assert the wrapper-side behavior the
reference specifies (environments/memory_gym_env.py:77-111,
minigrid_env.py:12-28): observation scaling to [0,1], layout transposition,
per-reset seed sampling, reset-option forwarding, reward/length episode info,
and the Memory-task view/tile/step-cap selection.
"""
import importlib
import sys
import types

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# MemoryGymWrapper — gymnasium is installed; stub only the memory_gym package
# (its sole import effect is env registration) and register a recording env.
# ---------------------------------------------------------------------------

gymnasium = pytest.importorskip("gymnasium")


class _RecordingMGEnv(gymnasium.Env):
    """Mimics a memory-gym env: uint8 (H, W, C) obs, MultiDiscrete actions,
    max_episode_steps attribute, (obs, info) resets with seed/options."""

    observation_space = gymnasium.spaces.Box(
        0, 255, shape=(6, 4, 3), dtype=np.uint8)
    action_space = gymnasium.spaces.MultiDiscrete([2, 3])
    max_episode_steps = 7

    def __init__(self):
        self.seeds = []
        self.options = []
        self.actions = []

    def _obs(self):
        # Distinct value per (h, w, c) so layout mistakes are detectable.
        h, w, c = self.observation_space.shape
        return (np.arange(h * w * c, dtype=np.uint8).reshape(h, w, c))

    def reset(self, seed=None, options=None):
        self.seeds.append(seed)
        self.options.append(options)
        self.t = 0
        return self._obs(), {}

    def step(self, action):
        self.actions.append(action)
        self.t += 1
        done = self.t >= 3
        info = {"extra": 1.0} if done else {}
        return self._obs(), float(self.t), done, False, info


@pytest.fixture()
def mg_wrapper_cls(monkeypatch):
    monkeypatch.setitem(sys.modules, "memory_gym",
                        types.ModuleType("memory_gym"))
    if "StubMemGym-v0" not in gymnasium.registry:
        gymnasium.register(id="StubMemGym-v0",
                           entry_point=lambda **kw: _RecordingMGEnv())
    mod = importlib.import_module("etmppo_tpu.envs.memory_gym_wrapper")
    return mod.MemoryGymWrapper


def test_memory_gym_obs_layout_and_scaling(mg_wrapper_cls):
    w = mg_wrapper_cls("StubMemGym-v0", {"start-seed": 5, "num-seeds": 1})
    # Reference: observation_space reports the transposed (C, W, H) shape.
    assert w.observation_space.shape == (3, 4, 6)
    obs = w.reset()
    raw = _RecordingMGEnv().reset()[0]
    # swapaxes(0,2) then swapaxes(2,1): (H, W, C) -> (C, H, W), scaled /255.
    assert obs.shape == (3, 6, 4)
    np.testing.assert_allclose(
        obs, np.transpose(raw, (2, 0, 1)) / 255.0, rtol=0, atol=0)
    assert obs.min() >= 0.0 and obs.max() <= 1.0


def test_memory_gym_seed_sampling_and_options(mg_wrapper_cls):
    params = {"start-seed": 100, "num-seeds": 10, "agent_scale": 0.25}
    w = mg_wrapper_cls("StubMemGym-v0", params)
    for _ in range(50):
        w.reset()
    env = w._env.unwrapped
    seeds = [s for s in env.seeds if s is not None]
    # Uniform per-reset sampling from [start-seed, start-seed + num-seeds).
    assert all(100 <= s <= 109 for s in seeds)
    assert len(set(seeds)) > 1  # actually sampling, not a constant
    # Non-seed reset params forwarded as gymnasium options; seed keys not.
    opts = [o for o in env.options if o is not None]
    assert opts and all(o == {"agent_scale": 0.25} for o in opts)


def test_memory_gym_step_and_episode_info(mg_wrapper_cls):
    w = mg_wrapper_cls("StubMemGym-v0", {"start-seed": 0, "num-seeds": 1})
    w.reset()
    # Single-branch actions arrive as length-1 arrays and must be unwrapped.
    obs, r1, done, info = w.step(np.asarray([1]))
    assert (r1, done, info) == (1.0, False, None)
    assert w._env.unwrapped.actions[-1] == 1
    # Multi-branch actions pass through unchanged.
    obs, r2, done, info = w.step([0, 2])
    assert list(w._env.unwrapped.actions[-1]) == [0, 2]
    obs, r3, done, info = w.step([1, 1])
    assert done
    # Episode info: summed reward, length in steps, env info merged in.
    assert info["reward"] == r1 + r2 + r3
    assert info["length"] == 3
    assert info["extra"] == 1.0


def test_memory_gym_max_episode_steps_through_wrapper_chain(mg_wrapper_cls):
    # gym.make wraps in OrderEnforcing; gymnasium >= 1.0 has no implicit
    # attribute forwarding, so this exercises the .unwrapped access path.
    w = mg_wrapper_cls("StubMemGym-v0", {"start-seed": 0, "num-seeds": 1})
    assert w.max_episode_steps == 7


def test_memory_gym_multidiscrete_action_space(mg_wrapper_cls):
    w = mg_wrapper_cls("StubMemGym-v0", {"start-seed": 0, "num-seeds": 1})
    # Reference flattens MultiDiscrete([2, 3]) to a single n = prod(nvec).
    assert w.action_space.n == 6


# ---------------------------------------------------------------------------
# MinigridHostWrapper — gym/gym_minigrid absent; stub the full module surface
# the wrapper imports so ITS logic (view/tile/cap selection, CHW scaling,
# step-cap truncation, per-reset seeding) runs for real.
# ---------------------------------------------------------------------------


class _StubGridEnv:
    """Base env: records seeds; obs produced by the (stub) wrapper chain."""

    class _Space:
        def __init__(self, n=None, shape=None):
            self.n = n
            self.shape = shape

    def __init__(self):
        self.action_space = self._Space(n=7)
        self.seeds = []
        self.view_size = None
        self.tile_size = None

    def seed(self, s):
        self.seeds.append(int(s))

    def _obs(self):
        hw = self.view_size * self.tile_size
        rng = np.random.default_rng(self.seeds[-1] if self.seeds else 0)
        return rng.integers(0, 256, size=(hw, hw, 3)).astype(np.uint8)

    def reset(self):
        self.t = 0
        return self._obs()

    def step(self, action):
        self.t += 1
        return self._obs(), 0.5, False, {}

    def close(self):
        pass


@pytest.fixture()
def minigrid_wrapper_cls(monkeypatch):
    gym_mod = types.ModuleType("gym")

    class Discrete:
        def __init__(self, n):
            self.n = n

    class Box:
        def __init__(self, low, high, shape, dtype):
            self.shape = shape
            self.dtype = dtype

    spaces_mod = types.ModuleType("gym.spaces")
    spaces_mod.Discrete = Discrete
    spaces_mod.Box = Box
    gym_mod.spaces = spaces_mod
    gym_mod.make = lambda name: _StubGridEnv()

    def view_size_wrapper(env, view_size):
        env.view_size = view_size
        return env

    def rgb_wrapper(env, tile_size):
        env.tile_size = tile_size
        return env

    wrappers_mod = types.ModuleType("gym_minigrid.wrappers")
    wrappers_mod.ViewSizeWrapper = view_size_wrapper
    wrappers_mod.RGBImgPartialObsWrapper = rgb_wrapper
    wrappers_mod.ImgObsWrapper = lambda env: env
    gm_mod = types.ModuleType("gym_minigrid")
    gm_mod.wrappers = wrappers_mod

    monkeypatch.setitem(sys.modules, "gym", gym_mod)
    monkeypatch.setitem(sys.modules, "gym.spaces", spaces_mod)
    monkeypatch.setitem(sys.modules, "gym_minigrid", gm_mod)
    monkeypatch.setitem(sys.modules, "gym_minigrid.wrappers", wrappers_mod)
    sys.modules.pop("etmppo_tpu.envs.minigrid_host_wrapper", None)
    mod = importlib.import_module("etmppo_tpu.envs.minigrid_host_wrapper")
    yield mod.MinigridHostWrapper
    # Drop the stub-bound module so no later import sees stale bindings.
    sys.modules.pop("etmppo_tpu.envs.minigrid_host_wrapper", None)


def test_minigrid_memory_task_configuration(minigrid_wrapper_cls):
    w = minigrid_wrapper_cls("MiniGrid-MemoryS9-v0")
    # Memory-*: view 3, tile 28 -> 84x84 obs, 96-step cap, 3 actions.
    assert (w._env.view_size, w.tile_size) == (3, 28)
    assert w.max_episode_steps == 96
    assert w.action_space.n == 3
    assert w.observation_space.shape == (3, 84, 84)


def test_minigrid_other_task_configuration(minigrid_wrapper_cls):
    w = minigrid_wrapper_cls("MiniGrid-Empty-5x5-v0")
    # Non-Memory: view 7, tile 8 -> 56x56, 64 steps, env's own actions.
    assert (w._env.view_size, w.tile_size) == (7, 8)
    assert w.max_episode_steps == 64
    assert w.action_space.n == 7
    assert w.observation_space.shape == (3, 56, 56)


def test_minigrid_obs_scaling_layout_and_seeding(minigrid_wrapper_cls):
    w = minigrid_wrapper_cls("MiniGrid-MemoryS9-v0")
    for _ in range(20):
        obs = w.reset()
    seeds = w._env.seeds
    assert len(seeds) == 20 and all(0 <= s <= 999 for s in seeds)
    assert len(set(seeds)) > 1
    # CHW float obs in [0, 1]; value (h, w, c) lands at (c, h, w).
    raw = w._env._obs()
    np.testing.assert_allclose(obs, np.transpose(raw, (2, 0, 1)) / 255.0)
    assert obs.dtype == np.float32


def test_minigrid_step_cap_and_episode_info(minigrid_wrapper_cls):
    w = minigrid_wrapper_cls("MiniGrid-MemoryS9-v0")
    w.reset()
    for t in range(96):
        obs, reward, done, info = w.step(np.asarray([2]))
        assert done == (t == 95)  # wrapper-enforced 96-step truncation
        assert (info is None) == (t != 95)
    assert info["length"] == 96
    assert info["reward"] == pytest.approx(0.5 * 96)
