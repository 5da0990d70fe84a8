"""Environment factory (reference: utils.py:11-30's ``create_env`` dispatch).

Pure-JAX environments (PocMemoryEnv, CartPole, Minigrid-Memory) compile into
the rollout scan.  Python-only environments (gym-minigrid beyond Memory,
memory-gym) go through the host-environment bridge (envs/host.py) when their
packages are installed.
"""
from __future__ import annotations

from ..config import EnvConfig
from .core import JaxEnv
from .cartpole import CartPole
from .poc_memory import PocMemoryEnv

# memory-gym env families: the "-Grid" types default to the pure-JAX
# reimplementations (envs/mortar_mayhem.py, envs/mystery_path.py); append
# "-host" (or use a non-Grid type) to run the original Python packages
# through the host bridge.
HOST_ENV_TYPES = (
    "MortarMayhem", "MysteryPath",
    "MortarMayhem-Grid-host", "MysteryPath-Grid-host",
    "SearingSpotlights-host", "Minigrid-host",
)


def create_env(config: EnvConfig) -> JaxEnv:
    """String-typed dispatch mirroring the reference factory (utils.py:21-30)."""
    if config.type == "PocMemoryEnv":
        return PocMemoryEnv(glob=False, freeze=True, max_episode_steps=32)
    if config.type == "CartPole":
        return CartPole(mask_velocity=False)
    if config.type == "CartPoleMasked":
        return CartPole(mask_velocity=True)
    if config.type == "Minigrid":
        from .minigrid_memory import MinigridMemoryEnv
        return MinigridMemoryEnv(config.name)
    if config.type == "MortarMayhem-Grid":
        from .mortar_mayhem import MortarMayhemGridEnv
        return MortarMayhemGridEnv(config.reset_params)
    if config.type == "MysteryPath-Grid":
        from .mystery_path import MysteryPathGridEnv
        return MysteryPathGridEnv(config.reset_params)
    if config.type == "SearingSpotlights":
        from .searing_spotlights import SearingSpotlightsEnv
        return SearingSpotlightsEnv(config.reset_params)
    if config.type.endswith("-native"):
        from .native import NativeEnvBatch
        return NativeEnvBatch(config.type)
    if config.type in HOST_ENV_TYPES:
        from .host import HostEnvBatch
        import dataclasses
        host_config = config
        if config.type.endswith("-host"):
            host_config = dataclasses.replace(
                config, type=config.type[: -len("-host")])
        return HostEnvBatch(host_config)
    raise ValueError(f"Unknown environment type: {config.type!r}")
