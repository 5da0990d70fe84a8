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

HOST_ENV_TYPES = (
    "SearingSpotlights", "MortarMayhem", "MortarMayhem-Grid", "MysteryPath",
    "MysteryPath-Grid",
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
    if config.type in HOST_ENV_TYPES:
        from .host import HostEnvBatch
        return HostEnvBatch(config)
    raise ValueError(f"Unknown environment type: {config.type!r}")
