"""TPU-native episodic-transformer-memory PPO framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
MarcoMeter/episodic-transformer-memory-ppo: a PPO learner with a
TransformerXL/GTrXL episodic-memory policy trained on memory-demanding POMDP
environments, built as a single SPMD program (vmapped pure-JAX envs, lax.scan
rollouts, jitted updates, device meshes) instead of process-parallel eager
PyTorch.
"""
from .config import TrainConfig, TransformerConfig, ScheduleConfig, EnvConfig, \
    load_config, config_from_dict, config_to_dict

__version__ = "0.1.0"
