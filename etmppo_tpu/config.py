"""Typed configuration for the TPU-native episodic-transformer-memory PPO framework.

Mirrors the reference's schemaless YAML key inventory (reference: yaml_parser.py,
configs/*.yaml) but as validated dataclasses with defaults.  The full key set is
documented in SURVEY.md §5 ("Config / flag system").

YAML layout is identical to the reference so its config files load unchanged:

    environment: {type, name, reset_params}
    gamma, lamda, updates, epochs, n_workers, worker_steps, n_mini_batch,
    value_loss_coefficient, hidden_layer_size, max_grad_norm
    transformer: {num_blocks, embed_dim, num_heads, memory_length,
                  positional_encoding, layer_norm, gtrxl, gtrxl_bias}
    {learning_rate,beta,clip_range}_schedule: {initial, final, power, max_decay_steps}
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import yaml


@dataclass(frozen=True)
class ScheduleConfig:
    """Polynomial decay schedule (reference: utils.py:32-50), stepped per update."""
    initial: float
    final: float
    power: float = 1.0
    max_decay_steps: int = 1

    def value(self, step: int) -> float:
        if step > self.max_decay_steps or self.initial == self.final:
            return self.final
        return (self.initial - self.final) * (
            (1.0 - step / self.max_decay_steps) ** self.power
        ) + self.final


@dataclass(frozen=True)
class TransformerConfig:
    """TrXL / GTrXL architecture config (reference: transformer.py)."""
    num_blocks: int = 3
    embed_dim: int = 384
    num_heads: int = 4
    memory_length: int = 64
    positional_encoding: str = ""   # "" | "relative" | "learned"
    layer_norm: str = ""            # "" | "pre" | "post"
    gtrxl: bool = False
    gtrxl_bias: float = 0.0

    def __post_init__(self):
        if self.embed_dim % self.num_heads != 0:
            raise ValueError(
                f"embed_dim ({self.embed_dim}) must be divisible by num_heads "
                f"({self.num_heads})")
        if self.positional_encoding not in ("", "relative", "learned"):
            raise ValueError(
                f"positional_encoding must be '', 'relative' or 'learned', got "
                f"{self.positional_encoding!r}")
        if self.layer_norm not in ("", "pre", "post"):
            raise ValueError(
                f"layer_norm must be '', 'pre' or 'post', got {self.layer_norm!r}")


@dataclass(frozen=True)
class EnvConfig:
    type: str = "PocMemoryEnv"
    name: str = ""
    reset_params: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class TrainConfig:
    environment: EnvConfig = field(default_factory=EnvConfig)
    gamma: float = 0.99
    lamda: float = 0.95
    updates: int = 200
    epochs: int = 4
    n_workers: int = 16
    worker_steps: int = 128
    n_mini_batch: int = 8
    value_loss_coefficient: float = 0.1
    hidden_layer_size: int = 64
    max_grad_norm: float = 0.5
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    learning_rate_schedule: ScheduleConfig = field(
        default_factory=lambda: ScheduleConfig(3.0e-4, 3.0e-4, 1.0, 200))
    beta_schedule: ScheduleConfig = field(
        default_factory=lambda: ScheduleConfig(0.001, 0.0001, 1.0, 200))
    clip_range_schedule: ScheduleConfig = field(
        default_factory=lambda: ScheduleConfig(0.2, 0.2, 1.0, 200))
    # --- TPU-native extensions (absent from the reference) ---
    seed: int = 0
    # Compute dtype for the model forward/backward ("float32" or "bfloat16").
    # Params are always float32.  Default float32 for reference parity.
    compute_dtype: str = "float32"
    # Use the Pallas fused window-attention kernel where applicable.
    use_pallas_attention: bool = False
    # Run the fully-fused Pallas backward kernel too (vs deriving grads
    # through the XLA formulation). Validated on v5e at the shipped config
    # scales (embed_dim 256 and 384 — see BENCHMARKS.md kernel table):
    # ~2.7-3.3x faster than the XLA VJP; requires use_pallas_attention.
    pallas_backward: bool = False
    # Checkpointing (reference only saves the final model, trainer.py:356-362).
    checkpoint_interval: int = 0  # 0 = final only
    checkpoint_dir: str = "./models"
    summary_dir: str = "./summaries"
    # Data-parallel device count (1 = single chip). Mesh axis name: "data".
    num_devices: int = 1
    # Updates fused into one device program (lax.scan over updates); 1 =
    # launch-per-update like the reference. Higher amortizes dispatch latency.
    updates_per_launch: int = 8
    # Host-env rollout pipeline groups: workers split into G groups so one
    # group's Python env stepping overlaps the other groups' device compute
    # (1 = serial). Raise when host envs dominate the rollout wall-clock.
    host_pipeline_groups: int = 2
    # Store rollout observations as uint8 (x255) in the training batch —
    # 4x less HBM for image envs at <=0.4% quantization error. Off by default
    # for exact reference parity.
    obs_uint8: bool = False

    def __post_init__(self):
        if (self.n_workers * self.worker_steps) % self.n_mini_batch != 0:
            raise ValueError(
                "n_workers * worker_steps must be divisible by n_mini_batch")
        if self.num_devices > 1 and self.n_workers % self.num_devices != 0:
            raise ValueError("n_workers must be divisible by num_devices")

    @property
    def batch_size(self) -> int:
        return self.n_workers * self.worker_steps

    @property
    def mini_batch_size(self) -> int:
        return self.batch_size // self.n_mini_batch


def _schedule_from_dict(d: Dict[str, Any]) -> ScheduleConfig:
    return ScheduleConfig(
        initial=float(d["initial"]), final=float(d["final"]),
        power=float(d.get("power", 1.0)),
        max_decay_steps=int(d.get("max_decay_steps", 1)))


def config_from_dict(raw: Dict[str, Any]) -> TrainConfig:
    """Builds a TrainConfig from a (possibly reference-format) nested dict."""
    raw = dict(raw)
    env_raw = dict(raw.get("environment", {}))
    env = EnvConfig(
        type=env_raw.get("type", "PocMemoryEnv"),
        name=env_raw.get("name", ""),
        reset_params=dict(env_raw.get("reset_params", {}) or {}))
    trx_raw = dict(raw.get("transformer", {}))
    trx = TransformerConfig(
        num_blocks=int(trx_raw.get("num_blocks", 3)),
        embed_dim=int(trx_raw.get("embed_dim", 384)),
        num_heads=int(trx_raw.get("num_heads", 4)),
        memory_length=int(trx_raw.get("memory_length", 64)),
        positional_encoding=trx_raw.get("positional_encoding", "") or "",
        layer_norm=trx_raw.get("layer_norm", "") or "",
        gtrxl=bool(trx_raw.get("gtrxl", False)),
        gtrxl_bias=float(trx_raw.get("gtrxl_bias", 0.0)))

    kwargs: Dict[str, Any] = dict(environment=env, transformer=trx)
    for name in ("gamma", "lamda", "value_loss_coefficient", "max_grad_norm"):
        if name in raw:
            kwargs[name] = float(raw[name])
    for name in ("updates", "epochs", "n_workers", "worker_steps", "n_mini_batch",
                 "hidden_layer_size", "seed", "checkpoint_interval", "num_devices",
                 "updates_per_launch", "host_pipeline_groups"):
        if name in raw:
            kwargs[name] = int(raw[name])
    for name in ("compute_dtype", "checkpoint_dir", "summary_dir"):
        if name in raw:
            kwargs[name] = str(raw[name])
    for name in ("use_pallas_attention", "pallas_backward", "obs_uint8"):
        if name in raw:
            kwargs[name] = bool(raw[name])
    for name in ("learning_rate_schedule", "beta_schedule", "clip_range_schedule"):
        if name in raw:
            kwargs[name] = _schedule_from_dict(raw[name])
    return TrainConfig(**kwargs)


def load_config(path: str) -> TrainConfig:
    """Loads a YAML config file (reference format: yaml_parser.py:11-34)."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return config_from_dict(raw)


def config_to_dict(config: TrainConfig) -> Dict[str, Any]:
    """Round-trips a TrainConfig into the reference's nested-dict format
    (so checkpoints carry the config like trainer.py:361 does)."""
    return dataclasses.asdict(config)
