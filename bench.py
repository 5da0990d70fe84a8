#!/usr/bin/env python
"""Headline benchmark: end-to-end training throughput (env-steps/s).

Measures two configs:

1. PocMemoryEnv reference config (16 workers x 128 steps, TrXL-GTrXL 4x64) —
   the same budget the reference trains with; steady-state env-steps/s of the
   full loop (rollout + GAE + 4 PPO epochs) on the default JAX backend.
2. MiniGrid-Memory flagship config (16 workers x 512 steps, CNN encoder +
   TrXL 3 blocks x 384, Pallas window-attention fwd+bwd kernels) — the
   kernel-path / image-obs configuration the real training runs use.

Baseline: the reference publishes no throughput numbers (BASELINE.md), so the
baseline is the measured throughput of benchmarks/torch_reference_replica.py —
a faithful replica of the reference architecture (process-per-env pipe RPC +
eager torch) — on this machine, cached in benchmarks/baseline_measured.json.

Prints one JSON line per metric; the FINAL line keeps the
train_env_steps_per_second_poc_memory schema (driver-parsed), with the
flagship numbers also attached as extra keys.
"""
import gc
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(ROOT, "benchmarks", "baseline_measured.json")


def measure_baseline() -> float:
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            return float(json.load(f)["env_steps_per_second"])
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks",
                                      "torch_reference_replica.py"),
         "--updates", "3"],
        capture_output=True, text=True, timeout=1200)
    result = json.loads(out.stdout.strip().splitlines()[-1])
    with open(BASELINE_PATH, "w") as f:
        json.dump(result, f)
    return float(result["env_steps_per_second"])


def _measure_config(config_path: str, run_id: str, timed_chunks: int) -> float:
    """Steady-state env-steps/s of the fused training loop for one config
    (1 warmup chunk to compile, then `timed_chunks` timed chunks)."""
    import jax
    from etmppo_tpu.config import load_config
    from etmppo_tpu.training.trainer import PPOTrainer

    cfg = load_config(config_path)
    trainer = PPOTrainer(cfg, run_id=run_id, enable_metrics=False)
    chunk = cfg.updates_per_launch
    trainer.train_chunk(chunk)  # compile (persistent-cached thereafter)

    jax.block_until_ready(trainer.params)
    t0 = time.perf_counter()
    for _ in range(timed_chunks):
        trainer.train_chunk(chunk)
    jax.block_until_ready(trainer.params)
    elapsed = time.perf_counter() - t0
    sps = timed_chunks * chunk * cfg.n_workers * cfg.worker_steps / elapsed
    # Free this trainer's device state before the caller measures the next
    # config: a resident flagship trainer otherwise adds HBM pressure and
    # variance to the following measurement (ADVICE round 4).
    del trainer
    gc.collect()
    return sps


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/etmppo_jax_cache")
    baseline = measure_baseline()

    # Flagship first: MiniGrid-Memory (CNN + TrXL 3x384, Pallas fwd+bwd
    # window-attention kernels) — the kernel-path evidence.  Emitted as its
    # own JSON line; the driver parses the FINAL line, which stays poc.
    flagship_sps = _measure_config(
        os.path.join(ROOT, "etmppo_tpu/configs/minigrid.yaml"),
        run_id="bench-flagship", timed_chunks=4)
    print(json.dumps({
        "metric": "train_env_steps_per_second_minigrid_flagship",
        "value": round(flagship_sps, 1),
        "unit": "env_steps/s",
        "model": "CNN + TrXL 3x384 (Pallas window attention fwd+bwd)",
    }), flush=True)

    steps_per_sec = _measure_config(
        os.path.join(ROOT, "etmppo_tpu/configs/poc_memory_env.yaml"),
        run_id="bench", timed_chunks=4)
    print(json.dumps({
        "metric": "train_env_steps_per_second_poc_memory",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
        "flagship_metric": "train_env_steps_per_second_minigrid_flagship",
        "flagship_value": round(flagship_sps, 1),
    }))


if __name__ == "__main__":
    main()
