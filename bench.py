#!/usr/bin/env python
"""Headline benchmark: end-to-end training throughput (env-steps/s).

Runs the PocMemoryEnv reference config (16 workers x 128 steps, TrXL-GTrXL
4x64) — the same budget the reference trains with — and measures steady-state
env-steps/s of the full loop (rollout + GAE + 4 PPO epochs) on the default
JAX backend (TPU on TPU hosts).

Baseline: the reference publishes no throughput numbers (BASELINE.md), so the
baseline is the measured throughput of benchmarks/torch_reference_replica.py —
a faithful replica of the reference architecture (process-per-env pipe RPC +
eager torch) — on this machine, cached in benchmarks/baseline_measured.json.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N}
"""
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


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/etmppo_jax_cache")
    baseline = measure_baseline()

    import jax
    from etmppo_tpu.config import load_config
    from etmppo_tpu.training.trainer import PPOTrainer

    cfg = load_config(os.path.join(ROOT, "etmppo_tpu/configs/poc_memory_env.yaml"))
    trainer = PPOTrainer(cfg, run_id="bench", enable_metrics=False)

    # Warmup chunk (compiles the fused program; persistent-cached thereafter).
    chunk = cfg.updates_per_launch
    trainer.train_chunk(chunk)

    timed_chunks = 4
    jax.block_until_ready(trainer.params)
    t0 = time.perf_counter()
    for _ in range(timed_chunks):
        trainer.train_chunk(chunk)
    jax.block_until_ready(trainer.params)
    elapsed = time.perf_counter() - t0
    timed_updates = timed_chunks * chunk

    steps = timed_updates * cfg.n_workers * cfg.worker_steps
    steps_per_sec = steps / elapsed
    print(json.dumps({
        "metric": "train_env_steps_per_second_poc_memory",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
