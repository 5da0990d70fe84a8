"""Where does the per-update time go?  Times the fused K-update chunk, the
rollout alone, and the PPO update alone for a config, so dispatch overhead vs
rollout scan vs epoch compute can be attributed (VERDICT r2 backlog: the
PocMemory chunk spends 58 ms/update on TPU — rollout or epochs?).

    python benchmarks/fused_breakdown.py --config=etmppo_tpu/configs/poc_memory_env.yaml
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, iters):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=0,
                    help="fused chunk length (default: config "
                         "updates_per_launch)")
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="override the config's compute_dtype (bf16 vs fp32 "
                         "A/B at the same scale)")
    a = ap.parse_args()

    import dataclasses

    import jax
    from etmppo_tpu.config import load_config
    from etmppo_tpu.training.trainer import PPOTrainer

    cfg = load_config(a.config)
    if a.dtype:
        cfg = dataclasses.replace(cfg, compute_dtype=a.dtype)
    trainer = PPOTrainer(cfg, run_id="breakdown", enable_metrics=False)
    if trainer.fused_loop is None:
        raise SystemExit("needs a pure-JAX env (fused loop)")
    k = a.chunk or cfg.updates_per_launch
    print(f"backend={jax.default_backend()} config={os.path.basename(a.config)} "
          f"chunk={k} iters={a.iters}")

    # 1. rollout alone (jitted once; state threaded so shapes stay static)
    rollout_holder = {"state": trainer.rollout_state}

    def run_rollout():
        state, batch = trainer.rollout_fn(trainer.params,
                                          rollout_holder["state"])
        rollout_holder["state"] = state
        return batch.advantages

    t_rollout = timeit(run_rollout, a.iters)

    # 2. update alone on a fixed batch
    new_state, batch = trainer.rollout_fn(trainer.params,
                                          rollout_holder["state"])
    rollout_holder["state"] = new_state
    rng = jax.random.PRNGKey(0)
    lr = cfg.learning_rate_schedule.value(0)
    clip = cfg.clip_range_schedule.value(0)
    beta = cfg.beta_schedule.value(0)

    def run_update():
        # update_fn donates params/opt_state — thread them like training does
        trainer.params, trainer.opt_state, stats, _ = trainer.update_fn(
            trainer.params, trainer.opt_state, batch, rng, lr, clip, beta)
        return stats

    t_update = timeit(run_update, a.iters)

    # 3. fused chunk of k updates (one device program, 2 host transfers)
    # (steps 1/2 donated the original rollout state; rebind the live one)
    trainer.rollout_state = rollout_holder["state"]
    lrs, clips, betas = trainer._schedule_values(k)

    def run_chunk():
        (trainer.params, trainer.opt_state, trainer.rollout_state,
         trainer._update_rng, outs) = trainer.fused_loop(
            trainer.params, trainer.opt_state, trainer.rollout_state,
            trainer._update_rng, lrs, clips, betas)
        return outs.scalars

    t_chunk = timeit(run_chunk, max(1, a.iters // k))
    per_update_fused = t_chunk / k
    parts = t_rollout + t_update
    print(f"rollout alone:      {t_rollout:8.2f} ms")
    print(f"update alone:       {t_update:8.2f} ms")
    print(f"rollout+update sum: {parts:8.2f} ms")
    print(f"fused chunk (k={k}): {t_chunk:8.2f} ms -> {per_update_fused:.2f} "
          f"ms/update")
    print(f"fusion saves {parts - per_update_fused:.2f} ms/update "
          f"({(1 - per_update_fused / parts) * 100:.0f}%) vs separate "
          f"dispatches" if parts > per_update_fused else
          "fused path is not faster at this scale")
    trainer.close()


if __name__ == "__main__":
    main()
