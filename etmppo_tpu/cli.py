"""Command-line entry points (reference: train.py / enjoy.py CLIs).

Train:  python train.py --config=<yaml> --run-id=<id> [--cpu] [--resume]
Enjoy:  python enjoy.py --model=<path> [--episodes=N]

``--cpu`` forces the CPU backend (reference: train.py:13-16's --cpu flag);
by default JAX picks the best available backend (TPU on TPU hosts).
"""
from __future__ import annotations

import argparse


def _force_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")


def train_main(argv=None):
    parser = argparse.ArgumentParser(description="Train a TrXL/GTrXL PPO agent")
    parser.add_argument("--config", default="etmppo_tpu/configs/poc_memory_env.yaml",
                        help="Path to the yaml config file")
    parser.add_argument("--run-id", default="run", dest="run_id",
                        help="Tag for summaries and the saved model")
    parser.add_argument("--cpu", action="store_true",
                        help="Force training on CPU")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest checkpoint for this run-id")
    parser.add_argument("--debug-nans", action="store_true",
                        help="Enable jax_debug_nans (NaN-check mode)")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="Capture a jax.profiler trace of training to DIR")
    parser.add_argument("--seeds", type=int, default=1,
                        help="Train N seeds sequentially (the reference's "
                             "5-seed evaluation protocol); models saved as "
                             "<run-id>_s<seed>.nn")
    parser.add_argument("--updates", type=int, default=None,
                        help="Override the config's update budget (e.g. a "
                             "time-boxed partial run; resume later with "
                             "--resume and the full budget)")
    args = parser.parse_args(argv)

    if args.cpu:
        _force_cpu()
    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)

    import dataclasses

    from .config import load_config
    from .training.trainer import PPOTrainer

    base_config = load_config(args.config)
    if args.updates is not None:
        base_config = dataclasses.replace(base_config, updates=args.updates)
    seed_results = []
    for i in range(args.seeds):
        config = base_config if args.seeds == 1 else dataclasses.replace(
            base_config, seed=base_config.seed + i)
        run_id = args.run_id if args.seeds == 1 else \
            f"{args.run_id}_s{config.seed}"
        trainer = PPOTrainer(config, run_id=run_id)
        if args.resume:
            resumed = trainer.resume_from_checkpoint()
            print(f"Resumed from checkpoint at update {trainer.update}"
                  if resumed else "No checkpoint found; starting fresh")
        try:
            if args.profile:
                from .utils.profiling import trace
                with trace(args.profile):
                    result = trainer.run_training()
            else:
                result = trainer.run_training()
            print(f"env steps/s: "
                  f"{result.get('env_steps_per_second', 0.0):,.0f}")
            if "env_steps_per_second_steady" in result:
                print(f"env steps/s (steady-state, excl. first-launch "
                      f"compile): "
                      f"{result['env_steps_per_second_steady']:,.0f}")
            seed_results.append(result)
        finally:
            trainer.close()
    if len(seed_results) > 1:
        import numpy as np
        rewards = [r.get("reward_mean", float("nan")) for r in seed_results]
        print(f"[{len(seed_results)} seeds] final reward_mean: "
              f"{np.nanmean(rewards):.3f} +/- {np.nanstd(rewards):.3f}")


def enjoy_main(argv=None):
    parser = argparse.ArgumentParser(description="Run a trained model")
    parser.add_argument("--model", default="./models/run.nn",
                        help="Path to the trained model")
    parser.add_argument("--episodes", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--no-render", action="store_true")
    parser.add_argument("--render-dir", default=None,
                        help="Where image-env episode GIFs are written "
                             "(default: renders/<model-stem>/)")
    args = parser.parse_args(argv)

    if args.cpu:
        _force_cpu()

    from .enjoy import run_episodes

    run_episodes(args.model, episodes=args.episodes,
                 render=not args.no_render, render_dir=args.render_dir)
