"""MFU (model FLOP utilization) accounting for a training config.

    python benchmarks/mfu_bench.py --config=etmppo_tpu/configs/mysterypath_grid.yaml --time 20

Reports FLOPs per PPO update (XLA cost analysis of the fused one-update
program, plus the analytic count for Pallas window-attention kernels that XLA
sees as opaque custom calls), and — with ``--time`` — the measured seconds
per update and the resulting MFU against the chip's bf16 peak.

Without ``--time`` it still prints FLOPs/update and an MFU for a given
``--seconds-per-update`` (e.g. from a logged training run), so utilization
can be computed for runs that already happened.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--time", type=int, default=0, metavar="K",
                    help="measure s/update over K updates (after 1 warmup "
                         "chunk); runs on the active backend")
    ap.add_argument("--seconds-per-update", type=float, default=0.0,
                    help="use an externally measured s/update instead")
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="override the config's compute_dtype (bf16 vs fp32 "
                         "A/B at the same scale)")
    a = ap.parse_args()

    import dataclasses

    import jax
    from etmppo_tpu.config import load_config
    from etmppo_tpu.training.trainer import PPOTrainer
    from etmppo_tpu.utils import flops as flops_lib

    cfg = load_config(a.config)
    if a.dtype:
        cfg = dataclasses.replace(cfg, compute_dtype=a.dtype)
    trainer = PPOTrainer(cfg, run_id="mfu-bench", enable_metrics=False)
    if trainer.fused_loop is None:
        raise SystemExit("mfu_bench needs a pure-JAX env (fused loop)")

    lrs, clips, betas = trainer._schedule_values(1)
    xla_flops = flops_lib.compiled_flops(
        trainer.fused_loop._jitted, trainer.params, trainer.opt_state,
        trainer.rollout_state, trainer._update_rng, lrs, clips, betas)

    # Pallas kernels are opaque to XLA's cost analysis: add the analytic
    # window-attention count when the config runs them (per transformer
    # block: rollout forward over W*T samples; per epoch one forward and one
    # backward over the full W*T batch, minibatching does not change totals).
    trx = cfg.transformer
    B = cfg.n_workers * cfg.worker_steps
    pallas_flops = 0.0
    from etmppo_tpu.ops import pallas_window_attention as pwa
    pallas_active = (cfg.use_pallas_attention
                     and jax.default_backend() == "tpu"
                     and pwa._supported_on_tpu(trx.embed_dim))
    if pallas_active:
        fwd = flops_lib.window_attention_flops(B, trx.memory_length,
                                               trx.embed_dim)
        bwd = flops_lib.window_attention_flops(B, trx.memory_length,
                                               trx.embed_dim, backward=True)
        pallas_flops = trx.num_blocks * (fwd + cfg.epochs * (fwd + bwd))
    total_flops = xla_flops + pallas_flops

    backend = jax.default_backend()
    peak = flops_lib.device_peak_flops()
    print(f"backend={backend} device={jax.devices()[0].device_kind} "
          f"peak={peak / 1e12:.0f} TFLOP/s (bf16)")
    print(f"FLOPs/update: {total_flops / 1e9:.2f} GFLOP "
          f"(XLA cost analysis {xla_flops / 1e9:.2f}"
          + (f" + Pallas analytic {pallas_flops / 1e9:.2f}" if pallas_flops
             else "") + ")")

    sec = a.seconds_per_update
    if a.time > 0:
        trainer.train_chunk(a.time)  # compile + warmup (same chunk length
        # as the timed chunk — a different k would be a fresh program)
        t0 = time.perf_counter()
        trainer.train_chunk(a.time)
        sec = (time.perf_counter() - t0) / a.time
        print(f"measured: {sec * 1e3:.1f} ms/update over {a.time} updates")
    if sec > 0:
        util = flops_lib.mfu(total_flops, sec, peak)
        steps = cfg.n_workers * cfg.worker_steps / sec
        print(f"achieved: {total_flops / sec / 1e12:.3f} TFLOP/s  "
              f"MFU {util * 100:.2f}%  env-steps/s {steps:,.0f}")
        print(json.dumps({
            "config": os.path.basename(a.config),
            "compute_dtype": cfg.compute_dtype,
            "flops_per_update": total_flops, "seconds_per_update": sec,
            "mfu": util, "env_steps_per_second": steps,
            "backend": backend}))
    trainer.close()


if __name__ == "__main__":
    main()
