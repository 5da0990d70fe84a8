"""On-device parity + timing for the Pallas fused window-attention kernel.

Compares fused_window_attention (Pallas fwd, and Pallas vs XLA bwd) against
xla_window_attention at a given config scale.  Used to validate each (L, D)
shape on real TPU before enabling `use_pallas_attention`/`pallas_backward`
on that config (see BENCHMARKS.md "Pallas fused window-attention kernel").

    python benchmarks/pallas_kernel_bench.py --B 2048 --L 96 --S 512 --D 256 --H 4
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from etmppo_tpu.ops import pallas_window_attention as pwa


def make_case(B, W, S, P, L, D, seed=0):
    np_rng = np.random.default_rng(seed)
    q = np_rng.normal(size=(B, D)).astype(np.float32)
    tk = np_rng.normal(size=(W, S, D)).astype(np.float32)
    tv = np_rng.normal(size=(W, S, D)).astype(np.float32)
    pe_k = np_rng.normal(size=(P, D)).astype(np.float32)
    pe_v = np_rng.normal(size=(P, D)).astype(np.float32)
    w_idx = np_rng.integers(0, W, B).astype(np.int32)
    start = np_rng.integers(0, S - L, B).astype(np.int32)
    n_valid = np_rng.integers(1, L + 1, B).astype(np.int32)
    s_lo = np_rng.integers(0, max(P - L, 0) + 1, B).astype(np.int32)
    mask = np_rng.random((B, L)) < 0.7
    mask[0, :] = False  # the all-masked (episode step 0) quirk row
    return tuple(map(jnp.asarray, (q, tk, tv, pe_k, pe_v, w_idx, start,
                                   n_valid, s_lo, mask)))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=2048)
    ap.add_argument("--W", type=int, default=8)
    ap.add_argument("--S", type=int, default=512)
    ap.add_argument("--P", type=int, default=128)
    ap.add_argument("--L", type=int, default=96)
    ap.add_argument("--D", type=int, default=256)
    ap.add_argument("--H", type=int, default=4)
    ap.add_argument("--grouped", action="store_true",
                    help="Also validate + time the grouped kernels")
    a = ap.parse_args()
    args = make_case(a.B, a.W, a.S, a.P, a.L, a.D)
    H = a.H
    print(f"backend={jax.default_backend()} B={a.B} W={a.W} S={a.S} "
          f"P={a.P} L={a.L} D={a.D} H={H}")

    fwd_pallas = jax.jit(lambda *xs: pwa.fused_window_attention(*xs, H))
    fwd_xla = jax.jit(lambda *xs: pwa.xla_window_attention(*xs, num_heads=H))
    out_p = np.asarray(fwd_pallas(*args))
    out_x = np.asarray(fwd_xla(*args))
    fwd_err = np.abs(out_p - out_x).max()
    print(f"fwd max abs err: {fwd_err:.3e}")
    assert fwd_err < 1e-4, "FORWARD PARITY FAILED"

    def loss_fused(q, tk, tv, pk, pv):
        return jnp.sum(jnp.sin(
            pwa.fused_window_attention(q, tk, tv, pk, pv, *args[5:], H)))

    def loss_xla(q, tk, tv, pk, pv):
        return jnp.sum(jnp.sin(
            pwa.xla_window_attention(q, tk, tv, pk, pv, *args[5:],
                                     num_heads=H)))

    grad_xla_fn = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))
    grads_x = grad_xla_fn(*args[:5])

    old = pwa.BACKWARD_MODE
    try:
        pwa.BACKWARD_MODE = "pallas"
        grad_pallas_fn = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))
        grads_p = grad_pallas_fn(*args[:5])
    finally:
        pwa.BACKWARD_MODE = old
    bwd_err = max(np.abs(np.asarray(gp) - np.asarray(gx)).max()
                  for gp, gx in zip(grads_p, grads_x))
    print(f"bwd max abs err (pallas vs xla grads): {bwd_err:.3e}")
    assert bwd_err < 5e-4, "BACKWARD PARITY FAILED"

    t_fwd_p = timeit(fwd_pallas, *args)
    t_fwd_x = timeit(fwd_xla, *args)
    t_bwd_x = timeit(grad_xla_fn, *args[:5])
    try:
        pwa.BACKWARD_MODE = "pallas"
        grad_pallas_fn2 = jax.jit(jax.grad(
            lambda *xs: loss_fused(*xs), argnums=(0, 1, 2, 3, 4)))
        t_bwd_p = timeit(grad_pallas_fn2, *args[:5])
    finally:
        pwa.BACKWARD_MODE = old
    print(f"fwd  pallas {t_fwd_p:7.2f} ms   xla {t_fwd_x:7.2f} ms   "
          f"speedup {t_fwd_x / t_fwd_p:.2f}x")
    print(f"bwd  pallas {t_bwd_p:7.2f} ms   xla {t_bwd_x:7.2f} ms   "
          f"speedup {t_bwd_x / t_bwd_p:.2f}x")

    # FLOP utilization: analytic matmul count (XLA cannot see inside the
    # Pallas custom call) against the chip's bf16 peak.  Window attention is
    # HBM-bandwidth-bound at these shapes (arithmetic intensity ~ L), so a
    # low %-of-peak is expected — the bandwidth column is the binding one.
    from etmppo_tpu.utils.flops import (device_peak_flops, mfu,
                                        window_attention_flops)
    peak = device_peak_flops()
    f_fwd = window_attention_flops(a.B, a.L, a.D)
    f_bwd = f_fwd + window_attention_flops(a.B, a.L, a.D, backward=True)
    # Bytes moved (f32): K+V windows in, outputs out — the dominant streams.
    bytes_fwd = 4.0 * (2 * a.B * a.L * a.D + a.B * a.D)
    for name, fl, by, t_ms in (("fwd", f_fwd, bytes_fwd, t_fwd_p),
                               ("bwd", f_bwd, 3 * bytes_fwd, t_bwd_p)):
        s = t_ms / 1e3
        print(f"{name}  {fl / 1e9:6.2f} GFLOP  {fl / s / 1e12:6.3f} TFLOP/s  "
              f"MFU {mfu(fl, s, peak) * 100:5.2f}%   "
              f"~{by / s / 1e9:6.1f} GB/s HBM")

    if a.grouped:
        fwd_grouped = jax.jit(
            lambda *xs: pwa._pallas_forward_grouped(*xs, H))
        out_g = np.asarray(fwd_grouped(*args))
        g_err = np.abs(out_g - out_x).max()
        print(f"grouped fwd max abs err: {g_err:.3e}")
        assert g_err < 1e-4, "GROUPED FORWARD PARITY FAILED"

        old_g, old_b = pwa.GROUPED_MODE, pwa.BACKWARD_MODE
        try:
            pwa.GROUPED_MODE = True
            pwa.BACKWARD_MODE = "pallas"
            grad_grouped_fn = jax.jit(jax.grad(
                lambda *xs: loss_fused(*xs), argnums=(0, 1, 2, 3, 4)))
            grads_g = grad_grouped_fn(*args[:5])
        finally:
            pwa.GROUPED_MODE, pwa.BACKWARD_MODE = old_g, old_b
        gb_err = max(np.abs(np.asarray(gg) - np.asarray(gx)).max()
                     for gg, gx in zip(grads_g, grads_x))
        print(f"grouped bwd max abs err: {gb_err:.3e}")
        assert gb_err < 5e-4, "GROUPED BACKWARD PARITY FAILED"

        t_fwd_g = timeit(fwd_grouped, *args)
        try:
            pwa.GROUPED_MODE = True
            pwa.BACKWARD_MODE = "pallas"
            t_bwd_g = timeit(grad_grouped_fn, *args[:5])
        finally:
            pwa.GROUPED_MODE, pwa.BACKWARD_MODE = old_g, old_b
        print(f"fwd  grouped {t_fwd_g:7.2f} ms  vs per-sample {t_fwd_p:7.2f} "
              f"ms ({t_fwd_p / t_fwd_g:.2f}x) vs xla {t_fwd_x:7.2f} ms "
              f"({t_fwd_x / t_fwd_g:.2f}x)")
        print(f"bwd  grouped {t_bwd_g:7.2f} ms  vs per-sample {t_bwd_p:7.2f} "
              f"ms ({t_bwd_p / t_bwd_g:.2f}x) vs xla {t_bwd_x:7.2f} ms "
              f"({t_bwd_x / t_bwd_g:.2f}x)")


if __name__ == "__main__":
    main()
