"""FLOP accounting (utils/flops.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from etmppo_tpu.utils.flops import (compiled_flops, device_peak_flops, mfu,
                                    window_attention_flops)


def test_window_attention_flops():
    # fwd = 4 B L D (QK^T + PV), bwd = 8 B L D (dV, dP, dQ, dK).
    assert window_attention_flops(2048, 64, 384) == 4 * 2048 * 64 * 384
    assert window_attention_flops(2048, 64, 384, backward=True) == (
        8 * 2048 * 64 * 384)


def test_mfu():
    assert mfu(1e12, 1.0, peak_flops=2e12) == 0.5
    assert mfu(0.0, 1.0, peak_flops=1e12) == 0.0


def test_device_peak_flops_known_kind():
    assert device_peak_flops() > 0


def test_compiled_flops_counts_matmul():
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 64), jnp.float32)
    fn = jax.jit(lambda a, b: a @ b)
    flops = compiled_flops(fn, a, b)
    # XLA counts a matmul as 2 m n k FLOPs.
    assert flops == 2 * 128 * 256 * 64
