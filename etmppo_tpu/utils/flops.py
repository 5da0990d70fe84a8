"""FLOP accounting + MFU (model FLOP utilization).

The reference reports no utilization numbers at all; env-steps/s alone cannot
say whether a program is fast *for the chip* (SURVEY.md §6 north-star).  This
module provides the missing yardstick:

* ``compiled_flops``: per-execution FLOPs of a jitted program from XLA's own
  cost analysis (backend-agnostic; counts the HLO actually compiled).
* ``window_attention_flops``: analytic count for the episodic window-attention
  op, used for the Pallas kernels whose in-kernel FLOPs XLA cannot see.
* ``mfu``: achieved FLOP/s as a fraction of the chip's peak.

Peak reference: TPU v5e ≈ 197 TFLOP/s bf16 (MXU).  We report MFU against the
bf16 peak even for f32 programs — the number then reads "how far from the
chip's speed-of-light", which is the honest denominator for kernels that
should be (or become) bf16.
"""
from __future__ import annotations

from typing import Optional

import jax

# Chip peak matmul throughput in FLOP/s (bf16 MXU).
PEAK_FLOPS = {
    "tpu v5e": 197e12,
    "tpu v5 lite": 197e12,   # jax device_kind spelling
    "tpu v4": 275e12,
    "tpu v5p": 459e12,
    "tpu v6e": 918e12,
    "cpu": 1e11,             # nominal, for smoke-testing the plumbing
}


def device_peak_flops(device: Optional[jax.Device] = None) -> float:
    """Peak FLOP/s for the given (default: first) device; falls back to the
    v5e number for unknown TPU kinds so MFU stays comparable."""
    device = device or jax.devices()[0]
    kind = device.device_kind.lower()
    for key, peak in PEAK_FLOPS.items():
        if key in kind:
            return peak
    return PEAK_FLOPS["cpu"] if device.platform == "cpu" else PEAK_FLOPS["tpu v5e"]


def compiled_flops(jitted_fn, *args, **kwargs) -> float:
    """FLOPs of one execution of ``jitted_fn(*args)`` per XLA cost analysis.

    Counts the compiled HLO (fusions included).  Pallas kernels appear as
    opaque custom calls with zero FLOPs — add ``window_attention_flops``
    for those explicitly.
    """
    compiled = jitted_fn.lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns one dict per device
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


def window_attention_flops(B: int, L: int, D: int, backward: bool = False
                           ) -> float:
    """Analytic FLOPs for one episodic window-attention application:
    B queries (one per sample), each attending over L memory slots of model
    width D (multi-head split does not change the total).

    Forward: scores Q·K^T (2·B·L·D) + mix P·V (2·B·L·D) = 4·B·L·D.
    Backward: dV, dP, dQ, dK each 2·B·L·D -> 8·B·L·D (softmax/elementwise
    terms are O(B·L) and ignored, consistent with XLA's matmul-only counts).
    """
    return (8.0 if backward else 4.0) * B * L * D


def mfu(flops_per_step: float, seconds_per_step: float,
        peak_flops: Optional[float] = None) -> float:
    """Achieved fraction of peak: (FLOPs/step / s/step) / peak FLOP/s."""
    if peak_flops is None:
        peak_flops = device_peak_flops()
    return flops_per_step / max(seconds_per_step, 1e-12) / peak_flops
