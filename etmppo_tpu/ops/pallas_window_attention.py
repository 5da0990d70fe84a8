"""Pallas fused episodic-memory window attention (TPU).

Computes, per sample b, the reference's masked window attention
(transformer.py:59-75 semantics: -1e20 masked-fill then softmax over
energy / sqrt(embed_dim)) directly from the per-worker K/V *timeline* in HBM:

    K_b = [timeline_k[w_b, start_b : start_b + n_b] | pe_k[s_lo_b + n_b : s_lo_b + L]]
    out_b = softmax(mask_fill(q_b K_b^T) / sqrt(D)) V_b

Because valid window rows are one contiguous timeline run and the invalid
suffix is a contiguous PE-table run (ops/memory_index.py TimelineSources),
each sample needs exactly TWO bulk DMAs (K and V) of L rows — the XLA path
instead materializes gathered (B, L, D) K/V arrays in HBM (write + re-read).
The kernel overlaps the next sample's DMAs with the previous wait and never
materializes the gathered windows.

The public entry ``fused_window_attention`` is a ``jax.custom_vjp``: forward
runs the Pallas kernel; backward re-derives gradients through the XLA
reference formulation (identical math), so training with the kernel is
exact.  Falls back to the XLA path on non-TPU backends.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_FILL = -1e20


def _attention_math(q, k, v, mask, num_heads: int, embed_dim: int):
    """Shared QK/softmax/PV math on assembled windows.
    q: (TB, D); k/v: (TB, L, D); mask: (TB, L) bool."""
    TB, D = q.shape
    L = k.shape[1]
    head = embed_dim // num_heads
    qh = q.reshape(TB, num_heads, head)
    kh = k.reshape(TB, L, num_heads, head)
    vh = v.reshape(TB, L, num_heads, head)
    energy = jnp.einsum("bhd,blhd->bhl", qh, kh,
                        preferred_element_type=jnp.float32)
    energy = jnp.where(mask[:, None, :], energy, MASK_FILL)
    attention = jax.nn.softmax(energy / np.sqrt(embed_dim), axis=-1)
    out = jnp.einsum("bhl,blhd->bhd", attention, vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(TB, D)


def xla_window_attention(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                         n_valid, s_lo, mask, num_heads: int):
    """Reference XLA formulation (also the custom-vjp backward path)."""
    B, D = q.shape
    L = mask.shape[1]
    rows = start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    k_run = timeline_k[w_idx[:, None], rows]          # (B, L, D)
    v_run = timeline_v[w_idx[:, None], rows]
    pe_rows = s_lo[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = (jnp.arange(L, dtype=jnp.int32)[None, :]
             < n_valid[:, None])[:, :, None]
    k = jnp.where(valid, k_run, pe_k[pe_rows])
    v = jnp.where(valid, v_run, pe_v[pe_rows])
    return _attention_math(q, k, v, mask, num_heads, D)


def _kernel(w_ref, start_ref, n_ref, slo_ref,            # scalar prefetch
            q_ref, mask_ref, pe_k_ref, pe_v_ref,         # VMEM inputs
            tk_ref, tv_ref,                              # HBM timelines
            out_ref,                                     # VMEM output
            kb, vb, sems,                                # scratch
            *, TB: int, L: int, num_heads: int, embed_dim: int):
    i0 = pl.program_id(0) * TB

    def dma(i):
        w = w_ref[i0 + i]
        st = start_ref[i0 + i]
        return (pltpu.make_async_copy(
                    tk_ref.at[w, pl.ds(st, L)], kb.at[i], sems.at[i, 0]),
                pltpu.make_async_copy(
                    tv_ref.at[w, pl.ds(st, L)], vb.at[i], sems.at[i, 1]))

    for i in range(TB):
        dk, dv = dma(i)
        dk.start()
        dv.start()
    for i in range(TB):
        dk, dv = dma(i)
        dk.wait()
        dv.wait()

    # Assemble windows: timeline rows where j < n_valid, PE rows otherwise.
    rows = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    n_vec = jnp.stack([n_ref[i0 + i] for i in range(TB)])[:, None]
    pe_k_rows = jnp.stack(
        [pe_k_ref[pl.ds(slo_ref[i0 + i], L), :] for i in range(TB)])
    pe_v_rows = jnp.stack(
        [pe_v_ref[pl.ds(slo_ref[i0 + i], L), :] for i in range(TB)])
    valid = (rows < n_vec)[:, :, None]
    k = jnp.where(valid, kb[:], pe_k_rows)
    v = jnp.where(valid, vb[:], pe_v_rows)

    out_ref[:] = _attention_math(
        q_ref[:], k, v, mask_ref[:], num_heads, embed_dim)


def _pallas_forward(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                    n_valid, s_lo, mask, num_heads: int, tile: int = 8):
    B, D = q.shape
    L = mask.shape[1]
    TB = tile
    while B % TB != 0:
        TB //= 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, D), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pe_k (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pe_v (full)
            pl.BlockSpec(memory_space=pl.ANY),       # timeline_k (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # timeline_v (HBM)
        ],
        out_specs=pl.BlockSpec((TB, D), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TB, L, D), jnp.float32),
            pltpu.VMEM((TB, L, D), jnp.float32),
            pltpu.SemaphoreType.DMA((TB, 2)),
        ])
    kernel = functools.partial(
        _kernel, TB=TB, L=L, num_heads=num_heads, embed_dim=D)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(w_idx, start, n_valid, s_lo, q, mask, pe_k, pe_v,
      timeline_k, timeline_v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_window_attention(q, timeline_k, timeline_v, pe_k, pe_v, w_idx,
                           start, n_valid, s_lo, mask, num_heads):
    """q: (B, D) projected queries; timeline_k/v: (W, S, D); pe_k/v: (P, D);
    w_idx/start/n_valid/s_lo: (B,) int32; mask: (B, L) bool. -> (B, D)."""
    return _pallas_forward(q, timeline_k, timeline_v, pe_k, pe_v, w_idx,
                           start, n_valid, s_lo, mask, num_heads)


def _fwd(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start, n_valid, s_lo,
         mask, num_heads):
    out = _pallas_forward(q, timeline_k, timeline_v, pe_k, pe_v, w_idx,
                          start, n_valid, s_lo, mask, num_heads)
    return out, (q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                 n_valid, s_lo, mask)


def _bwd(num_heads, residuals, g):
    (q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start, n_valid, s_lo,
     mask) = residuals
    _, vjp = jax.vjp(
        lambda q_, tk, tv, pk, pv: xla_window_attention(
            q_, tk, tv, pk, pv, w_idx, start, n_valid, s_lo, mask, num_heads),
        q, timeline_k, timeline_v, pe_k, pe_v)
    dq, dtk, dtv, dpk, dpv = vjp(g)
    return (dq, dtk, dtv, dpk, dpv, None, None, None, None, None)


fused_window_attention.defvjp(_fwd, _bwd)
