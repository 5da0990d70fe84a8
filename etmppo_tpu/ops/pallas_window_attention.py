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


def _bwd_kernel(w_ref, start_ref, n_ref, slo_ref,        # scalar prefetch
                q_ref, g_ref, mask_ref, pe_k_ref, pe_v_ref,
                tk_ref, tv_ref,                           # HBM timelines
                dtk_in_ref, dtv_in_ref,                   # aliased to outputs
                dq_ref, dtk_ref, dtv_ref, dpk_out, dpv_out,
                kb, vb, dk_acc, dv_acc, dpk_acc, dpv_acc, sems,
                *, TB: int, L: int, num_heads: int, embed_dim: int):
    del dtk_in_ref, dtv_in_ref  # same buffers as dtk_ref/dtv_ref
    """Backward: recompute probs from streamed K/V, then accumulate dK/dV
    into the (pre-zeroed, input-aliased) timeline-gradient buffers with
    read-modify-write DMAs.  Pallas TPU grids run sequentially on the core,
    so accumulation across programs is race-free; within a tile the samples
    are processed serially for the same reason."""
    i0 = pl.program_id(0) * TB
    H = num_heads
    D = embed_dim
    hd = D // H

    @pl.when(pl.program_id(0) == 0)
    def _():
        dpk_acc[:] = jnp.zeros_like(dpk_acc)
        dpv_acc[:] = jnp.zeros_like(dpv_acc)

    for i in range(TB):
        w = w_ref[i0 + i]
        st = start_ref[i0 + i]
        n = n_ref[i0 + i]
        slo = slo_ref[i0 + i]

        k_dma = pltpu.make_async_copy(
            tk_ref.at[w, pl.ds(st, L)], kb, sems.at[0])
        v_dma = pltpu.make_async_copy(
            tv_ref.at[w, pl.ds(st, L)], vb, sems.at[1])
        k_dma.start()
        v_dma.start()
        k_dma.wait()
        v_dma.wait()

        rows = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        valid = rows < n                                   # (L, 1)
        pe_k_rows = pe_k_ref[pl.ds(slo, L), :]
        pe_v_rows = pe_v_ref[pl.ds(slo, L), :]
        k = jnp.where(valid, kb[:], pe_k_rows).reshape(L, H, hd)
        v = jnp.where(valid, vb[:], pe_v_rows).reshape(L, H, hd)

        q = q_ref[i].reshape(H, hd)
        gout = g_ref[i].reshape(H, hd)
        mask = mask_ref[i]                                 # (L,)
        energy = jnp.einsum("hd,lhd->hl", q, k,
                            preferred_element_type=jnp.float32)
        energy = jnp.where(mask[None, :], energy, MASK_FILL)
        scale = 1.0 / np.sqrt(D)
        p = jax.nn.softmax(energy * scale, axis=-1)        # (H, L)

        dv_rows = jnp.einsum("hl,hd->lhd", p, gout)
        dp = jnp.einsum("hd,lhd->hl", gout, v)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        ds = jnp.where(mask[None, :], ds, 0.0)             # masked-fill VJP
        dq = jnp.einsum("hl,lhd->hd", ds, k)
        dk_rows = jnp.einsum("hl,hd->lhd", ds, q)

        dq_ref[i] = dq.reshape(D)
        dk_flat = dk_rows.reshape(L, D)
        dv_flat = dv_rows.reshape(L, D)

        # valid rows -> timeline grads (read-modify-write, sequential-safe)
        rd_k = pltpu.make_async_copy(
            dtk_ref.at[w, pl.ds(st, L)], dk_acc, sems.at[0])
        rd_v = pltpu.make_async_copy(
            dtv_ref.at[w, pl.ds(st, L)], dv_acc, sems.at[1])
        rd_k.start()
        rd_v.start()
        rd_k.wait()
        rd_v.wait()
        dk_acc[:] = dk_acc[:] + jnp.where(valid, dk_flat, 0.0)
        dv_acc[:] = dv_acc[:] + jnp.where(valid, dv_flat, 0.0)
        wr_k = pltpu.make_async_copy(
            dk_acc, dtk_ref.at[w, pl.ds(st, L)], sems.at[0])
        wr_v = pltpu.make_async_copy(
            dv_acc, dtv_ref.at[w, pl.ds(st, L)], sems.at[1])
        wr_k.start()
        wr_v.start()
        wr_k.wait()
        wr_v.wait()

        # invalid rows -> PE-table grads (VMEM accumulators)
        pk = dpk_acc[pl.ds(slo, L), :]
        pv = dpv_acc[pl.ds(slo, L), :]
        dpk_acc[pl.ds(slo, L), :] = pk + jnp.where(valid, 0.0, dk_flat)
        dpv_acc[pl.ds(slo, L), :] = pv + jnp.where(valid, 0.0, dv_flat)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        dpk_out[:] = dpk_acc[:]
        dpv_out[:] = dpv_acc[:]


def _pallas_backward(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                     n_valid, s_lo, mask, g, num_heads: int, tile: int = 8):
    B, D = q.shape
    L = mask.shape[1]
    P = pe_k.shape[0]
    TB = tile
    while B % TB != 0:
        TB //= 2
    dtk_init = jnp.zeros_like(timeline_k)
    dtv_init = jnp.zeros_like(timeline_v)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, D), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((TB, D), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # g
            pl.BlockSpec((TB, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pe_k
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pe_v
            pl.BlockSpec(memory_space=pl.ANY),       # timeline_k
            pl.BlockSpec(memory_space=pl.ANY),       # timeline_v
            pl.BlockSpec(memory_space=pl.ANY),       # dtk (aliased out)
            pl.BlockSpec(memory_space=pl.ANY),       # dtv (aliased out)
        ],
        out_specs=(
            pl.BlockSpec((TB, D), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # dq
            pl.BlockSpec(memory_space=pl.ANY),       # dtk
            pl.BlockSpec(memory_space=pl.ANY),       # dtv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dpe_k
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dpe_v
        ),
        scratch_shapes=[
            pltpu.VMEM((L, D), jnp.float32),         # kb
            pltpu.VMEM((L, D), jnp.float32),         # vb
            pltpu.VMEM((L, D), jnp.float32),         # dk rmw buffer
            pltpu.VMEM((L, D), jnp.float32),         # dv rmw buffer
            pltpu.VMEM((P, D), jnp.float32),         # dpe_k accumulator
            pltpu.VMEM((P, D), jnp.float32),         # dpe_v accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ])
    kernel = functools.partial(
        _bwd_kernel, TB=TB, L=L, num_heads=num_heads, embed_dim=D)
    dq, dtk, dtv, dpk, dpv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(timeline_k.shape, jnp.float32),
            jax.ShapeDtypeStruct(timeline_v.shape, jnp.float32),
            jax.ShapeDtypeStruct((P, D), jnp.float32),
            jax.ShapeDtypeStruct((P, D), jnp.float32),
        ),
        input_output_aliases={11: 1, 12: 2},  # dtk/dtv accumulate in place
        interpret=jax.default_backend() != "tpu",
    )(w_idx, start, n_valid, s_lo, q, g, mask, pe_k, pe_v,
      timeline_k, timeline_v, dtk_init, dtv_init)
    return dq, dtk, dtv, dpk, dpv


# Module-level switch: "xla" (default, battle-tested) or "pallas" (fully
# fused read-modify-write accumulation; validated in interpret mode).
BACKWARD_MODE = "xla"


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
    if BACKWARD_MODE == "pallas":
        dq, dtk, dtv, dpk, dpv = _pallas_backward(
            q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start, n_valid,
            s_lo, mask, g, num_heads)
    else:
        _, vjp = jax.vjp(
            lambda q_, tk, tv, pk, pv: xla_window_attention(
                q_, tk, tv, pk, pv, w_idx, start, n_valid, s_lo, mask,
                num_heads),
            q, timeline_k, timeline_v, pe_k, pe_v)
        dq, dtk, dtv, dpk, dpv = vjp(g)
    return (dq, dtk, dtv, dpk, dpv, None, None, None, None, None)


fused_window_attention.defvjp(_fwd, _bwd)
