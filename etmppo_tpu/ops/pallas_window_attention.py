"""Pallas fused episodic-memory window attention (TPU).

Computes, per sample b, the reference's masked window attention
(transformer.py:59-75 semantics: -1e20 masked-fill then softmax over
energy / sqrt(embed_dim)) directly from the per-worker K/V *timeline* in HBM:

    K_b = [timeline_k[w_b, start_b : start_b + n_b] | pe_k[s_lo_b + n_b : s_lo_b + L]]
    out_b = softmax(mask_fill(q_b K_b^T) / sqrt(D)) V_b

Because valid window rows are one contiguous timeline run and the invalid
suffix is a contiguous PE-table run (ops/memory_index.py TimelineSources),
each sample needs exactly TWO bulk DMAs (K and V) of ~L rows — the XLA path
instead materializes gathered (B, L, D) K/V arrays in HBM (write + re-read).
The kernel overlaps the next sample's DMAs with the previous wait and never
materializes the gathered windows.

Mosaic (real-TPU) constraints shape the implementation — all verified
on a v5e chip, not just in interpret mode:
  * dot_general with >1 batch dim fails to lower -> per-sample 2-D matmuls
    with a block-diagonal head trick (`_head_masks`): one (L, D) @ (D, H)
    matmul yields every head's scores at once because each head's dims are
    zeroed for the other heads.
  * DMA row starts must be provably 8-aligned and row counts multiples of 8
    -> fetch the 8-aligned superset window of Lp = round_up(L, 8) + 16 rows
    starting at 8*(st//8) (timelines are padded by PAD rows), then realign
    with selection-matrix matmuls built from iota comparisons (MXU work,
    no unaligned vector loads anywhere).  Gradient scatter back into the
    timeline/PE tables uses the transposed selection matrices.
  * Vector loads/stores at dynamic sublane offsets are illegal -> the PE
    window fetch and the PE-gradient accumulation are selection matmuls
    against the full (P, D) tables held in VMEM.
  * i1 vectors cannot gain a minor dim -> masks widen to i32 before reshape.
  * Slice minor dims must be 128-multiples -> embed dims not divisible by
    128 (the PocMemory-scale configs) fall back to the XLA path on TPU.

The public entry ``fused_window_attention`` is a ``jax.custom_vjp``: forward
runs the Pallas kernel; backward either re-derives gradients through the XLA
reference formulation (identical math) or runs the fused Pallas backward
kernel (``BACKWARD_MODE = "pallas"``), whose timeline-gradient accumulation
is race-free because Pallas TPU grids execute sequentially on the core.
Falls back to the XLA path on non-TPU backends.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_FILL = -1e20

# Timeline rows of padding appended before the kernel so the 8-aligned
# superset DMA window never reads past the end (start <= S - L, so
# 8*(start//8) + Lp <= S - L + L + 16 = S + PAD).
PAD = 16


def _lp(L: int) -> int:
    return ((L + 7) // 8) * 8 + PAD


def _attention_math(q, k, v, mask, num_heads: int, embed_dim: int):
    """Shared QK/softmax/PV math on assembled windows (XLA path).
    q: (TB, D); k/v: (TB, L, D); mask: (TB, L) bool."""
    TB, D = q.shape
    L = k.shape[1]
    head = embed_dim // num_heads
    qh = q.reshape(TB, num_heads, head)
    kh = k.reshape(TB, L, num_heads, head)
    vh = v.reshape(TB, L, num_heads, head)
    energy = jnp.einsum("bhd,blhd->bhl", qh, kh,
                        preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    energy = jnp.where(mask[:, None, :], energy, MASK_FILL)
    attention = jax.nn.softmax(energy / np.sqrt(embed_dim), axis=-1)
    out = jnp.einsum("bhl,blhd->bhd", attention, vh,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
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


def _supported_on_tpu(embed_dim: int) -> bool:
    """Mosaic requires slice minor dims aligned to the 128-lane tile;
    sub-128 embed dims (e.g. the PocMemory 64-dim config) fall back to the
    XLA formulation on real TPUs (interpret mode has no such constraint)."""
    return embed_dim % 128 == 0 or jax.default_backend() != "tpu"


def _head_masks(D: int, H: int):
    """(D, H) and (H, D) 0/1 block masks: entry is 1 iff dim d belongs to
    head h.  Lets all heads' scores come out of ONE 2-D matmul per sample
    (Mosaic's dot lowering rejects the multi-batch-dim einsum formulation)."""
    hd = D // H
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0)
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    mask_dh = (d_iota // hd == h_iota).astype(jnp.float32)      # (D, H)
    d_iota_t = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1)
    h_iota_t = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    mask_hd = (d_iota_t // hd == h_iota_t).astype(jnp.float32)  # (H, D)
    return mask_dh, mask_hd


def _selection_mats(L: int, Lp: int, P: int, delta, n, slo):
    """Window-assembly selection matrices for one sample.

    sel_t (L, Lp): row j picks superset-buffer row delta + j when j < n
    (valid timeline rows); sel_p (L, P): row j picks PE-table row slo + j
    when j >= n.  `K_window = sel_t @ buf + sel_p @ pe_table` — realignment
    + gather + valid/invalid mixing as two MXU matmuls, because Mosaic
    forbids unaligned dynamic vector loads.
    """
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (L, Lp), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (L, Lp), 1)
    sel_t = ((cols_t == rows_t + delta) & (rows_t < n)).astype(jnp.float32)
    rows_p = jax.lax.broadcasted_iota(jnp.int32, (L, P), 0)
    cols_p = jax.lax.broadcasted_iota(jnp.int32, (L, P), 1)
    sel_p = ((cols_p == rows_p + slo) & (rows_p >= n)).astype(jnp.float32)
    return sel_t, sel_p


def _softmax_lh(energy, mask_col, embed_dim: int):
    """Column softmax of (L, H) scores over the L axis with the reference's
    mask-fill-then-scale order; all-masked columns come out uniform."""
    energy = jnp.where(mask_col, energy, MASK_FILL)
    scaled = energy / np.sqrt(embed_dim)
    scaled = scaled - jnp.max(scaled, axis=0, keepdims=True)
    e = jnp.exp(scaled)
    return e / jnp.sum(e, axis=0, keepdims=True)


def _kernel(w_ref, st8_ref, delta_ref, n_ref, slo_ref,   # scalar prefetch
            q_ref, mask_ref, pe_k_ref, pe_v_ref,         # VMEM inputs
            tk_ref, tv_ref,                              # HBM timelines
            out_ref,                                     # VMEM output
            kb, vb, sems,                                # scratch
            *, TB: int, L: int, Lp: int, num_heads: int, embed_dim: int):
    i0 = pl.program_id(0) * TB
    D = embed_dim
    P = pe_k_ref.shape[0]

    def dma(i):
        w = w_ref[i0 + i]
        st = st8_ref[i0 + i] * 8        # *8 in-kernel: provably 8-aligned
        return (pltpu.make_async_copy(
                    tk_ref.at[w, pl.ds(st, Lp)], kb.at[i], sems.at[i, 0]),
                pltpu.make_async_copy(
                    tv_ref.at[w, pl.ds(st, Lp)], vb.at[i], sems.at[i, 1]))

    for i in range(TB):
        for d in dma(i):
            d.start()

    mask_dh, mask_hd = _head_masks(D, num_heads)
    for i in range(TB):
        for d in dma(i):
            d.wait()
        sel_t, sel_p = _selection_mats(
            L, Lp, P, delta_ref[i0 + i], n_ref[i0 + i], slo_ref[i0 + i])
        k = (jnp.dot(sel_t, kb[i], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sel_p, pe_k_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST))
        v = (jnp.dot(sel_t, vb[i], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sel_p, pe_v_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST))

        # i1 vectors can't gain a minor dim in Mosaic; widen to i32 first.
        mask_col = mask_ref[i, :].astype(jnp.int32).reshape(L, 1) != 0
        q_row = q_ref[i, :].reshape(1, D)
        qbd = mask_dh * q_row.reshape(D, 1)                      # (D, H)
        energy = jnp.dot(k, qbd, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        p = _softmax_lh(energy, mask_col, D)                     # (L, H)
        p_full = jnp.dot(p, mask_hd, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        out_ref[i, :] = jnp.sum(p_full * v, axis=0)


def _pad_timelines(timeline_k, timeline_v):
    pad = ((0, 0), (0, PAD), (0, 0))
    return jnp.pad(timeline_k, pad), jnp.pad(timeline_v, pad)


def _pallas_forward(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                    n_valid, s_lo, mask, num_heads: int, tile: int = 8):
    if not _supported_on_tpu(q.shape[1]):
        return xla_window_attention(q, timeline_k, timeline_v, pe_k, pe_v,
                                    w_idx, start, n_valid, s_lo, mask,
                                    num_heads)
    B, D = q.shape
    L = mask.shape[1]
    Lp = _lp(L)
    TB = tile
    while B % TB != 0:
        TB //= 2
    tk_p, tv_p = _pad_timelines(timeline_k, timeline_v)
    st8 = start // 8
    delta = start - st8 * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
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
            pltpu.VMEM((TB, Lp, D), jnp.float32),
            pltpu.VMEM((TB, Lp, D), jnp.float32),
            pltpu.SemaphoreType.DMA((TB, 2)),
        ])
    kernel = functools.partial(
        _kernel, TB=TB, L=L, Lp=Lp, num_heads=num_heads, embed_dim=D)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(w_idx, st8, delta, n_valid, s_lo, q, mask, pe_k, pe_v, tk_p, tv_p)


def _bwd_kernel(w_ref, st8_ref, delta_ref, n_ref, slo_ref,  # scalar prefetch
                q_ref, g_ref, mask_ref, pe_k_ref, pe_v_ref,
                tk_ref, tv_ref,                           # HBM timelines
                dtk_in_ref, dtv_in_ref,                   # aliased to outputs
                dq_ref, dtk_ref, dtv_ref, dpk_out, dpv_out,
                kb, vb, dk_acc, dv_acc, dpk_acc, dpv_acc, sems,
                *, TB: int, L: int, Lp: int, num_heads: int, embed_dim: int):
    """Backward: recompute probs from streamed K/V, then accumulate dK/dV
    into the (pre-zeroed, input-aliased) timeline-gradient buffers with
    read-modify-write DMAs.  Pallas TPU grids run sequentially on the core,
    so accumulation across programs is race-free; within a tile the samples
    are processed serially for the same reason.  Scatter back to unaligned
    row offsets is the transposed selection matmul."""
    del dtk_in_ref, dtv_in_ref  # same buffers as dtk_ref/dtv_ref
    i0 = pl.program_id(0) * TB
    D = embed_dim
    P = pe_k_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dpk_acc[:] = jnp.zeros_like(dpk_acc)
        dpv_acc[:] = jnp.zeros_like(dpv_acc)

    mask_dh, mask_hd = _head_masks(D, num_heads)
    for i in range(TB):
        w = w_ref[i0 + i]
        st = st8_ref[i0 + i] * 8
        delta = delta_ref[i0 + i]
        n = n_ref[i0 + i]
        slo = slo_ref[i0 + i]

        k_dma = pltpu.make_async_copy(
            tk_ref.at[w, pl.ds(st, Lp)], kb, sems.at[0])
        v_dma = pltpu.make_async_copy(
            tv_ref.at[w, pl.ds(st, Lp)], vb, sems.at[1])
        k_dma.start()
        v_dma.start()
        k_dma.wait()
        v_dma.wait()

        sel_t, sel_p = _selection_mats(L, Lp, P, delta, n, slo)
        k = (jnp.dot(sel_t, kb[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sel_p, pe_k_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST))
        v = (jnp.dot(sel_t, vb[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sel_p, pe_v_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST))

        # Same block-diagonal head trick as the forward kernel: all per-head
        # contractions become 2-D matmuls against the 0/1 head masks.
        q_row = q_ref[i, :].reshape(1, D)
        g_row = g_ref[i, :].reshape(1, D)
        mask_col = mask_ref[i, :].astype(jnp.int32).reshape(L, 1) != 0
        qbd = mask_dh * q_row.reshape(D, 1)                       # (D, H)
        energy = jnp.dot(k, qbd, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        p = _softmax_lh(energy, mask_col, D)                      # (L, H)

        p_full = jnp.dot(p, mask_hd, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        dv_flat = p_full * g_row                                  # (L, D)
        dp = jnp.dot(v * g_row, mask_dh,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)          # (L, H)
        scale = 1.0 / np.sqrt(D)
        ds = p * (dp - jnp.sum(dp * p, axis=0, keepdims=True)) * scale
        ds = jnp.where(mask_col, ds, 0.0)                         # mask VJP
        ds_full = jnp.dot(ds, mask_hd,
                          preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)     # (L, D)
        dq_ref[i, :] = jnp.sum(ds_full * k, axis=0)
        dk_flat = ds_full * q_row                                 # (L, D)

        # valid rows -> timeline grads: scatter into superset-window layout
        # via sel_t^T (places row j at delta + j, zeroing invalid rows),
        # then RMW at the 8-aligned start (sequential-grid safe).
        dk_sup = jnp.dot(sel_t.T, dk_flat, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        dv_sup = jnp.dot(sel_t.T, dv_flat, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        rd_k = pltpu.make_async_copy(
            dtk_ref.at[w, pl.ds(st, Lp)], dk_acc, sems.at[0])
        rd_v = pltpu.make_async_copy(
            dtv_ref.at[w, pl.ds(st, Lp)], dv_acc, sems.at[1])
        rd_k.start()
        rd_v.start()
        rd_k.wait()
        rd_v.wait()
        dk_acc[:] = dk_acc[:] + dk_sup
        dv_acc[:] = dv_acc[:] + dv_sup
        wr_k = pltpu.make_async_copy(
            dk_acc, dtk_ref.at[w, pl.ds(st, Lp)], sems.at[0])
        wr_v = pltpu.make_async_copy(
            dv_acc, dtv_ref.at[w, pl.ds(st, Lp)], sems.at[1])
        wr_k.start()
        wr_v.start()
        wr_k.wait()
        wr_v.wait()

        # invalid rows -> PE-table grads via sel_p^T (full-table VMEM adds,
        # no unaligned slicing).
        dpk_acc[:] = dpk_acc[:] + jnp.dot(
            sel_p.T, dk_flat, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        dpv_acc[:] = dpv_acc[:] + jnp.dot(
            sel_p.T, dv_flat, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        dpk_out[:] = dpk_acc[:]
        dpv_out[:] = dpv_acc[:]


def _pallas_backward(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                     n_valid, s_lo, mask, g, num_heads: int, tile: int = 8):
    B, D = q.shape
    L = mask.shape[1]
    Lp = _lp(L)
    P = pe_k.shape[0]
    TB = tile
    while B % TB != 0:
        TB //= 2
    tk_p, tv_p = _pad_timelines(timeline_k, timeline_v)
    st8 = start // 8
    delta = start - st8 * 8
    dtk_init = jnp.zeros_like(tk_p)
    dtv_init = jnp.zeros_like(tv_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
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
            pltpu.VMEM((Lp, D), jnp.float32),        # kb
            pltpu.VMEM((Lp, D), jnp.float32),        # vb
            pltpu.VMEM((Lp, D), jnp.float32),        # dk rmw buffer
            pltpu.VMEM((Lp, D), jnp.float32),        # dv rmw buffer
            pltpu.VMEM((P, D), jnp.float32),         # dpe_k accumulator
            pltpu.VMEM((P, D), jnp.float32),         # dpe_v accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ])
    kernel = functools.partial(
        _bwd_kernel, TB=TB, L=L, Lp=Lp, num_heads=num_heads, embed_dim=D)
    dq, dtk, dtv, dpk, dpv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(tk_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(tv_p.shape, jnp.float32),
            jax.ShapeDtypeStruct((P, D), jnp.float32),
            jax.ShapeDtypeStruct((P, D), jnp.float32),
        ),
        input_output_aliases={12: 1, 13: 2},  # dtk/dtv accumulate in place
        interpret=jax.default_backend() != "tpu",
    )(w_idx, st8, delta, n_valid, s_lo, q, g, mask, pe_k, pe_v,
      tk_p, tv_p, dtk_init, dtv_init)
    S = timeline_k.shape[1]
    return dq, dtk[:, :S], dtv[:, :S], dpk, dpv


# --- Grouped (sorted-by-worker) kernels ------------------------------------
#
# The per-sample kernels above pay 2 (fwd) / 6 (bwd) HBM DMA round trips per
# sample; with B=2048 minibatches that latency dominates (the kernels run at
# ~10-25% of speed-of-light).  The grouped variants sort the minibatch by
# worker index (a stable argsort outside the kernel; outputs are scattered
# back), so each worker's K/V *timeline* is DMA'd from HBM into VMEM exactly
# once per kernel invocation (W total loads instead of B), window reads become
# VMEM-local dynamic slices at provably-8-aligned offsets, and the backward's
# dK/dV accumulate into VMEM-resident per-worker buffers flushed to HBM once
# per worker (write-only — sorted runs are contiguous, so no RMW).
# VMEM budget at the largest shipped scale (MortarMayhem: Sp=1158, D=384):
# 2 timelines + 2 grad accumulators ~= 7.1 MB + PE tables/accs ~= 3 MB.


def _grouped_kernel(w_ref, st8_ref, delta_ref, n_ref, slo_ref,  # prefetch
                    q_ref, mask_ref, pe_k_ref, pe_v_ref,        # VMEM
                    tk_ref, tv_ref,                             # HBM
                    out_ref,                                    # VMEM
                    tl_k, tl_v, cur_ref, sems,                  # scratch
                    *, TB: int, L: int, Lp: int, num_heads: int,
                    embed_dim: int):
    i0 = pl.program_id(0) * TB
    D = embed_dim
    P = pe_k_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        cur_ref[0] = -1

    mask_dh, mask_hd = _head_masks(D, num_heads)
    for i in range(TB):
        w = w_ref[i0 + i]

        @pl.when(w != cur_ref[0])
        def _():
            k_dma = pltpu.make_async_copy(tk_ref.at[w], tl_k, sems.at[0])
            v_dma = pltpu.make_async_copy(tv_ref.at[w], tl_v, sems.at[1])
            k_dma.start()
            v_dma.start()
            k_dma.wait()
            v_dma.wait()
            cur_ref[0] = w

        st = st8_ref[i0 + i] * 8
        kb = tl_k[pl.ds(st, Lp)]
        vb = tl_v[pl.ds(st, Lp)]
        sel_t, sel_p = _selection_mats(
            L, Lp, P, delta_ref[i0 + i], n_ref[i0 + i], slo_ref[i0 + i])
        k = (jnp.dot(sel_t, kb, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sel_p, pe_k_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST))
        v = (jnp.dot(sel_t, vb, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sel_p, pe_v_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST))

        mask_col = mask_ref[i, :].astype(jnp.int32).reshape(L, 1) != 0
        q_row = q_ref[i, :].reshape(1, D)
        qbd = mask_dh * q_row.reshape(D, 1)
        energy = jnp.dot(k, qbd, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        p = _softmax_lh(energy, mask_col, D)
        p_full = jnp.dot(p, mask_hd, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        out_ref[i, :] = jnp.sum(p_full * v, axis=0)


def _grouped_bwd_kernel(w_ref, st8_ref, delta_ref, n_ref, slo_ref,
                        q_ref, g_ref, mask_ref, pe_k_ref, pe_v_ref,
                        tk_ref, tv_ref,                    # HBM timelines
                        dtk_in_ref, dtv_in_ref,            # aliased outputs
                        dq_ref, dtk_ref, dtv_ref, dpk_out, dpv_out,
                        tl_k, tl_v, acc_dk, acc_dv, dpk_acc, dpv_acc,
                        cur_ref, sems,
                        *, TB: int, L: int, Lp: int, num_heads: int,
                        embed_dim: int):
    """Grouped backward: per-worker VMEM grad accumulation, one write-only
    flush per worker (sorted runs are contiguous; the sequential TPU grid
    makes flush-before-next-load race-free)."""
    del dtk_in_ref, dtv_in_ref
    i0 = pl.program_id(0) * TB
    D = embed_dim
    P = pe_k_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        cur_ref[0] = -1
        dpk_acc[:] = jnp.zeros_like(dpk_acc)
        dpv_acc[:] = jnp.zeros_like(dpv_acc)

    def flush():
        wr_k = pltpu.make_async_copy(
            acc_dk, dtk_ref.at[cur_ref[0]], sems.at[0])
        wr_v = pltpu.make_async_copy(
            acc_dv, dtv_ref.at[cur_ref[0]], sems.at[1])
        wr_k.start()
        wr_v.start()
        wr_k.wait()
        wr_v.wait()

    mask_dh, mask_hd = _head_masks(D, num_heads)
    for i in range(TB):
        w = w_ref[i0 + i]

        @pl.when(w != cur_ref[0])
        def _():
            @pl.when(cur_ref[0] >= 0)
            def _():
                flush()
            k_dma = pltpu.make_async_copy(tk_ref.at[w], tl_k, sems.at[0])
            v_dma = pltpu.make_async_copy(tv_ref.at[w], tl_v, sems.at[1])
            k_dma.start()
            v_dma.start()
            k_dma.wait()
            v_dma.wait()
            acc_dk[:] = jnp.zeros_like(acc_dk)
            acc_dv[:] = jnp.zeros_like(acc_dv)
            cur_ref[0] = w

        st = st8_ref[i0 + i] * 8
        kb = tl_k[pl.ds(st, Lp)]
        vb = tl_v[pl.ds(st, Lp)]
        sel_t, sel_p = _selection_mats(
            L, Lp, P, delta_ref[i0 + i], n_ref[i0 + i], slo_ref[i0 + i])
        k = (jnp.dot(sel_t, kb, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sel_p, pe_k_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST))
        v = (jnp.dot(sel_t, vb, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sel_p, pe_v_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST))

        q_row = q_ref[i, :].reshape(1, D)
        g_row = g_ref[i, :].reshape(1, D)
        mask_col = mask_ref[i, :].astype(jnp.int32).reshape(L, 1) != 0
        qbd = mask_dh * q_row.reshape(D, 1)
        energy = jnp.dot(k, qbd, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        p = _softmax_lh(energy, mask_col, D)

        p_full = jnp.dot(p, mask_hd, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        dv_flat = p_full * g_row
        dp = jnp.dot(v * g_row, mask_dh, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        scale = 1.0 / np.sqrt(D)
        ds = p * (dp - jnp.sum(dp * p, axis=0, keepdims=True)) * scale
        ds = jnp.where(mask_col, ds, 0.0)
        ds_full = jnp.dot(ds, mask_hd, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        dq_ref[i, :] = jnp.sum(ds_full * k, axis=0)
        dk_flat = ds_full * q_row

        dk_sup = jnp.dot(sel_t.T, dk_flat, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        dv_sup = jnp.dot(sel_t.T, dv_flat, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        acc_dk[pl.ds(st, Lp)] = acc_dk[pl.ds(st, Lp)] + dk_sup
        acc_dv[pl.ds(st, Lp)] = acc_dv[pl.ds(st, Lp)] + dv_sup

        dpk_acc[:] = dpk_acc[:] + jnp.dot(
            sel_p.T, dk_flat, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        dpv_acc[:] = dpv_acc[:] + jnp.dot(
            sel_p.T, dv_flat, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        flush()
        dpk_out[:] = dpk_acc[:]
        dpv_out[:] = dpv_acc[:]


def _sorted_by_worker(w_idx, *arrays):
    order = jnp.argsort(w_idx, stable=True).astype(jnp.int32)
    return order, [a[order] for a in arrays]


def _pallas_forward_grouped(q, timeline_k, timeline_v, pe_k, pe_v, w_idx,
                            start, n_valid, s_lo, mask, num_heads: int,
                            tile: int = 8):
    B, D = q.shape
    L = mask.shape[1]
    Lp = _lp(L)
    TB = tile
    while B % TB != 0:
        TB //= 2
    tk_p, tv_p = _pad_timelines(timeline_k, timeline_v)
    Sp = tk_p.shape[1]
    order, (w_s, start_s, n_s, slo_s, q_s, mask_s) = _sorted_by_worker(
        w_idx, w_idx, start, n_valid, s_lo, q, mask)
    st8 = start_s // 8
    delta = start_s - st8 * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, D), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # q
            pl.BlockSpec((TB, L), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pe_k
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pe_v
            pl.BlockSpec(memory_space=pl.ANY),       # timeline_k
            pl.BlockSpec(memory_space=pl.ANY),       # timeline_v
        ],
        out_specs=pl.BlockSpec((TB, D), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Sp, D), jnp.float32),        # tl_k
            pltpu.VMEM((Sp, D), jnp.float32),        # tl_v
            pltpu.SMEM((1,), jnp.int32),             # cur worker
            pltpu.SemaphoreType.DMA((2,)),
        ])
    kernel = functools.partial(
        _grouped_kernel, TB=TB, L=L, Lp=Lp, num_heads=num_heads, embed_dim=D)
    out_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(w_s, st8, delta, n_s, slo_s, q_s, mask_s, pe_k, pe_v, tk_p, tv_p)
    return jnp.zeros_like(out_s).at[order].set(out_s)


def _pallas_backward_grouped(q, timeline_k, timeline_v, pe_k, pe_v, w_idx,
                             start, n_valid, s_lo, mask, g, num_heads: int,
                             tile: int = 8):
    B, D = q.shape
    L = mask.shape[1]
    Lp = _lp(L)
    P = pe_k.shape[0]
    TB = tile
    while B % TB != 0:
        TB //= 2
    tk_p, tv_p = _pad_timelines(timeline_k, timeline_v)
    Sp = tk_p.shape[1]
    order, (w_s, start_s, n_s, slo_s, q_s, mask_s, g_s) = _sorted_by_worker(
        w_idx, w_idx, start, n_valid, s_lo, q, mask, g)
    st8 = start_s // 8
    delta = start_s - st8 * 8
    dtk_init = jnp.zeros_like(tk_p)
    dtv_init = jnp.zeros_like(tv_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
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
            pltpu.VMEM((Sp, D), jnp.float32),        # tl_k
            pltpu.VMEM((Sp, D), jnp.float32),        # tl_v
            pltpu.VMEM((Sp, D), jnp.float32),        # acc_dk
            pltpu.VMEM((Sp, D), jnp.float32),        # acc_dv
            pltpu.VMEM((P, D), jnp.float32),         # dpe_k accumulator
            pltpu.VMEM((P, D), jnp.float32),         # dpe_v accumulator
            pltpu.SMEM((1,), jnp.int32),             # cur worker
            pltpu.SemaphoreType.DMA((2,)),
        ])
    kernel = functools.partial(
        _grouped_bwd_kernel, TB=TB, L=L, Lp=Lp, num_heads=num_heads,
        embed_dim=D)
    dq_s, dtk, dtv, dpk, dpv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(tk_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(tv_p.shape, jnp.float32),
            jax.ShapeDtypeStruct((P, D), jnp.float32),
            jax.ShapeDtypeStruct((P, D), jnp.float32),
        ),
        input_output_aliases={12: 1, 13: 2},
        interpret=jax.default_backend() != "tpu",
    )(w_s, st8, delta, n_s, slo_s, q_s, g_s, mask_s, pe_k, pe_v,
      tk_p, tv_p, dtk_init, dtv_init)
    dq = jnp.zeros_like(dq_s).at[order].set(dq_s)
    S = timeline_k.shape[1]
    return dq, dtk[:, :S], dtv[:, :S], dpk, dpv


# Use the grouped (sorted-by-worker, VMEM-timeline) kernels instead of the
# per-sample-DMA kernels.  Semantics identical (parity-tested both modes).
# Measured on v5e at the MysteryPath scale (B=2048, W=32, L=96, S=512, D=256):
# grouped is only 1.01x fwd / 1.06x bwd over the per-sample kernels — the
# per-sample DMAs already overlap enough to hide HBM latency — so the simpler
# per-sample kernels stay the default.  Re-evaluate with
# `python benchmarks/pallas_kernel_bench.py --grouped` if shapes change.
GROUPED_MODE = False

# Module-level switch: "xla" (default, battle-tested) or "pallas" (fully
# fused read-modify-write accumulation).
BACKWARD_MODE = "xla"


def _forward_dispatch(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                      n_valid, s_lo, mask, num_heads):
    if not _supported_on_tpu(q.shape[1]):
        return xla_window_attention(q, timeline_k, timeline_v, pe_k, pe_v,
                                    w_idx, start, n_valid, s_lo, mask,
                                    num_heads)
    impl = _pallas_forward_grouped if GROUPED_MODE else _pallas_forward
    return impl(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                n_valid, s_lo, mask, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_window_attention(q, timeline_k, timeline_v, pe_k, pe_v, w_idx,
                           start, n_valid, s_lo, mask, num_heads):
    """q: (B, D) projected queries; timeline_k/v: (W, S, D); pe_k/v: (P, D);
    w_idx/start/n_valid/s_lo: (B,) int32; mask: (B, L) bool. -> (B, D)."""
    return _forward_dispatch(q, timeline_k, timeline_v, pe_k, pe_v, w_idx,
                             start, n_valid, s_lo, mask, num_heads)


def _fwd(q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start, n_valid, s_lo,
         mask, num_heads):
    out = _forward_dispatch(q, timeline_k, timeline_v, pe_k, pe_v, w_idx,
                            start, n_valid, s_lo, mask, num_heads)
    return out, (q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start,
                 n_valid, s_lo, mask)


def _bwd(num_heads, residuals, g):
    (q, timeline_k, timeline_v, pe_k, pe_v, w_idx, start, n_valid, s_lo,
     mask) = residuals
    if BACKWARD_MODE == "pallas" and _supported_on_tpu(q.shape[1]):
        bwd_impl = (_pallas_backward_grouped if GROUPED_MODE
                    else _pallas_backward)
        dq, dtk, dtv, dpk, dpv = bwd_impl(
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
