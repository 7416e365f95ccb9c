"""Fused int8 self-attention decode kernel (Pallas/TPU).

One kernel per decoder layer handles the whole self-attention stage of
an incremental decode step: per-head int8 quantization of the new K/V
entry, attention of each beam row over its OWN flat int8 cache (scales
folded — no dequantized temporaries), and the new entry's contribution
merged in-softmax (so the caller's cache update can happen AFTER the
kernel with a single small ``dynamic_update_slice`` per tensor).

This replaces ~19 XLA ops per layer of the scan (quantize ops, einsum
attention, mask/scale folds, head split/merge reshapes) whose dispatch
overhead dominated the decode step (PERF_NOTES), and reads the cache in
a FLAT (len, D) int8 layout — the 5-D (len, H, 64) layout tile-pads in
HBM and relayouts at kernel boundaries.

Key formulation (head_dim 64, H heads, D = 64 H):

- ``Q_diag`` (HP, D): row h holds query head h's 64 values at its own
  merged-layout columns, built by masking a broadcast (no lane shifts):
  ``where(row == col // 64, q, 0)``.
- scores (HP, len) = Q_diag @ K_flatᵀ — ONE full-width MXU contraction
  computes every head's scores (off-head columns hit zeros).
- out_full (HP, D) = probs @ V_flat; the merged output selects row
  ``col // 64`` per column: ``sum_h where(row == col//64, out_full, 0)``.

Grid: (B,) over audios; each program processes the audio's K beam rows.
Scales live in (H, len) orientation (lane-aligned with the scores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttasr.ops.int4 import _nibble_decode

NEG_INF = float(np.finfo(np.float32).min)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "int4", "group", "interpret"))
def self_attn_step_int8(qkv, k8, ks, v8, vs, pad_len, slot, *,
                        n_heads: int, int4: bool = False,
                        group: int = 1, interpret: bool = False):
    """Fused quantize + int8-cache self-attention for one decode step.

    Args:
      qkv: (B, K, 3D) f32 — fused q/k/v projections, beam rows grouped
        per audio (K <= 8).  q = [:D], k_new = [D:2D], v_new = [2D:3D].
      k8/v8: (B, K, len, D) int8 flat caches; positions < ``slot`` are
        live (the new entry is NOT yet written — its contribution is
        merged in-kernel), positions < pad_len are prompt padding.
      ks/vs: (B, K, HP, len) f32 per-(slot, head) scales, head rows
        padded to HP = ceil(H/8)*8 (rows >= H are zero).
      pad_len: (B, K) int32.  slot: () int32 current write position.

    ``int4``: the caches are int4 LANE-packed (ttasr/ops/int4.py
    pack_int4_lanes): k8/v8 are (B, K, len, D/2) uint8, byte ``[.., c]``
    = col c | col c+D/2 << 4.  The kernel splits every D contraction
    into two D/2-column halves and sums (scores) or writes the two
    output halves separately (values) — no lane concatenates, which
    Mosaic cannot lower cheaply.  New entries quantize to the +/-7
    range and return packed (B, K, D/2) uint8.

    Returns (attn (B,K,D) f32 merged-head,
             k8_new (B,K,D) int8, ks_new (B,K,H) f32,
             v8_new (B,K,D) int8, vs_new (B,K,H) f32)
    — the caller writes the *_new rows into the caches at ``slot``.
    """
    b, k_rows, d3 = qkv.shape
    d = d3 // 3
    h = n_heads
    dh = d // h
    assert dh == 64, "kernel assumes head_dim 64"
    d2 = d // 2
    d_store = d2 if int4 else d
    assert k8.shape[3] == d_store, (k8.shape, d_store)
    lv = 7.0 if int4 else 127.0
    kv_dtype = jnp.uint8 if int4 else jnp.int8
    s_len = k8.shape[2]
    hp = ks.shape[2]
    assert hp == ((h + 7) // 8) * 8, (hp, h)
    qscale = dh ** -0.5
    # ``group`` audios per grid step: the greedy path calls this with
    # K=1 rows per audio, so without grouping a batch-48 decode runs 48
    # single-row programs per layer — per-program fixed cost dominates
    if b % group != 0:
        group = 1
    g = group

    slot_arr = jnp.asarray(slot, jnp.int32).reshape(1, 1)
    pad_arr = pad_len.astype(jnp.int32).reshape(b, k_rows)

    def kernel(slot_ref, pad_ref, qkv_ref, k_ref, ks_ref, v_ref, vs_ref,
               attn_ref, k8n_ref, ksn_ref, v8n_ref, vsn_ref):
        cur = slot_ref[0, 0]
        prog = pl.program_id(0)  # pad_ref is a whole-array SMEM input
        col_d = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
        head_of_col = col_d // dh                       # (1, D)
        row_hp = jax.lax.broadcasted_iota(jnp.int32, (hp, d), 0)
        diag_mask = row_hp == head_of_col              # (HP, D) broadcast
        head_of_col_k = jnp.broadcast_to(head_of_col, (k_rows, d))
        col_h_k = jax.lax.broadcasted_iota(jnp.int32, (k_rows, h), 1)
        # head selector matrices for the two tiny layout matmuls below
        seg_dh = (jax.lax.broadcasted_iota(jnp.int32, (d, h), 0) // dh
                  == jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
                  ).astype(jnp.float32)                # (D, H)
        hp_oh = (jax.lax.broadcasted_iota(jnp.int32, (hp, h), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (hp, h), 1)
                 ).astype(jnp.float32)                 # (HP, H)

        def quantize_rows(x):
            """(K, D) f32 -> int8 rows + per-head scales (col + lane
            layouts).  One full-width masked max per head covers ALL
            beam rows — the former per-(beam, head) scalar-max loop
            issued ~K times the serial VPU reduces and dominated the
            kernel's compute (PERF_NOTES.md)."""
            ax = jnp.abs(x)
            scale_cols = jnp.zeros((k_rows, d), jnp.float32)
            scale_heads = jnp.zeros((k_rows, h), jnp.float32)
            for hh in range(h):
                m = jnp.max(jnp.where(head_of_col_k == hh, ax, 0.0),
                            axis=1, keepdims=True)      # (K, 1)
                sc = jnp.maximum(m, 1e-8) / lv
                scale_cols = jnp.where(head_of_col_k == hh, sc, scale_cols)
                scale_heads = jnp.where(col_h_k == hh, sc, scale_heads)
            q8 = jnp.clip(jnp.round(x / scale_cols), -lv, lv)
            return q8.astype(jnp.int8), scale_cols, scale_heads

        def pack_rows(q8):
            """(K, D) int8 in [-7, 7] -> (K, D/2) uint8 lane-packed."""
            p = q8.astype(jnp.int32)
            return ((p[:, :d2] & 0xF)
                    | ((p[:, d2:] & 0xF) << 4)).astype(jnp.uint8)

        for a in range(g):  # audios in this grid step
            q_all = qkv_ref[a, :, :d] * qscale              # (K, D)
            k_new = qkv_ref[a, :, d : 2 * d]
            v_new = qkv_ref[a, :, 2 * d : 3 * d]
            k8a, ksc_cols, ksc_heads = quantize_rows(k_new)
            v8a, vsc_cols, vsc_heads = quantize_rows(v_new)
            if int4:
                k8n_ref[a] = pack_rows(k8a)
                v8n_ref[a] = pack_rows(v8a)
            else:
                k8n_ref[a] = k8a
                v8n_ref[a] = v8a
            ksn_ref[a] = ksc_heads
            vsn_ref[a] = vsc_heads

            # self-term dots for every (beam, head) at once: a segment-sum
            # matmul over the head-indicator matrix replaces K*H serial
            # multiply-reduce chains.  (A dot_general with N=1 trips a
            # Mosaic vector.broadcast verifier bug; N=H here avoids it.)
            # bf16-round the operands (as the MXU sees them when this entry
            # is later read from the cache), multiply/accumulate in f32
            prod_all = (q_all.astype(jnp.bfloat16).astype(jnp.float32)
                        * k8a.astype(jnp.float32))          # (K, D)
            d_self = jax.lax.dot_general(
                prod_all, seg_dh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                               # (K, H)
            s_self_all = d_self * ksc_heads                 # (K, H)

            for j in range(k_rows):
                # Q_diag: row hh = q's head-hh columns, zeros elsewhere
                qd = jnp.where(
                    diag_mask, jnp.broadcast_to(q_all[j : j + 1], (hp, d)), 0.0)
                qd = qd.astype(jnp.bfloat16)

                if int4:
                    # packed keys: score each D/2-column half and sum — the
                    # full-D contraction distributes over the column split
                    klo, khi = _nibble_decode(k_ref[a, j])   # (len, D/2) i32
                    scores = jax.lax.dot_general(
                        qd[:, :d2], klo.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        qd[:, d2:], khi.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                        # (HP, len)
                else:
                    keys = k_ref[a, j].astype(jnp.bfloat16)  # (len, D)
                    scores = jax.lax.dot_general(
                        qd, keys, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                        # (HP, len)
                row_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (hp, s_len), 0)
                col_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (hp, s_len), 1)
                scores = scores * ks_ref[a, j]               # (HP, len) scales
                valid = ((col_iota < cur) & (col_iota >= pad_ref[prog * g + a, j])
                         & (row_iota < h))
                scores = jnp.where(valid, scores, NEG_INF)

                # this beam's self scores, transposed from the (1, H) lane
                # layout to score-aligned (HP, 1) rows via the tiny selector
                # matmul (rows >= H get zero and never reach the merge)
                s_self = jax.lax.dot_general(
                    hp_oh, s_self_all[j : j + 1], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                            # (HP, 1)

                m = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), s_self)
                e = jnp.exp(scores - m)
                e_self = jnp.exp(s_self - m)
                denom = jnp.sum(e, axis=1, keepdims=True) + e_self
                probs = e / denom                            # (HP, len)
                p_self = e_self / denom                      # (HP, 1)

                probs_scaled = (probs * vs_ref[a, j]).astype(jnp.bfloat16)
                vq = (v8a[j : j + 1].astype(jnp.float32)
                      * vsc_cols[j : j + 1])                 # (1, D)
                if int4:
                    # value contraction is column-separable: compute and
                    # merge each packed half, write the two output slices
                    vlo, vhi = _nibble_decode(v_ref[a, j])   # (len, D/2) i32
                    out_lo = jax.lax.dot_general(
                        probs_scaled, vlo.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + p_self * vq[:, :d2]                  # (HP, D/2)
                    out_hi = jax.lax.dot_general(
                        probs_scaled, vhi.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + p_self * vq[:, d2:]
                    attn_ref[a, j : j + 1, :d2] = jnp.sum(
                        jnp.where(diag_mask[:, :d2], out_lo, 0.0),
                        axis=0, keepdims=True)
                    attn_ref[a, j : j + 1, d2:] = jnp.sum(
                        jnp.where(diag_mask[:, d2:], out_hi, 0.0),
                        axis=0, keepdims=True)
                else:
                    vals = v_ref[a, j].astype(jnp.bfloat16)  # (len, D)
                    out_full = jax.lax.dot_general(
                        probs_scaled, vals, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                        # (HP, D)
                    out_full = out_full + p_self * vq
                    merged = jnp.sum(
                        jnp.where(diag_mask, out_full, 0.0),
                        axis=0, keepdims=True,
                    )                                        # (1, D)
                    attn_ref[a, j : j + 1, :] = merged

    out = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # slot (1,1)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # pad (B,K)
            pl.BlockSpec((g, k_rows, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, s_len, d_store), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, k_rows, hp, s_len), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, k_rows, s_len, d_store), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, k_rows, hp, s_len), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((g, k_rows, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, d_store), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, d_store), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, h), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((b, k_rows, d_store), kv_dtype),
            jax.ShapeDtypeStruct((b, k_rows, h), jnp.float32),
            jax.ShapeDtypeStruct((b, k_rows, d_store), kv_dtype),
            jax.ShapeDtypeStruct((b, k_rows, h), jnp.float32),
        ),
        interpret=interpret,
    )(slot_arr, pad_arr, qkv, k8, ks, v8, vs)
    return out


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "int4", "group", "interpret"))
def self_attn_step_indirect_int8(qkv, k8, ks, v8, vs, anc, pad_len, slot, *,
                                 n_heads: int, int4: bool = False,
                                 group: int = 1, interpret: bool = False):
    """Ancestry-indirect variant of :func:`self_attn_step_int8` for beam
    search: the caches are NEVER physically reordered after a beam select.

    ``anc`` (B, K, len) int32 records, for beam row j and cache position
    t, WHICH physical row of the audio's K-row cache holds beam j's
    entry at t (beam_decode permutes anc rows — 74 KB — instead of the
    ~2 GB cache; PERF_NOTES.md round 3: the Pallas permuted-copy gather
    still cost 4.6 ms/step at batch 16).

    Formulation: all K beams' Q_diag matrices stack into ONE
    (K*HP, D) operand — K*HP ≈ 120 rows fills the MXU sublane tile that
    the per-beam (HP=24, D) matmuls left 80 % empty — and score every
    physical row r's keys: scores_r = Q_stack @ K_rᵀ.  Beam j's softmax
    sees position t of chunk r only where ``anc[j, t] == r``; invalid
    entries mask to -inf so their exp contributes an exact 0 — the
    result equals attending over a physically gathered cache up to fp
    summation order (the softmax denominator reduces per chunk).  The
    K× FLOP overhead lands on a unit that is ~95 % idle during decode.

    Args match self_attn_step_int8 plus ``anc`` (including ``int4`` —
    lane-packed caches, see there); returns the same 5-tuple.  The
    caller writes the *_new rows at (row j, slot) and sets
    ``anc[:, j, slot] = j``.
    """
    b, k_rows, d3 = qkv.shape
    d = d3 // 3
    h = n_heads
    dh = d // h
    assert dh == 64, "kernel assumes head_dim 64"
    d2 = d // 2
    d_store = d2 if int4 else d
    assert k8.shape[3] == d_store, (k8.shape, d_store)
    lv = 7.0 if int4 else 127.0
    kv_dtype = jnp.uint8 if int4 else jnp.int8
    s_len = k8.shape[2]
    hp = ks.shape[2]
    assert hp == ((h + 7) // 8) * 8, (hp, h)
    kh = k_rows * hp
    qscale = dh ** -0.5
    # ``group`` audios per grid step (like attnout_ln_q_cross_int8):
    # the per-program fixed cost (DMA setup per buffer, grid step
    # overhead) does not shrink with the tiny per-audio operands, so at
    # batch 48 halving the program count takes it off the step
    if b % group != 0:
        group = 1
    g = group

    slot_arr = jnp.asarray(slot, jnp.int32).reshape(1, 1)
    pad_arr = pad_len.astype(jnp.int32).reshape(b, k_rows)

    def kernel(slot_ref, pad_ref, qkv_ref, anc_ref, k_ref, ks_ref, v_ref,
               vs_ref, attn_ref, k8n_ref, ksn_ref, v8n_ref, vsn_ref):
        cur = slot_ref[0, 0]
        prog = pl.program_id(0)
        col_d = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
        head_of_col = col_d // dh                      # (1, D)
        head_of_col_k = jnp.broadcast_to(head_of_col, (k_rows, d))
        col_h_k = jax.lax.broadcasted_iota(jnp.int32, (k_rows, h), 1)
        seg_dh = (jax.lax.broadcasted_iota(jnp.int32, (d, h), 0) // dh
                  == jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
                  ).astype(jnp.float32)                # (D, H)
        hp_oh = (jax.lax.broadcasted_iota(jnp.int32, (hp, h), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (hp, h), 1)
                 ).astype(jnp.float32)                 # (HP, H)
        # stacked-row index helpers: row -> (beam = row // HP, head = row % HP)
        row_kh_d = jax.lax.broadcasted_iota(jnp.int32, (kh, d), 0)
        head_row_d = row_kh_d - (row_kh_d // hp) * hp  # (KH, D) row % HP
        diag_kh = head_row_d == head_of_col            # (KH, D)
        row_kh_1 = jax.lax.broadcasted_iota(jnp.int32, (kh, 1), 0)
        beam_row_1 = row_kh_1 // hp                    # (KH, 1)
        col_len = jax.lax.broadcasted_iota(jnp.int32, (kh, s_len), 1)
        row_kh_len = jax.lax.broadcasted_iota(jnp.int32, (kh, s_len), 0)
        head_row_len = row_kh_len - (row_kh_len // hp) * hp

        def quantize_rows(x):
            ax = jnp.abs(x)
            scale_cols = jnp.zeros((k_rows, d), jnp.float32)
            scale_heads = jnp.zeros((k_rows, h), jnp.float32)
            for hh in range(h):
                m = jnp.max(jnp.where(head_of_col_k == hh, ax, 0.0),
                            axis=1, keepdims=True)      # (K, 1)
                sc = jnp.maximum(m, 1e-8) / lv
                scale_cols = jnp.where(head_of_col_k == hh, sc, scale_cols)
                scale_heads = jnp.where(col_h_k == hh, sc, scale_heads)
            q8 = jnp.clip(jnp.round(x / scale_cols), -lv, lv)
            return q8.astype(jnp.int8), scale_cols, scale_heads

        def pack_rows(q8):
            """(K, D) int8 in [-7, 7] -> (K, D/2) uint8 lane-packed."""
            p = q8.astype(jnp.int32)
            return ((p[:, :d2] & 0xF)
                    | ((p[:, d2:] & 0xF) << 4)).astype(jnp.uint8)

        for a in range(g):  # audios in this grid step
            q_all = qkv_ref[a, :, :d] * qscale              # (K, D)
            k_new = qkv_ref[a, :, d : 2 * d]
            v_new = qkv_ref[a, :, 2 * d : 3 * d]
            k8a, ksc_cols, ksc_heads = quantize_rows(k_new)
            v8a, vsc_cols, vsc_heads = quantize_rows(v_new)
            if int4:
                k8n_ref[a] = pack_rows(k8a)
                v8n_ref[a] = pack_rows(v8a)
            else:
                k8n_ref[a] = k8a
                v8n_ref[a] = v8a
            ksn_ref[a] = ksc_heads
            vsn_ref[a] = vsc_heads

            # self-term dots for every (beam, head): see self_attn_step_int8
            prod_all = (q_all.astype(jnp.bfloat16).astype(jnp.float32)
                        * k8a.astype(jnp.float32))          # (K, D)
            d_self = jax.lax.dot_general(
                prod_all, seg_dh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                               # (K, H)
            s_self_all = d_self * ksc_heads                 # (K, H)
            # score-row layout (KH, 1): beam j's heads at rows j*HP..j*HP+H-1
            s_self_rows = jnp.concatenate(
                [jax.lax.dot_general(
                    hp_oh, s_self_all[j : j + 1], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ) for j in range(k_rows)], axis=0)          # (KH, 1)

            # stacked Q_diag for ALL beams: rows j*HP+hh hold q_j's head-hh
            # columns (beam-major repeat, then the diagonal head mask)
            q_rep = jnp.broadcast_to(
                q_all[:, None, :], (k_rows, hp, d)).reshape(kh, d)
            q_stack = jnp.where(diag_kh, q_rep, 0.0).astype(jnp.bfloat16)

            # beam-major repeats of the ancestry map and per-beam pad lens
            anc_rep = jnp.broadcast_to(
                anc_ref[a][:, None, :], (k_rows, hp, s_len)).reshape(kh, s_len)
            pad_row = jnp.zeros((kh, 1), jnp.int32)
            for j in range(k_rows):
                pad_row = jnp.where(beam_row_1 == j, pad_ref[prog * g + a, j], pad_row)
            base_valid = ((col_len < cur) & (col_len >= pad_row)
                          & (head_row_len < h))             # (KH, len)

            # pass 1: score every physical row's keys (one chunk per row)
            chunk_scores = []
            for r in range(k_rows):
                if int4:
                    klo, khi = _nibble_decode(k_ref[a, r])  # (len, D/2) i32
                    sc = jax.lax.dot_general(
                        q_stack[:, :d2], klo.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        q_stack[:, d2:], khi.astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                       # (KH, len)
                else:
                    keys = k_ref[a, r].astype(jnp.bfloat16)  # (len, D)
                    sc = jax.lax.dot_general(
                        q_stack, keys, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                       # (KH, len)
                ks_rep = jnp.broadcast_to(
                    ks_ref[a, r][None], (k_rows, hp, s_len)).reshape(kh, s_len)
                sc = sc * ks_rep
                sc = jnp.where(base_valid & (anc_rep == r), sc, NEG_INF)
                chunk_scores.append(sc)

            m = s_self_rows
            for sc in chunk_scores:
                m = jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True))
            e_self = jnp.exp(s_self_rows - m)
            denom = e_self
            e_chunks = []
            for sc in chunk_scores:
                e = jnp.exp(sc - m)
                e_chunks.append(e)
                denom = denom + jnp.sum(e, axis=1, keepdims=True)

            # pass 2: accumulate each chunk's value contribution
            p_self = e_self / denom                         # (KH, 1)
            vq_rep = jnp.broadcast_to(
                (v8a.astype(jnp.float32) * vsc_cols)[:, None, :],
                (k_rows, hp, d)).reshape(kh, d)
            if int4:
                # column-separable: accumulate each packed half, merge per
                # half, write the two attn_ref lane slices (no concatenate)
                acc_lo = jnp.zeros((kh, d2), jnp.float32)
                acc_hi = jnp.zeros((kh, d2), jnp.float32)
                for r in range(k_rows):
                    vs_rep = jnp.broadcast_to(
                        vs_ref[a, r][None],
                        (k_rows, hp, s_len)).reshape(kh, s_len)
                    probs_scaled = (e_chunks[r] / denom
                                    * vs_rep).astype(jnp.bfloat16)
                    vlo, vhi = _nibble_decode(v_ref[a, r])  # (len, D/2) i32
                    acc_lo = acc_lo + jax.lax.dot_general(
                        probs_scaled, vlo.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc_hi = acc_hi + jax.lax.dot_general(
                        probs_scaled, vhi.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                acc_lo = acc_lo + p_self * vq_rep[:, :d2]
                acc_hi = acc_hi + p_self * vq_rep[:, d2:]
                attn_ref[a, :, :d2] = jnp.sum(
                    jnp.where(diag_kh[:, :d2],
                              acc_lo, 0.0).reshape(k_rows, hp, d2), axis=1)
                attn_ref[a, :, d2:] = jnp.sum(
                    jnp.where(diag_kh[:, d2:],
                              acc_hi, 0.0).reshape(k_rows, hp, d2), axis=1)
            else:
                acc = jnp.zeros((kh, d), jnp.float32)
                for r in range(k_rows):
                    vs_rep = jnp.broadcast_to(
                        vs_ref[a, r][None],
                        (k_rows, hp, s_len)).reshape(kh, s_len)
                    probs_scaled = (e_chunks[r] / denom
                                    * vs_rep).astype(jnp.bfloat16)
                    vals = v_ref[a, r].astype(jnp.bfloat16)  # (len, D)
                    acc = acc + jax.lax.dot_general(
                        probs_scaled, vals, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                acc = acc + p_self * vq_rep

                merged = jnp.sum(
                    jnp.where(diag_kh, acc, 0.0).reshape(k_rows, hp, d), axis=1)
                attn_ref[a] = merged                        # (K, D)

    out = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # slot (1,1)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # pad (B,K)
            pl.BlockSpec((g, k_rows, d3), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, s_len), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, s_len, d_store), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, k_rows, hp, s_len), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, k_rows, s_len, d_store), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((g, k_rows, hp, s_len), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((g, k_rows, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, d_store), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, d_store), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_rows, h), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k_rows, d), jnp.float32),
            jax.ShapeDtypeStruct((b, k_rows, d_store), kv_dtype),
            jax.ShapeDtypeStruct((b, k_rows, h), jnp.float32),
            jax.ShapeDtypeStruct((b, k_rows, d_store), kv_dtype),
            jax.ShapeDtypeStruct((b, k_rows, h), jnp.float32),
        ),
        interpret=interpret,
    )(slot_arr, pad_arr, qkv, anc.astype(jnp.int32), k8, ks, v8, vs)
    return out
