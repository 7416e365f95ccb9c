"""Fused int8 decoder-block kernels (Pallas/TPU) around the attentions.

Together with :mod:`ttasr.ops.decoder_mlp_pallas` these cover every
weight matmul of a Whisper decoder layer in incremental decoding, with
int8 weights converted to bf16 **inside VMEM** (plain XLA hoists the
convert out of the token loop — PERF_NOTES.md) and whole sub-blocks
fused into single kernels (the 32-layer scan's per-op dispatch is the
other half of the decode gap).

Kernels:
- :func:`qkv_int8_fused`     — ln1(x) @ W_qkv + b  (one (D, 3D) matmul)
- :func:`attnout_ln_q_fused` — x' = x + attn @ Wo + bo;
                               qc = lnc(x') @ Wq_c + bq_c; returns both.
- :func:`attnout_ln_q_cross_int8` — the above PLUS the beam-grouped
  cross-attention over the int8 cross-KV cache, one grid step per
  audio: the int8 K/V stream converts in VMEM and the cross output
  never takes the (B, P, 16, 128) detour of the standalone kernel
  (whose q/out re-layouts ate its margin, PERF_NOTES.md).
- :func:`matmul_int8_partial` — (x @ W) * s with NO bias/residual: the
  row-parallel building block for tensor-parallel v2 (ttasr.parallel.tp
  splits Wo/Wo_c/W2 rows over the model axis; shards psum the partials).
- :func:`ln_q_cross_int8` — attnout_ln_q_cross_int8 minus the wo@attn
  front half: takes the (already psummed) residual stream and runs
  lnc + local cross-q + int8 cross-attention.  The TP-v2 counterpart,
  where the wo projection happens row-parallel BEFORE the collective.

Row counts must be multiples of 8 (pad outside; padding rows are junk
but cheap next to the weight streams).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ttasr.ops.int4 import unpack_int4_block


def _ln_f32(xv, s_ref, b_ref):
    mean = jnp.mean(xv, axis=-1, keepdims=True)
    var = jnp.mean((xv - mean) ** 2, axis=-1, keepdims=True)
    return (xv - mean) * jax.lax.rsqrt(var + 1e-5) * s_ref[:] + b_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def qkv_int8_fused(x, ln_s, ln_b, wq, ws, b, *, interpret: bool = False):
    """x: (R, D); wq: (D, M) int8; ws: (1, M) f32; b: (M,).
    Returns ln1(x) @ W * s + b as (R, M) f32."""
    r, d = x.shape
    m = wq.shape[1]
    ln_s2 = ln_s.reshape(1, d).astype(jnp.float32)
    ln_b2 = ln_b.reshape(1, d).astype(jnp.float32)
    ws2 = ws.reshape(1, m).astype(jnp.float32)
    b2 = b.reshape(1, m).astype(jnp.float32)

    def kernel(x_ref, s_ref, bb_ref, w_ref, sc_ref, bias_ref, out_ref):
        xv = x_ref[:].astype(jnp.float32)
        ln = _ln_f32(xv, s_ref, bb_ref).astype(jnp.bfloat16)
        out = jnp.dot(ln, w_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        out_ref[:] = out * sc_ref[:] + bias_ref[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, m), jnp.float32),
        interpret=interpret,
    )(x, ln_s2, ln_b2, wq, ws2, b2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attnout_ln_q_fused(x, attn, wo_q, wo_s, bo, lnc_s, lnc_b,
                       wqc_q, wqc_s, bqc, *, interpret: bool = False):
    """x: (R, D) residual stream; attn: (R, D) merged attention output.

    Computes ``x' = x + (attn @ Wo) * s_o + b_o`` and
    ``qc = lnc(x') @ Wq_c * s_qc + b_qc`` in one kernel.
    Returns (x' (R, D) f32, qc (R, DC) f32) — DC = Wq_c's output width,
    which is D on one chip and D/shards under tensor parallelism
    (ttasr.parallel.tp: the cross-q projection is column-split).
    """
    r, d = x.shape
    dc = wqc_q.shape[-1]
    wo_s2 = wo_s.reshape(1, d).astype(jnp.float32)
    bo2 = bo.reshape(1, d).astype(jnp.float32)
    lnc_s2 = lnc_s.reshape(1, d).astype(jnp.float32)
    lnc_b2 = lnc_b.reshape(1, d).astype(jnp.float32)
    wqc_s2 = wqc_s.reshape(1, dc).astype(jnp.float32)
    bqc2 = bqc.reshape(1, dc).astype(jnp.float32)

    def kernel(x_ref, a_ref, wo_ref, wos_ref, bo_ref, ls_ref, lb_ref,
               wq_ref, wqs_ref, bq_ref, xo_ref, qc_ref):
        a = a_ref[:].astype(jnp.bfloat16)
        proj = jnp.dot(a, wo_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        xn = x_ref[:].astype(jnp.float32) + proj * wos_ref[:] + bo_ref[:]
        xo_ref[:] = xn
        ln = _ln_f32(xn, ls_ref, lb_ref).astype(jnp.bfloat16)
        qc = jnp.dot(ln, wq_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        qc_ref[:] = qc * wqs_ref[:] + bq_ref[:]

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, d), jnp.float32),
            jax.ShapeDtypeStruct((r, dc), jnp.float32),
        ),
        interpret=interpret,
    )(x, attn, wo_q, wo_s2, bo2, lnc_s2, lnc_b2, wqc_q, wqc_s2, bqc2)


K_PAD = 8  # beam rows per audio padded to the 8-sublane tile


def _cross_pairs_loop(qc_all, k_ref, ks_ref, v_ref, vs_ref, cross_ref, *,
                      g, k_pad, s, s_real, n_pairs, dh, packed):
    """Head-pair int8 cross-attention over a grid step's ``g`` audios.

    Shared by :func:`attnout_ln_q_cross_int8` and :func:`ln_q_cross_int8`
    (the TP-v2 variant) — identical math, so the two kernels cannot
    drift.  ``qc_all``: (g * k_pad, DC) f32 pre-scaled queries."""
    col_s = jax.lax.broadcasted_iota(jnp.int32, (2 * k_pad, s), 1)
    valid = col_s < s_real
    top_rows = jax.lax.broadcasted_iota(
        jnp.int32, (2 * k_pad, s), 0) < k_pad
    col128 = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 2 * dh), 1)

    def pair_scales(ref, gi, p):
        even = jnp.broadcast_to(ref[gi, 2 * p : 2 * p + 1, :],
                                (2 * k_pad, s))
        odd = jnp.broadcast_to(ref[gi, 2 * p + 1 : 2 * p + 2, :],
                               (2 * k_pad, s))
        return jnp.where(top_rows, even, odd)

    def load_pair(ref, gi, c0):
        if packed:
            return unpack_int4_block(
                ref[gi, :, c0 : c0 + 2 * dh]).astype(jnp.bfloat16)
        return ref[gi, :, c0 : c0 + 2 * dh].astype(jnp.bfloat16)

    for gi in range(g):
        qc = qc_all[gi * k_pad : (gi + 1) * k_pad]
        for p in range(n_pairs):
            c0 = p * 2 * dh
            k_pair = load_pair(k_ref, gi, c0)
            v_pair = load_pair(v_ref, gi, c0)
            q_cols = qc[:, c0 : c0 + 2 * dh]              # (8, 128)
            # block-diagonal (16, 128): rows 0..7 even head, 8..15 odd
            q_pair = jnp.concatenate(
                [jnp.where(col128 < dh, q_cols, 0.0),
                 jnp.where(col128 >= dh, q_cols, 0.0)], axis=0
            ).astype(jnp.bfloat16)
            raw = jax.lax.dot_general(
                q_pair, k_pair, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (16, S)
            scores = jnp.where(
                valid, raw * pair_scales(ks_ref, gi, p),
                np.finfo(np.float32).min)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = (probs * pair_scales(vs_ref, gi, p)
                     ).astype(jnp.bfloat16)
            out_pair = jax.lax.dot_general(
                probs, v_pair, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # (16, 128)
            # merged-head layout: cols 0:64 from the even-head rows,
            # cols 64:128 from the odd-head rows (lane select)
            merged = jnp.where(col128 < dh, out_pair[:k_pad],
                               out_pair[k_pad:])
            cross_ref[gi, :, c0 : c0 + 2 * dh] = merged


@functools.partial(jax.jit,
                   static_argnames=("s_real", "group", "interpret"))
def attnout_ln_q_cross_int8(x, attn, wo_q, wo_s, bo, lnc_s, lnc_b,
                            wqc_q, wqc_s, bqc, ck8, cks, cv8, cvs,
                            *, s_real: int, group: int = 1,
                            interpret: bool = False):
    """Self-attn out-proj + residual + lnc + cross-q + int8 cross-attention.

    Per audio i (grid step i):
        x'  = x[i] + (attn[i] @ Wo) * s_o + b_o
        qc  = lnc(x') @ Wq_c * s_qc + b_qc
        out = softmax(qc Kᵀ · ks / sqrt(dh)) · vs @ V        (per head)

    x, attn: (B, K, D) f32 — beam rows grouped per audio (K <= 8; Mosaic
    pads sub-8 sublane tiles internally, so no host-side padding).
    ck8/cv8: (B, S, D) int8 cross-KV (S a multiple of 8, real slots
    ``s_real``), or (B, S/2, D) uint8 nibble-packed int4
    (ttasr/ops/int4.py — detected via dtype).  cks/cvs: (B, H, S) f32
    per-(head, slot) scales.  Weights int8 with (1, D) f32 col scales.
    Returns (x' (B, K, D) f32, cross (B, K, D) f32 merged-head).

    Head pairs (head_dim 64) keep every matmul 128-lane aligned: the two
    heads' queries sit block-diagonally in a (16, 128) tile so one
    (16,128)@(128,S) dot scores both heads with no cross terms, and the
    pair output folds back to merged-head layout with a lane select
    (no lane-offset concats — Mosaic can't lower those).

    ``group`` > 1 processes that many audios per grid step: the two
    weight matmuls run once over all ``group * K`` rows (an (8, D) row
    panel leaves the 128-row MXU tile ~94 % empty — the per-program
    weight cost does not shrink with rows) and the per-program fixed
    cost amortizes.  VMEM-bound: group 2 only fits the int4-packed
    cache (int8 blocks double-buffer past the ~16 MB budget).
    """
    b, k_pad, d = x.shape
    packed = ck8.dtype == jnp.uint8
    s_rows = ck8.shape[1]                 # stored rows (S/2 when packed)
    s = 2 * s_rows if packed else s_rows  # logical source slots
    h = cks.shape[1]
    # cross width DC = h * 64: equals the residual width D on one chip;
    # under tensor parallelism the shard carries h/shards heads, so its
    # cross-q / cross-KV operands are DC = D/shards wide while x/attn/wo
    # keep the full residual width (ttasr.parallel.tp).
    dc = wqc_q.shape[-1]
    dh = dc // h
    assert dh == 64 and h % 2 == 0, "kernel assumes head_dim 64, even heads"
    assert ck8.shape[-1] == dc and cv8.shape[-1] == dc, (ck8.shape, dc)
    assert k_pad <= K_PAD and s % 8 == 0
    if b % group != 0:
        group = 1
    g = group
    n_pairs = h // 2
    qscale = dh ** -0.5

    wo_s2 = wo_s.reshape(1, d).astype(jnp.float32)
    bo2 = bo.reshape(1, d).astype(jnp.float32)
    lnc_s2 = lnc_s.reshape(1, d).astype(jnp.float32)
    lnc_b2 = lnc_b.reshape(1, d).astype(jnp.float32)
    wqc_s2 = wqc_s.reshape(1, dc).astype(jnp.float32)
    bqc2 = bqc.reshape(1, dc).astype(jnp.float32)

    def kernel(x_ref, a_ref, wo_ref, wos_ref, bo_ref, ls_ref, lb_ref,
               wq_ref, wqs_ref, bq_ref, k_ref, ks_ref, v_ref, vs_ref,
               xo_ref, cross_ref):
        # weight matmuls once over all g * K_PAD rows
        a = a_ref[...].reshape(g * k_pad, d).astype(jnp.bfloat16)
        proj = jnp.dot(a, wo_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        xn = (x_ref[...].reshape(g * k_pad, d).astype(jnp.float32)
              + proj * wos_ref[:] + bo_ref[:])
        xo_ref[...] = xn.reshape(g, k_pad, d)
        ln = _ln_f32(xn, ls_ref, lb_ref).astype(jnp.bfloat16)
        qc_all = jnp.dot(ln, wq_ref[:].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        qc_all = (qc_all * wqs_ref[:] + bq_ref[:]) * qscale  # (gK, D)
        _cross_pairs_loop(qc_all, k_ref, ks_ref, v_ref, vs_ref, cross_ref,
                          g=g, k_pad=k_pad, s=s, s_real=s_real,
                          n_pairs=n_pairs, dh=dh, packed=packed)

    const2 = lambda i: (0, 0)  # noqa: E731

    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, k_pad, d), lambda i: (i, 0, 0)),   # x
            pl.BlockSpec((g, k_pad, d), lambda i: (i, 0, 0)),   # attn
            pl.BlockSpec((d, d), const2),                       # wo_q
            pl.BlockSpec((1, d), const2),                       # wo_s
            pl.BlockSpec((1, d), const2),                       # bo
            pl.BlockSpec((1, d), const2),                       # lnc_s
            pl.BlockSpec((1, d), const2),                       # lnc_b
            pl.BlockSpec((d, dc), const2),                      # wqc_q
            pl.BlockSpec((1, dc), const2),                      # wqc_s
            pl.BlockSpec((1, dc), const2),                      # bqc
            pl.BlockSpec((g, s_rows, dc), lambda i: (i, 0, 0)),  # ck8
            pl.BlockSpec((g, h, s), lambda i: (i, 0, 0)),       # cks
            pl.BlockSpec((g, s_rows, dc), lambda i: (i, 0, 0)),  # cv8
            pl.BlockSpec((g, h, s), lambda i: (i, 0, 0)),       # cvs
        ],
        out_specs=(
            pl.BlockSpec((g, k_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, k_pad, dc), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, k_pad, dc), jnp.float32),
        ),
        interpret=interpret,
    )(x, attn, wo_q, wo_s2, bo2, lnc_s2, lnc_b2, wqc_q, wqc_s2, bqc2,
      ck8, cks, cv8, cvs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def matmul_int8_partial(x, wq, ws, *, interpret: bool = False):
    """Row-parallel partial projection: ``(x @ W) * s`` with NO bias.

    x: (R, DL) f32/bf16 — the shard's LOCAL input slice (e.g. local-head
    attention output).  wq: (DL, M) int8 — the shard's ROW slice of the
    weight.  ws: (1, M) f32 per-output-channel scales (full width; the
    scale is linear in the partial sum, so each shard applies it).
    Returns (R, M) f32; shards ``psum`` the results and add the bias
    once (ttasr.parallel.tp v2: Wo / Wo_c / W2 split their rows over
    the model axis so the per-chip weight stream shrinks with the mesh).
    """
    r, dl = x.shape
    m = wq.shape[1]
    ws2 = ws.reshape(1, m).astype(jnp.float32)

    def kernel(x_ref, w_ref, s_ref, out_ref):
        xv = x_ref[:].astype(jnp.bfloat16)
        out = jnp.dot(xv, w_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        out_ref[:] = out * s_ref[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, m), jnp.float32),
        interpret=interpret,
    )(x, wq, ws2)


@functools.partial(jax.jit,
                   static_argnames=("s_real", "group", "interpret"))
def ln_q_cross_int8(xo, lnc_s, lnc_b, wqc_q, wqc_s, bqc,
                    ck8, cks, cv8, cvs, *, s_real: int, group: int = 1,
                    interpret: bool = False):
    """lnc + local cross-q + int8 cross-attention (TP-v2 counterpart of
    :func:`attnout_ln_q_cross_int8`, minus the wo@attn front half).

    xo: (B, K, D) f32 — the residual stream AFTER the row-parallel wo
    psum (already includes the residual add and bias).  wqc_q/bqc: the
    shard's column slice (DC = local heads * 64).  ck8/cv8/cks/cvs: the
    shard's local-head cross-KV cache, same formats as
    attnout_ln_q_cross_int8.  Returns cross (B, K, DC) f32 merged-head.
    The attention math is byte-identical to the fused kernel's
    (:func:`_cross_pairs_loop` is shared).
    """
    b, k_pad, d = xo.shape
    packed = ck8.dtype == jnp.uint8
    s_rows = ck8.shape[1]
    s = 2 * s_rows if packed else s_rows
    h = cks.shape[1]
    dc = wqc_q.shape[-1]
    dh = dc // h
    assert dh == 64 and h % 2 == 0, "kernel assumes head_dim 64, even heads"
    assert ck8.shape[-1] == dc and cv8.shape[-1] == dc, (ck8.shape, dc)
    assert k_pad <= K_PAD and s % 8 == 0
    if b % group != 0:
        group = 1
    g = group
    n_pairs = h // 2
    qscale = dh ** -0.5

    lnc_s2 = lnc_s.reshape(1, d).astype(jnp.float32)
    lnc_b2 = lnc_b.reshape(1, d).astype(jnp.float32)
    wqc_s2 = wqc_s.reshape(1, dc).astype(jnp.float32)
    bqc2 = bqc.reshape(1, dc).astype(jnp.float32)

    def kernel(x_ref, ls_ref, lb_ref, wq_ref, wqs_ref, bq_ref,
               k_ref, ks_ref, v_ref, vs_ref, cross_ref):
        xn = x_ref[...].reshape(g * k_pad, d).astype(jnp.float32)
        ln = _ln_f32(xn, ls_ref, lb_ref).astype(jnp.bfloat16)
        qc_all = jnp.dot(ln, wq_ref[:].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        qc_all = (qc_all * wqs_ref[:] + bq_ref[:]) * qscale  # (gK, DC)
        _cross_pairs_loop(qc_all, k_ref, ks_ref, v_ref, vs_ref, cross_ref,
                          g=g, k_pad=k_pad, s=s, s_real=s_real,
                          n_pairs=n_pairs, dh=dh, packed=packed)

    const2 = lambda i: (0, 0)  # noqa: E731

    return pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, k_pad, d), lambda i: (i, 0, 0)),   # xo
            pl.BlockSpec((1, d), const2),                       # lnc_s
            pl.BlockSpec((1, d), const2),                       # lnc_b
            pl.BlockSpec((d, dc), const2),                      # wqc_q
            pl.BlockSpec((1, dc), const2),                      # wqc_s
            pl.BlockSpec((1, dc), const2),                      # bqc
            pl.BlockSpec((g, s_rows, dc), lambda i: (i, 0, 0)),  # ck8
            pl.BlockSpec((g, h, s), lambda i: (i, 0, 0)),       # cks
            pl.BlockSpec((g, s_rows, dc), lambda i: (i, 0, 0)),  # cv8
            pl.BlockSpec((g, h, s), lambda i: (i, 0, 0)),       # cvs
        ],
        out_specs=pl.BlockSpec((g, k_pad, dc), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k_pad, dc), jnp.float32),
        interpret=interpret,
    )(xo, lnc_s2, lnc_b2, wqc_q, wqc_s2, bqc2, ck8, cks, cv8, cvs)
