"""Fused encoder self-attention kernel (Pallas/TPU).

The XLA path materializes (B, H, 1500, 1500) f32 score tensors in HBM
(~1.4 GB per layer at batch 8) — measured 7.9 ms/layer, ~11 TFLOP/s.
This kernel computes scores, softmax, and the value contraction entirely
in VMEM per 128-query block: K/V for one (batch, head) fit comfortably
on-chip (1536 x 64 bf16 = 192 KB each), so nothing quadratic ever
touches HBM.

Grid: (B*H, Tq_blocks); the K/V block specs depend only on the first
grid axis, so Pallas keeps them resident across the query blocks of the
same (batch, head).  The sequence pads to a 128 multiple and the pad
columns are masked in-kernel.
"""

from __future__ import annotations

import numpy as np

Q_BLOCK = 512  # sweep: 512 best (5.1 ms/layer vs einsum 7.9)


def encoder_self_attention(q, k, v, *, interpret: bool = False):
    """q/k/v: (B, T, H, Dh) bf16/f32 -> (B, T, H, Dh) in q's dtype.

    Non-causal full self-attention (the Whisper encoder's pattern).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, dh = q.shape
    t_pad = ((t + Q_BLOCK - 1) // Q_BLOCK) * Q_BLOCK
    scale = dh ** -0.5

    def to_flat(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, t, dh)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x.astype(jnp.bfloat16)

    qf = to_flat(q * scale)
    kf = to_flat(k)
    vf = to_flat(v)
    n_q_blocks = t_pad // Q_BLOCK

    def kernel(q_ref, k_ref, v_ref, out_ref):
        qb = q_ref[0, :, :]                                  # (128, Dh)
        keys = k_ref[0, :, :]                                # (T_pad, Dh)
        vals = v_ref[0, :, :]
        scores = jax.lax.dot_general(
            qb, keys, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (128, T_pad)
        col = jax.lax.broadcasted_iota(jnp.int32, (Q_BLOCK, t_pad), 1)
        scores = jnp.where(col < t, scores, np.finfo(np.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        out_ref[0, :, :] = jax.lax.dot_general(
            probs, vals, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # K/V indexed by the (batch, head) axis only: Pallas keeps
            # them resident across this head's query blocks.
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q_BLOCK, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dh), jnp.bfloat16),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :t].reshape(b, h, t, dh)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


TQ_MERGED = 256


def encoder_attention_merged_qkv(qkv, t_real: int, *,
                                 interpret: bool = False):
    """Merged attention reading q/K/V straight from the fused qkv buffer.

    qkv: (B, T_pad, 3D) bf16 — the s8 wqkv matmul's output in merged
    layout (q columns 0:D, k columns D:2D, v columns 2D:3D), with the
    dh**-0.5 query pre-scale already folded into the q-third of the
    weight scales (model._self_attn_act8).  Skips the qm/km/vm
    materialization entirely: the q tiles and K/V panels are strided
    block views of the one buffer (~1.7 GB/layer of HBM traffic saved
    at batch 48 vs slicing three bf16 tensors out of an f32 qkv).

    Same math as encoder_attention_merged below; grid and VMEM
    residency identical.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b, t_pad, d3 = qkv.shape
    d = d3 // 3
    dh = 64
    tq = TQ_MERGED
    assert t_pad % tq == 0 and d % 128 == 0
    n_pairs = d // 128

    def kernel(q_ref, k_ref, v_ref, out_ref):
        q_cols = q_ref[0].astype(jnp.float32)            # (TQ, 128)
        col128 = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
        q_pair = jnp.concatenate(
            [jnp.where(col128 < dh, q_cols, 0.0),
             jnp.where(col128 >= dh, q_cols, 0.0)], axis=0
        ).astype(jnp.bfloat16)                           # (2TQ, 128)
        scores = jax.lax.dot_general(
            q_pair, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (2TQ, T_pad)
        col_t = jax.lax.broadcasted_iota(jnp.int32, (2 * tq, t_pad), 1)
        scores = jnp.where(col_t < t_real, scores,
                           np.finfo(np.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        out_pair = jax.lax.dot_general(
            probs, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (2TQ, 128)
        merged = jnp.where(col128 < dh, out_pair[:tq], out_pair[tq:])
        out_ref[0] = merged.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b, n_pairs, t_pad // tq),
        in_specs=[
            # strided views of the same buffer: q tile at pair p, K/V
            # panels at block offsets n_pairs + p / 2*n_pairs + p
            pl.BlockSpec((1, tq, 128), lambda i, p, j: (i, j, p)),
            pl.BlockSpec((1, t_pad, 128),
                         lambda i, p, j: (i, 0, n_pairs + p)),
            pl.BlockSpec((1, t_pad, 128),
                         lambda i, p, j: (i, 0, 2 * n_pairs + p)),
        ],
        out_specs=pl.BlockSpec((1, tq, 128), lambda i, p, j: (i, j, p)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)


def encoder_attention_merged(q, k, v, t_real: int, *,
                             interpret: bool = False):
    """Merged-layout encoder self-attention (non-causal, head pairs).

    q/k/v: (B, T_pad, D) bf16 in MERGED-head layout (head h at columns
    64h..64h+63), T_pad a multiple of ``TQ_MERGED``; q pre-scaled by
    dh**-0.5.  Columns >= ``t_real`` are masked.  Returns (B, T_pad, D)
    in merged layout — the SAME layout the surrounding projections use,
    so unlike the per-(batch, head) kernel above there is no transpose
    at either kernel boundary (those relayouts are what made it lose
    end-to-end, PERF_NOTES round 1).

    Head pairs keep the score contraction 128 lanes wide: the two
    heads' queries sit block-diagonally in a (2 TQ, 128) tile, one
    (2TQ,128)@(128,T) dot scores both heads (no cross terms), and the
    pair output folds back with a lane select.

    Grid: (B, n_pairs, T_pad // TQ) — K/V pair panels (T_pad, 128) stay
    small in VMEM and revisit across the query tiles of a (b, p).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b, t_pad, d = q.shape
    dh = 64
    tq = TQ_MERGED
    assert t_pad % tq == 0 and d % 128 == 0
    n_pairs = d // 128

    def kernel(q_ref, k_ref, v_ref, out_ref):
        q_cols = q_ref[0].astype(jnp.float32)            # (TQ, 128)
        col128 = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
        q_pair = jnp.concatenate(
            [jnp.where(col128 < dh, q_cols, 0.0),
             jnp.where(col128 >= dh, q_cols, 0.0)], axis=0
        ).astype(jnp.bfloat16)                           # (2TQ, 128)
        scores = jax.lax.dot_general(
            q_pair, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (2TQ, T_pad)
        col_t = jax.lax.broadcasted_iota(jnp.int32, (2 * tq, t_pad), 1)
        scores = jnp.where(col_t < t_real, scores,
                           np.finfo(np.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        out_pair = jax.lax.dot_general(
            probs, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (2TQ, 128)
        merged = jnp.where(col128 < dh, out_pair[:tq], out_pair[tq:])
        out_ref[0] = merged.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b, n_pairs, t_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, 128), lambda i, p, j: (i, j, p)),
            pl.BlockSpec((1, t_pad, 128), lambda i, p, j: (i, 0, p)),
            pl.BlockSpec((1, t_pad, 128), lambda i, p, j: (i, 0, p)),
        ],
        out_specs=pl.BlockSpec((1, tq, 128), lambda i, p, j: (i, j, p)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
