"""Fused int8 cross-attention decode kernel (Pallas/TPU).

Why a kernel: the cross-KV cache is loop-invariant in the token loop, so
a plain-XLA int8 cache either gets its bf16 conversion hoisted out of the
loop (materializing bf16 — no traffic saved) or re-materialized per step
(MORE traffic; PERF_NOTES.md).  This kernel streams the int8 K/V from
HBM and converts in VMEM, halving the dominant per-step HBM term.

Formulation (Mosaic needs lane-aligned ops; head_dim=64 offsets are not):
process heads in PAIRS.  For pair p (heads 2p, 2p+1):
- K_pair = K_flat[:, 128p:128(p+1)]  (S, 128) int8 -> bf16 in VMEM,
- Q_pair = block-diag of the two (K_beams x 64) query blocks -> (16, 128),
  so Q_pair @ K_pair^T computes both heads' scores with no cross terms,
- scores scale by pre-expanded per-(slot, head) int8 scales, mask
  s >= S_real, softmax, multiply by V scales,
- out_pair = P @ V_pair -> (16, 128); the valid (beam, head) blocks sit
  on the block diagonal and are extracted outside the kernel (tiny).

The per-(slot, head) scales are stored compactly as (B, H, S) f32
(:func:`transpose_scales`) and broadcast to score shape inside the
kernel — Mosaic cannot concat lane-offset slices, but sublane-row reads
plus a row select are free.

Grid: (B,); all head pairs loop statically inside one program so K/V
stream exactly once per (batch row, layer).
"""

from __future__ import annotations

import numpy as np

K_PAD = 8          # beams padded to 8 rows (sublane alignment)
PAIR_COLS = 128    # two 64-wide heads per lane-aligned pair


def transpose_scales(scales):
    """(B, S, H) per-(slot, head) scales -> compact (B, H, S).

    Head h's scales sit on sublane row h; kernels read rows 2p / 2p+1
    per head pair.  (The previous (B, H//2, 8, S) layout padded 6 of
    every 8 sublane rows — 4x the scale HBM traffic for nothing.)"""
    import jax.numpy as jnp

    return jnp.swapaxes(scales, 1, 2)


def cross_attention_int8(q, ck8_flat, ks_t, cv8_flat, vs_t, s_real: int,
                         *, interpret: bool = False):
    """q: (B, K, H, Dh) f32/bf16; ck8_flat/cv8_flat: (B, S, H*Dh) int8,
    or (B, S/2, H*Dh) uint8 nibble-packed int4 (ttasr/ops/int4.py —
    detected via dtype); ks_t/vs_t: (B, H, S) f32 from
    :func:`transpose_scales`.  Returns (B, K, H, Dh) f32.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ttasr.ops.int4 import unpack_int4_block

    b, k_beams, h, dh = q.shape
    packed = ck8_flat.dtype == jnp.uint8
    s_rows = ck8_flat.shape[1]            # stored rows (S/2 when packed)
    s = 2 * s_rows if packed else s_rows  # logical source slots
    d = h * dh
    assert dh == 64 and h % 2 == 0, "kernel assumes head_dim 64, even heads"
    n_pairs = h // 2
    scale = dh ** -0.5

    q_flat = jnp.zeros((b, K_PAD, d), jnp.float32)
    q_flat = q_flat.at[:, :k_beams].set(
        (q * scale).astype(jnp.float32).reshape(b, k_beams, d)
    )

    def kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, out_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (2 * K_PAD, s), 1)
        valid = col < s_real
        top_rows = jax.lax.broadcasted_iota(
            jnp.int32, (2 * K_PAD, s), 0) < K_PAD

        def pair_scales(ref, p):
            a = jnp.broadcast_to(ref[0, 2 * p : 2 * p + 1, :], (2 * K_PAD, s))
            b_ = jnp.broadcast_to(ref[0, 2 * p + 1 : 2 * p + 2, :],
                                  (2 * K_PAD, s))
            return jnp.where(top_rows, a, b_)

        def load_pair(ref, c0):
            if packed:
                return unpack_int4_block(
                    ref[0, :, c0 : c0 + PAIR_COLS]).astype(jnp.bfloat16)
            return ref[0, :, c0 : c0 + PAIR_COLS].astype(jnp.bfloat16)

        for p in range(n_pairs):
            c0 = p * PAIR_COLS
            k_pair = load_pair(k_ref, c0)
            v_pair = load_pair(v_ref, c0)

            # block-diagonal queries: rows 0..7 -> head 2p, 8..15 -> 2p+1
            q_cols = q_ref[0, :, c0 : c0 + PAIR_COLS]      # (8, 128)
            zeros = jnp.zeros((K_PAD, dh), jnp.float32)
            top = jnp.concatenate([q_cols[:, :dh], zeros], axis=1)
            bot = jnp.concatenate([zeros, q_cols[:, dh:]], axis=1)
            q_pair = jnp.concatenate([top, bot], axis=0).astype(jnp.bfloat16)

            raw = jax.lax.dot_general(
                q_pair, k_pair, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (16, S)
            scores = jnp.where(valid, raw * pair_scales(ks_ref, p),
                               np.finfo(np.float32).min)
            probs = jax.nn.softmax(scores, axis=-1)
            probs_scaled = (probs * pair_scales(vs_ref, p)).astype(jnp.bfloat16)
            out_ref[0, p, :, :] = jax.lax.dot_general(
                probs_scaled, v_pair, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (16, 128)

    # grid over batch only: the (S, H*Dh) int8 K/V stream in one
    # contiguous DMA per program (a (batch, pair) grid forces strided
    # 128-column DMAs and measured 1.7x slower).
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, K_PAD, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_rows, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_rows, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_pairs, 2 * K_PAD, PAIR_COLS), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_pairs, 2 * K_PAD, PAIR_COLS), jnp.float32
        ),
        interpret=interpret,
    )(q_flat, ck8_flat, ks_t, cv8_flat, vs_t)

    # extract the block-diagonal (beam, head) blocks:
    # head 2p   -> out[b, p, 0:K,        0:64]
    # head 2p+1 -> out[b, p, 8:8+K,     64:128]
    even = out[:, :, :k_beams, :dh]          # (B, P, K, 64)
    odd = out[:, :, K_PAD : K_PAD + k_beams, dh:]
    stacked = jnp.stack([even, odd], axis=2)  # (B, P, 2, K, 64)
    merged = stacked.reshape(b, n_pairs * 2, k_beams, dh)
    return jnp.transpose(merged, (0, 2, 1, 3))  # (B, K, H, Dh)
