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

Row counts must be multiples of 8 (pad outside; padding rows are junk
but cheap next to the weight streams).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


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
    Returns (x' (R, D) f32, qc (R, D) f32).
    """
    r, d = x.shape
    wo_s2 = wo_s.reshape(1, d).astype(jnp.float32)
    bo2 = bo.reshape(1, d).astype(jnp.float32)
    lnc_s2 = lnc_s.reshape(1, d).astype(jnp.float32)
    lnc_b2 = lnc_b.reshape(1, d).astype(jnp.float32)
    wqc_s2 = wqc_s.reshape(1, d).astype(jnp.float32)
    bqc2 = bqc.reshape(1, d).astype(jnp.float32)

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
            jax.ShapeDtypeStruct((r, d), jnp.float32),
        ),
        interpret=interpret,
    )(x, attn, wo_q, wo_s2, bo2, lnc_s2, lnc_b2, wqc_q, wqc_s2, bqc2)
