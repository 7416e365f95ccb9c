"""Fused normalize/activation + dynamic-quantize kernels (Pallas/TPU).

The s8 x s8 encoder path (model._self_attn_act8 / _mlp_act8) pays a
dynamic activation quantization before every projection: an absmax
reduce over the feature dim plus a round/cast pass.  Under XLA each
quantize is 2 extra full-tensor reads and the producing op (layernorm,
residual add, GELU) materializes its own bf16 output first — at batch
48 each pass over the (48, 1536, 1280) activations moves ~184 MB of
HBM, and the GELU hidden (48, 1536, 5120) moves 736 MB.

These kernels collapse producer + quantize into ONE HBM pass each:

- ``ln_quant``        layernorm -> int8 + row scales   (pre-qkv, pre-w1)
- ``add_ln_quant``    residual add -> (new residual bf16, int8, scales)
- ``gelu_quant``      exact GELU -> int8 + row scales  (pre-w2)
- ``quant_only``      plain dynamic quantize           (pre-out-proj)

Numerics: each kernel computes the producer in f32 and quantizes its
f32 output directly — the unfused path's intermediate bf16
materialization disappears (XLA/Mosaic cancel a lossy f32->bf16->f32
round-trip inside one kernel anyway, so an explicit cast would not
survive compilation).  That makes the fused path slightly MORE precise
than the unfused one; codes drift by at most +-2 on a few % of entries
(bf16 rounding scale).  tests/test_encoder_fused.py pins exactness
against the f32 composition plus a drift envelope vs the unfused path;
the recognition gate is exact-token agreement on the TPU A/B
(tools/check_beam_divergence.py --ab encoder-fused-quant).

Row scales are emitted as (B, 1, T) f32 — a lane-major layout Mosaic
tiles cleanly (a trailing dim of 1 would pad each row to 128 lanes) —
and reshaped to the (B, T, 1) epilogue shape by the wrappers.

Replaces the activation-quantization glue of CTranslate2's int8 GPU
path (reference runs compute_type="int8", file_asr.py:188).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TQ = 256        # row tile (positions) for D=1280-wide kernels
TQ_WIDE = 128   # row tile for the 4*D GELU kernel (VMEM headroom)


def _quantize_rows(xf):
    """f32 (TQ, D) -> (int8 codes, f32 row scales (TQ,)).

    quant.quantize_act applied to the producer's f32 output (see module
    docstring: the bf16 intermediate cannot survive in-kernel fusion,
    so the f32 composition IS the fused-path contract).
    """
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale[:, 0]


def _erf(z):
    """erf via Abramowitz & Stegun 7.1.26 (|abs err| <= 1.5e-7).

    Mosaic has no erf/erfc primitive; at int8 quantization granularity
    (1/127 per code) a 1.5e-7 polynomial error is invisible — codes
    flip on O(1e-5) of entries (tests/test_encoder_fused.py envelope).
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    za = jnp.abs(z)
    t = 1.0 / (1.0 + p * za)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-za * za)
    return jnp.sign(z) * y


def _gelu_exact(x32):
    """jax.nn.gelu(approximate=False) with the polynomial erf."""
    return 0.5 * x32 * (1.0 + _erf(x32 * 0.7071067811865476))


def _ln_rows(x32, scale, bias, eps=1e-5):
    """model._ln on a (TQ, D) f32 tile (same op sequence)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _check(x):
    b, t, d = x.shape
    assert t % TQ == 0, (t, TQ)
    return b, t, d


def _scales_out(b, t):
    return jax.ShapeDtypeStruct((b, 1, t), jnp.float32)


def _row_spec(tq, d):
    return pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0))


def _scale_spec(tq):
    return pl.BlockSpec((1, 1, tq), lambda i, j: (i, 0, j))


def _param_spec(d):
    return pl.BlockSpec((d,), lambda i, j: (0,))


def ln_quant(x, scale, bias, *, interpret: bool = False):
    """LayerNorm + int8 quantize in one pass.

    x (B, T, D) bf16; returns (int8 (B, T, D), f32 (B, T, 1)) equal to
    ``quantize_act(_ln(x, scale, bias))`` bit-for-bit.
    """
    b, t, d = _check(x)

    def kernel(x_ref, s_ref, b_ref, q_ref, sc_ref):
        out32 = _ln_rows(x_ref[0].astype(jnp.float32),
                         s_ref[...].astype(jnp.float32),
                         b_ref[...].astype(jnp.float32))
        q, sc = _quantize_rows(out32)
        q_ref[0] = q
        sc_ref[0, 0, :] = sc

    q, sc = pl.pallas_call(
        kernel,
        grid=(b, t // TQ),
        in_specs=[_row_spec(TQ, d), _param_spec(d), _param_spec(d)],
        out_specs=[_row_spec(TQ, d), _scale_spec(TQ)],
        out_shape=[jax.ShapeDtypeStruct((b, t, d), jnp.int8),
                   _scales_out(b, t)],
        interpret=interpret,
    )(x, scale, bias)
    return q, jnp.swapaxes(sc, 1, 2)


def add_ln_quant(x, y, scale, bias, *, interpret: bool = False):
    """Residual add + LayerNorm + int8 quantize in one pass.

    Returns (x + y bf16, int8 codes, f32 row scales) — the residual sum
    feeds the next block, the codes feed the s8 matmul.  Bit-equal to
    ``x2 = x + y; quantize_act(_ln(x2, scale, bias))``.
    """
    b, t, d = _check(x)

    def kernel(x_ref, y_ref, s_ref, b_ref, x2_ref, q_ref, sc_ref):
        # the f32 sum feeds the LN (module docstring: a bf16 rounding
        # of it would not survive in-kernel fusion); the residual
        # output still materializes in the residual dtype
        x2 = x_ref[0].astype(jnp.float32) + y_ref[0].astype(jnp.float32)
        x2_ref[0] = x2.astype(x2_ref.dtype)
        out32 = _ln_rows(x2,
                         s_ref[...].astype(jnp.float32),
                         b_ref[...].astype(jnp.float32))
        q, sc = _quantize_rows(out32)
        q_ref[0] = q
        sc_ref[0, 0, :] = sc

    x2, q, sc = pl.pallas_call(
        kernel,
        grid=(b, t // TQ),
        in_specs=[_row_spec(TQ, d), _row_spec(TQ, d),
                  _param_spec(d), _param_spec(d)],
        out_specs=[_row_spec(TQ, d), _row_spec(TQ, d), _scale_spec(TQ)],
        out_shape=[jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((b, t, d), jnp.int8),
                   _scales_out(b, t)],
        interpret=interpret,
    )(x, y, scale, bias)
    return x2, q, jnp.swapaxes(sc, 1, 2)


def gelu_quant(h, *, interpret: bool = False):
    """Exact (erf) GELU + int8 quantize in one pass over the MLP hidden.

    h (B, T, F) bf16 (the w1 matmul output, pre-GELU); bit-equal to
    ``quantize_act(jax.nn.gelu(h, approximate=False))``.
    """
    b, t, f = h.shape
    assert t % TQ_WIDE == 0, (t, TQ_WIDE)

    def kernel(h_ref, q_ref, sc_ref):
        act = _gelu_exact(h_ref[0].astype(jnp.float32))
        q, sc = _quantize_rows(act)
        q_ref[0] = q
        sc_ref[0, 0, :] = sc

    q, sc = pl.pallas_call(
        kernel,
        grid=(b, t // TQ_WIDE),
        in_specs=[_row_spec(TQ_WIDE, f)],
        out_specs=[_row_spec(TQ_WIDE, f), _scale_spec(TQ_WIDE)],
        out_shape=[jax.ShapeDtypeStruct((b, t, f), jnp.int8),
                   _scales_out(b, t)],
        interpret=interpret,
    )(h)
    return q, jnp.swapaxes(sc, 1, 2)


def quant_only(x, *, interpret: bool = False):
    """Dynamic int8 quantize in one pass (bit-equal to quantize_act)."""
    b, t, d = _check(x)

    def kernel(x_ref, q_ref, sc_ref):
        q, sc = _quantize_rows(x_ref[0].astype(jnp.float32))
        q_ref[0] = q
        sc_ref[0, 0, :] = sc

    q, sc = pl.pallas_call(
        kernel,
        grid=(b, t // TQ),
        in_specs=[_row_spec(TQ, d)],
        out_specs=[_row_spec(TQ, d), _scale_spec(TQ)],
        out_shape=[jax.ShapeDtypeStruct((b, t, d), jnp.int8),
                   _scales_out(b, t)],
        interpret=interpret,
    )(x)
    return q, jnp.swapaxes(sc, 1, 2)
