"""Fused int8 decoder-MLP kernel (Pallas/TPU).

One kernel computes ``x + (gelu(ln(x) @ W1 + b1) @ W2 + b2)`` with the
int8 weights streamed from HBM and converted to bf16 **inside VMEM** —
the conversion plain XLA hoists out of the decode loop (materializing
bf16 weights, PERF_NOTES.md "why int8 didn't help").  The MLP holds 57%
of the decoder's per-step weight bytes (2·d·ffn vs 6·d² per layer for
large-v3), so keeping it int8 in the loop halves the dominant
weight-stream term, and the single kernel replaces ~10 XLA ops of
dispatch per layer.  Fills the role of CT2's fused int8 GEMM decode
(reference runs compute_type="int8", api/file_asr.py:188).

Grid: tiles over the ffn dimension; the f32 output block accumulates in
VMEM across sequential TPU grid steps (program 0 seeds it with the
residual + b2).
"""

from __future__ import annotations

import functools

import numpy as np

# target per-program int8 weight bytes (w1 tile + w2 tile)
_TILE_BUDGET = 8 * 1024 * 1024


def _erf_as(z):
    """Abramowitz–Stegun 7.1.26 erf (max err 1.5e-7 — below bf16 noise).

    Mosaic has no erf/erfc lowering; this keeps the kernel's gelu exact
    to within f32 rounding instead of falling back to the tanh approx.
    """
    import jax.numpy as jnp

    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(h):
    import jax.numpy as jnp

    return 0.5 * h * (1.0 + _erf_as(h * jnp.float32(0.7071067811865476)))


def _pick_tile(d: int, ffn: int) -> int:
    """ffn tile width: lane-aligned, divides ffn, fits the VMEM budget."""
    if ffn <= 256:
        return ffn
    tile = ffn
    while 2 * d * tile > _TILE_BUDGET and tile % 2 == 0 and tile > 256:
        tile //= 2
    return tile


@functools.partial(
    __import__("jax").jit,
    static_argnames=("interpret", "tile", "partial"),
)
def mlp_int8_fused(x, ln_s, ln_b, w1q, w1s, b1, w2q, w2s, b2, *,
                   tile: int = 0, interpret: bool = False,
                   partial: bool = False):
    """x: (R, D) bf16/f32.  w1q: (D, F) int8, w1s: (1, F) f32, b1: (F,).
    w2q: (F, D) int8, w2s: (1, D) f32, b2: (D,).  Returns (R, D) x.dtype.

    R must be a multiple of 8 (pad rows outside; cheap vs the weight
    stream).

    ``partial=True`` is the row-parallel (TP v2) form: w1/b1 carry the
    shard's COLUMN slice of the hidden dim and w2 the matching ROW
    slice; the kernel returns ONLY ``gelu(ln(x)@W1+b1) @ W2 * s2`` —
    no residual, no b2 — as (R, D) f32 for the caller to ``psum`` and
    add ``x + b2`` once (ttasr.parallel.tp).  ln(x) is computed from
    the full replicated residual stream, so it needs no collective.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    r, d = x.shape
    f = w1q.shape[1]
    tile = tile or _pick_tile(d, f)
    nt = f // tile
    assert nt * tile == f, (f, tile)

    ln_s2 = ln_s.reshape(1, d).astype(jnp.float32)
    ln_b2 = ln_b.reshape(1, d).astype(jnp.float32)
    b1_2 = b1.reshape(1, f).astype(jnp.float32)
    b2_2 = b2.reshape(1, d).astype(jnp.float32)
    w1s = w1s.reshape(1, f).astype(jnp.float32)
    w2s = w2s.reshape(1, d).astype(jnp.float32)

    def kernel(x_ref, lns_ref, lnb_ref, w1_ref, w1s_ref, b1_ref,
               w2_ref, w2s_ref, b2_ref, out_ref):
        i = pl.program_id(0)
        xv = x_ref[:].astype(jnp.float32)
        # layernorm (recomputed per program; R*D flops, negligible)
        mean = jnp.mean(xv, axis=-1, keepdims=True)
        var = jnp.mean((xv - mean) ** 2, axis=-1, keepdims=True)
        ln = ((xv - mean) * jax.lax.rsqrt(var + 1e-5)
              * lns_ref[:] + lnb_ref[:]).astype(jnp.bfloat16)
        # h = gelu(ln @ W1_tile * s1 + b1)
        h = jnp.dot(ln, w1_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        h = h * w1s_ref[:] + b1_ref[:]
        h = _gelu_exact(h).astype(jnp.bfloat16)
        # partial = h @ W2_tile (scale applies per output channel: linear
        # in the tile sum, so apply per program)
        tile_sum = jnp.dot(h, w2_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) * w2s_ref[:]

        @pl.when(i == 0)
        def _():
            if partial:
                out_ref[:] = tile_sum
            else:
                out_ref[:] = xv + b2_ref[:] + tile_sum

        @pl.when(i > 0)
        def _():
            out_ref[:] = out_ref[:] + tile_sum

    out = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((r, d), lambda i: (0, 0)),          # x
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # ln_s
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # ln_b
            pl.BlockSpec((d, tile), lambda i: (0, i)),       # w1q
            pl.BlockSpec((1, tile), lambda i: (0, i)),       # w1s
            pl.BlockSpec((1, tile), lambda i: (0, i)),       # b1
            pl.BlockSpec((tile, d), lambda i: (i, 0)),       # w2q
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # w2s
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # b2
        ],
        out_specs=pl.BlockSpec((r, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
        interpret=interpret,
    )(x, ln_s2, ln_b2, w1q, w1s, b1_2, w2q, w2s, b2_2)
    return out if partial else out.astype(x.dtype)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("interpret", "tile"),
)
def mlp_with_crossout_int8(x, cross, woc_q, woc_s, boc,
                           ln_s, ln_b, w1q, w1s, b1, w2q, w2s, b2, *,
                           tile: int = 0, interpret: bool = False):
    """Cross-attention output projection folded into the MLP kernel:

        x' = x + (cross @ Wo_c) * s_oc + b_oc
        y  = x' + gelu(ln2(x') @ W1 + b1) @ W2 + b2

    x, cross: (R, D).  Returns (R, D) f32.  The residual stream x' is
    computed once (program 0) into persistent VMEM scratch; TPU grids
    execute sequentially, so later ffn-tile programs reuse it.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, d = x.shape
    f = w1q.shape[1]
    tile = tile or _pick_tile(d, f)
    nt = f // tile

    ln_s2 = ln_s.reshape(1, d).astype(jnp.float32)
    ln_b2 = ln_b.reshape(1, d).astype(jnp.float32)
    b1_2 = b1.reshape(1, f).astype(jnp.float32)
    b2_2 = b2.reshape(1, d).astype(jnp.float32)
    w1s = w1s.reshape(1, f).astype(jnp.float32)
    w2s = w2s.reshape(1, d).astype(jnp.float32)
    woc_s2 = woc_s.reshape(1, d).astype(jnp.float32)
    boc2 = boc.reshape(1, d).astype(jnp.float32)

    def kernel(x_ref, c_ref, woc_ref, wocs_ref, boc_ref,
               lns_ref, lnb_ref, w1_ref, w1s_ref, b1_ref,
               w2_ref, w2s_ref, b2_ref, out_ref, xsave):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            proj = jnp.dot(c_ref[:].astype(jnp.bfloat16),
                           woc_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            xsave[:] = (x_ref[:].astype(jnp.float32)
                        + proj * wocs_ref[:] + boc_ref[:])

        xv = xsave[:]
        mean = jnp.mean(xv, axis=-1, keepdims=True)
        var = jnp.mean((xv - mean) ** 2, axis=-1, keepdims=True)
        ln = ((xv - mean) * jax.lax.rsqrt(var + 1e-5)
              * lns_ref[:] + lnb_ref[:]).astype(jnp.bfloat16)
        h = jnp.dot(ln, w1_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        h = h * w1s_ref[:] + b1_ref[:]
        h = _gelu_exact(h).astype(jnp.bfloat16)
        partial = jnp.dot(h, w2_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) * w2s_ref[:]

        @pl.when(i == 0)
        def _():
            out_ref[:] = xv + b2_ref[:] + partial

        @pl.when(i > 0)
        def _():
            out_ref[:] = out_ref[:] + partial

    out = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((r, d), lambda i: (0, 0)),          # x
            pl.BlockSpec((r, d), lambda i: (0, 0)),          # cross
            pl.BlockSpec((d, d), lambda i: (0, 0)),          # woc_q
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # woc_s
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # boc
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # ln_s
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # ln_b
            pl.BlockSpec((d, tile), lambda i: (0, i)),       # w1q
            pl.BlockSpec((1, tile), lambda i: (0, i)),       # w1s
            pl.BlockSpec((1, tile), lambda i: (0, i)),       # b1
            pl.BlockSpec((tile, d), lambda i: (i, 0)),       # w2q
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # w2s
            pl.BlockSpec((1, d), lambda i: (0, 0)),          # b2
        ],
        out_specs=pl.BlockSpec((r, d), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, d), jnp.float32)],
        interpret=interpret,
    )(x, cross, woc_q, woc_s2, boc2, ln_s2, ln_b2,
      w1q, w1s, b1_2, w2q, w2s, b2_2)
    return out
