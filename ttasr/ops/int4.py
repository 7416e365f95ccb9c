"""int4 nibble packing for the cross-KV cache.

The cross-KV stream is the dominant per-step HBM term of fused int8
decode (PERF_NOTES.md round 3: ~5 ms of a 15 ms step at batch 16, ~2x
its own roofline).  Packing K/V to int4 halves that stream again.
Enabled via ``DecodingOptions.cross_kv_int4`` (default-on in the engine
and bench since the recognition-level bound came back clean) —
quantization error is bounded empirically by
tools/check_beam_divergence.py, not assumed.

Layout — sublane-half packing: a (S, D) int4 tensor (S a multiple of
16) stores as (S/2, D) uint8 where byte ``[s, d]`` holds slot ``s`` in
the low nibble and slot ``s + S/2`` in the high nibble.  Unpacking is
then two nibble extractions plus ONE sublane-axis concatenate — no lane
shuffles, which Mosaic cannot lower cheaply.  Nibbles are two's
complement (-8..7); quantization uses the symmetric range -7..7 so +/-
absmax map to +/-7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ttasr.ops.quant import quantize_kv_sym


def quantize_kv4(x):
    """Per (row, slot, head) symmetric int4 quantization of K/V entries.

    x: (B, T, H, Dh) -> (int8 values in [-7, 7], f32 scales (B, T, H)).
    Same scheme as :func:`ttasr.models.whisper.model.quantize_kv` at
    4-bit range; values stay int8-typed until :func:`pack_int4`.
    """
    return quantize_kv_sym(x, levels=7)


def _nibble_decode(packed):
    """uint8 nibble pair -> (lo, hi) int32 two's-complement values.

    The single decode site for both the XLA unpack and the in-kernel
    block unpack — a layout or sign-extension change happens here once.
    int32 intermediates: Mosaic lowers 8-bit bitwise/shift lanes
    inconsistently across versions.
    """
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = ((p >> 4) ^ 8) - 8
    return lo, hi


def pack_int4(q):
    """(.., S, D) int8 in [-8, 7], S % 2 == 0 -> (.., S/2, D) uint8.

    Byte ``[s, d]`` = slot ``s`` (low nibble) | slot ``s + S/2`` << 4,
    two's complement nibbles.
    """
    s = q.shape[-2]
    assert s % 2 == 0, "pack_int4 needs an even slot count"
    half = s // 2
    lo = q[..., :half, :].astype(jnp.uint8) & 0xF
    hi = q[..., half:, :].astype(jnp.uint8) & 0xF
    return lo | (hi << 4)


def unpack_int4(packed, dtype=jnp.int8):
    """(.., S/2, D) uint8 -> (.., S, D) signed values (slot order)."""
    lo, hi = _nibble_decode(packed)
    return jnp.concatenate([lo, hi], axis=-2).astype(dtype)


def pack_int4_lanes(q):
    """(.., D) int8 in [-8, 7], D % 2 == 0 -> (.., D/2) uint8.

    LANE-axis packing for the SELF-KV cache: byte ``[.., c]`` = column
    ``c`` (low nibble) | column ``c + D/2`` << 4.  Within-row packing
    keeps every cache slot's bytes disjoint, so the per-step
    single-position write stays a pure write (no read-modify-write) —
    and the kernels never need a lane concatenate: they split the D
    contraction into two D/2 halves and sum (scores) or write the two
    output halves separately (values)."""
    d = q.shape[-1]
    assert d % 2 == 0, "pack_int4_lanes needs an even column count"
    half = d // 2
    lo = q[..., :half].astype(jnp.uint8) & 0xF
    hi = q[..., half:].astype(jnp.uint8) & 0xF
    return lo | (hi << 4)


def unpack_int4_lanes(packed, dtype=jnp.int8):
    """(.., D/2) uint8 -> (.., D) signed values (column order)."""
    lo, hi = _nibble_decode(packed)
    return jnp.concatenate([lo, hi], axis=-1).astype(dtype)


def unpack_int4_block(block_u8):
    """In-kernel unpack of a 2-D (S/2, cols) uint8 VMEM block.

    Returns (S, cols) int32 in slot order; the (S/2, 128) int32
    transient is a few hundred KB of VMEM.
    """
    lo, hi = _nibble_decode(block_u8)
    return jax.lax.concatenate([lo, hi], 0)
