"""Parity tests for the fused producer+quantize encoder kernels.

ops.encoder_fused_pallas collapses layernorm / residual add / GELU /
plain dynamic quantization into single Pallas passes.  Contract (see
the module docstring): the producer computes in f32 and its f32 output
is quantized directly — the unfused path's intermediate bf16
materialization disappears (XLA/Mosaic cancel a lossy f32->bf16->f32
round-trip inside one kernel, so it could not be preserved anyway).

These tests pin (a) exactness against that f32 composition (up to the
1-ulp /127.0 strength-reduction XLA applies in some fusion contexts),
and (b) a drift envelope against the production unfused path (bf16
rounding scale: codes +-2 on a few %).  The recognition-level gate is
exact-token agreement on the TPU A/B
(tools/check_beam_divergence.py --ab encoder-fused-quant).

Reference compute scheme: CTranslate2 int8 activations
(reference file_asr.py:188 runs compute_type="int8").
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ttasr.models.whisper.model import (  # noqa: E402
    _ln, _mlp_act8, _self_attn_act8,
)
from ttasr.ops.encoder_fused_pallas import (  # noqa: E402
    add_ln_quant, gelu_quant, ln_quant, quant_only,
)
from ttasr.ops.quant import quantize_act, quantize_tensor  # noqa: E402

B, T, D = 2, 512, 256


def _x(shape, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), jnp.float32).astype(dtype)


def _assert_quant_close(got_q, got_s, want_q, want_s, *,
                        max_dq=1, frac=1e-3):
    dq = np.asarray(got_q).astype(np.int32) - np.asarray(want_q).astype(
        np.int32)
    assert np.abs(dq).max() <= max_dq, np.abs(dq).max()
    assert (dq != 0).mean() < frac, (dq != 0).mean()
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-6)


def test_ln_quant_matches_f32_composition():
    x = _x((B, T, D), 1)
    s = _x((D,), 2, jnp.float32) * 0.1 + 1.0
    b = _x((D,), 3, jnp.float32) * 0.1
    # _ln on an f32 input returns f32 (no bf16 materialization) — the
    # fused contract; quantize_act on f32 is then the exact reference
    want_q, want_s = quantize_act(_ln(x.astype(jnp.float32), s, b))
    got_q, got_s = ln_quant(x, s, b, interpret=True)
    _assert_quant_close(got_q, got_s, want_q, want_s)
    # drift envelope vs the production unfused path (bf16 intermediate)
    uf_q, _ = quantize_act(_ln(x, s, b))
    _assert_quant_close(got_q, got_s, uf_q, want_s, max_dq=2, frac=0.15)


def test_add_ln_quant_matches_f32_composition():
    x = _x((B, T, D), 4)
    y = _x((B, T, D), 5)
    s = _x((D,), 6, jnp.float32) * 0.1 + 1.0
    b = _x((D,), 7, jnp.float32) * 0.1
    x2f = x.astype(jnp.float32) + y.astype(jnp.float32)
    want_q, want_s = quantize_act(_ln(x2f, s, b))
    got_x2, got_q, got_s = add_ln_quant(x, y, s, b, interpret=True)
    assert got_x2.dtype == x.dtype
    np.testing.assert_array_equal(
        np.asarray(got_x2, np.float32),
        np.asarray(x2f.astype(x.dtype), np.float32))
    _assert_quant_close(got_q, got_s, want_q, want_s)


def test_gelu_quant_matches_f32_composition():
    h = _x((B, 256, 512), 8)
    want_q, want_s = quantize_act(
        jax.nn.gelu(h.astype(jnp.float32), approximate=False))
    got_q, got_s = gelu_quant(h, interpret=True)
    _assert_quant_close(got_q, got_s, want_q, want_s)


def test_quant_only_matches_quantize_act():
    x = _x((B, T, D), 9)
    want_q, want_s = quantize_act(x)
    got_q, got_s = quant_only(x, interpret=True)
    _assert_quant_close(got_q, got_s, want_q, want_s)


def _quant_blk(d, seed):
    rng = np.random.default_rng(seed)

    def wleaf(scale=0.1):
        return quantize_tensor(
            rng.standard_normal((d, d)).astype(np.float32) * scale)

    return {
        "wq": wleaf(), "wk": wleaf(), "wv": wleaf(), "wo": wleaf(),
        "w1": quantize_tensor(
            rng.standard_normal((d, 4 * d)).astype(np.float32) * 0.1),
        "w2": quantize_tensor(
            rng.standard_normal((4 * d, d)).astype(np.float32) * 0.1),
        "bq": jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.05,
        "bv": jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.05,
        "bo": jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.05,
        "b1": jnp.asarray(rng.standard_normal((4 * d,)), jnp.float32) * 0.05,
        "b2": jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.05,
        "ln1_s": jnp.ones((d,), jnp.float32),
        "ln1_b": jnp.zeros((d,), jnp.float32),
        "ln2_s": jnp.ones((d,), jnp.float32),
        "ln2_b": jnp.zeros((d,), jnp.float32),
    }


def test_qkv_direct_attention_matches_split_path():
    """_self_attn_act8 with a fused wqkv leaf + fused_quant (the
    qkv-direct attention kernel, dh**-0.5 folded into weight scales)
    vs the separate-leaf unfused-quant path."""
    d, n_heads, t = 128, 2, 256
    blk = _quant_blk(d, 12)
    x = _x((B, t, d), 13)

    want = np.asarray(_self_attn_act8(x, blk, n_heads, t, interpret=True),
                      np.float32)

    fused_blk = dict(blk)
    fused_blk["wqkv"] = {
        "q": jnp.concatenate(
            [blk["wq"]["q"], blk["wk"]["q"], blk["wv"]["q"]], axis=-1),
        "s": jnp.concatenate(
            [blk["wq"]["s"], blk["wk"]["s"], blk["wv"]["s"]], axis=-1),
    }
    fused_blk["bqkv"] = jnp.concatenate(
        [blk["bq"], jnp.zeros_like(blk["bq"]), blk["bv"]])
    got = np.asarray(
        _self_attn_act8(x, fused_blk, n_heads, t, fused_quant=True,
                        interpret=True), np.float32)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 0.02, err


def test_fused_quant_block_matches_unfused_block():
    """Full encoder block through the fused-quant path (the exact
    composition encode() runs with fused_quant on) vs the unfused act8
    block — same int8 pipeline, so outputs agree to quantization
    noise."""
    d, n_heads, t = 128, 2, 256
    blk = _quant_blk(d, 10)
    x = _x((B, t, d), 11)

    # unfused act8 block
    h = _ln(x, blk["ln1_s"], blk["ln1_b"])
    x_ref = x + _self_attn_act8(h, blk, n_heads, t, interpret=True)
    want = x_ref + _mlp_act8(
        _ln(x_ref, blk["ln2_s"], blk["ln2_b"]), blk)

    # fused-quant block (mirrors model.encode's fq branch)
    q1, s1 = ln_quant(x, blk["ln1_s"], blk["ln1_b"], interpret=True)
    attn = _self_attn_act8(x, blk, n_heads, t, x_quant=(q1, s1),
                           fused_quant=True, interpret=True)
    x2, q2, s2 = add_ln_quant(x, attn, blk["ln2_s"], blk["ln2_b"],
                              interpret=True)
    got = x2 + _mlp_act8(x2, blk, x_quant=(q2, s2), fused_quant=True,
                         interpret=True)

    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    err = np.abs(g - w).max() / (np.abs(w).max() + 1e-9)
    assert err < 0.02, err
