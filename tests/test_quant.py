"""int8 weight quantization tests: logits stay close, decode runs."""

import numpy as np
import pytest

from ttasr.models.whisper.config import WhisperConfig
from ttasr.models.whisper.model import encode, forward, init_params
from ttasr.ops.quant import (
    dequantize_tensor,
    is_quantized,
    quantize_params,
    quantize_tensor,
)
from ttasr.text.tokenizer import build_byte_fallback_tokenizer

TOK = build_byte_fallback_tokenizer()


def _cfg():
    return WhisperConfig(
        name="micro", vocab_size=TOK.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
        max_source_positions=64,
    )


def test_quantize_tensor_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 32, 16)).astype(np.float32) * 0.1
    q = quantize_tensor(w)
    assert is_quantized(q)
    assert q["q"].dtype == np.int8
    assert q["s"].shape == (4, 1, 16)
    deq = np.asarray(dequantize_tensor(q))
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # 7-bit symmetric quantization error bound


def test_quantized_forward_close():
    cfg = _cfg()
    params = init_params(cfg, seed=0)
    qparams = quantize_params(params)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 128)).astype(np.float32) * 0.4
    tokens = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    ref = np.asarray(forward(params, cfg, mel, tokens))
    got = np.asarray(forward(qparams, cfg, mel, tokens))
    assert got.shape == ref.shape
    # int8 weights: logits drift bounded, argmax agreement high
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.1
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.8


def test_quantized_greedy_decode_runs():
    import jax

    from ttasr.models.whisper.decode import (
        DecodingOptions, TokenizerInfo, greedy_decode, pad_prompts,
    )

    cfg = _cfg()
    qparams = quantize_params(init_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 128)).astype(np.float32) * 0.4
    enc = encode(qparams, cfg, mel)
    ti = TokenizerInfo.from_tokenizer(TOK, n_vocab=cfg.vocab_size)
    prompt, pad = pad_prompts([TOK.sot_sequence("zh", predict_timestamps=True)],
                              TOK.eot)
    out = greedy_decode(qparams, cfg, enc, prompt, pad, jax.random.PRNGKey(0),
                        opts=DecodingOptions(sample_len=8), ti=ti)
    assert np.asarray(out["tokens"]).shape == (1, 8)


def test_quantized_param_pspecs():
    from jax.sharding import PartitionSpec as P

    from ttasr.parallel.sharding import param_pspecs

    cfg = _cfg()
    qparams = quantize_params(init_params(cfg, seed=0))
    specs = param_pspecs(qparams)
    blocks = specs["encoder"]["blocks"]
    assert blocks["wq"]["q"] == P(None, None, "model")
    assert blocks["wq"]["s"] == P(None, None, "model")
    assert blocks["wo"]["q"] == P(None, "model", None)
    assert blocks["wo"]["s"] == P()


def test_quantize_act_roundtrip():
    from ttasr.ops.quant import quantize_act

    rng = np.random.default_rng(1)
    x = rng.standard_normal((6, 40)).astype(np.float32) * 3.0
    xq, xs = quantize_act(x)
    assert np.asarray(xq).dtype == np.int8
    assert xs.shape == (6, 1)
    deq = np.asarray(xq, np.float32) * np.asarray(xs)
    rel = np.abs(deq - x).max() / np.abs(x).max()
    assert rel < 0.01


def test_quant_matmul_act8_close():
    import jax.numpy as jnp

    from ttasr.ops.quant import quant_matmul_act8, quantize_act

    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 24, 32)).astype(np.float32)
    w = rng.standard_normal((32, 48)).astype(np.float32) * 0.1
    b = rng.standard_normal((48,)).astype(np.float32) * 0.05
    leaf = quantize_tensor(w)
    xq, xs = quantize_act(jnp.asarray(x))
    got = np.asarray(quant_matmul_act8(xq, xs, leaf, b,
                                       out_dtype=jnp.float32))
    want = x @ w + b
    # two 8-bit quantizations (activation rows + weight columns)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 0.03, err


def test_act8_encoder_blocks_close():
    """_mlp_act8 vs the bf16 quantized-weight MLP (kernel-free path);
    the attention block is covered by test_self_attn_act8_close."""
    import jax.numpy as jnp

    from ttasr.models.whisper.model import _mlp, _mlp_act8
    from ttasr.ops.quant import quantize_params

    cfg = _cfg()
    params = init_params(cfg, seed=3, dtype=jnp.float32)
    qparams = quantize_params(params)
    blkq = {k: (v if not isinstance(v, dict) else
                {"q": v["q"][0], "s": v["s"][0]})
            for k, v in qparams["encoder"]["blocks"].items()
            if not isinstance(v, dict) or set(v.keys()) == {"q", "s"}}
    # non-quantized per-layer leaves (biases, lns) need slicing too
    for k, v in qparams["encoder"]["blocks"].items():
        if not isinstance(v, dict):
            blkq[k] = v[0]
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, cfg.d_model)), jnp.float32)
    want = np.asarray(_mlp(x, blkq))
    got = np.asarray(_mlp_act8(x, blkq))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 0.05, err


def test_self_attn_act8_close():
    """_self_attn_act8 (incl. the dh**-0.5 fold into row scales + bias)
    vs the unfused bf16 attention on the same quantized weights.

    The merged kernel runs in interpret mode (CPU backend); shapes meet
    its contract: dh = 64, d % 128 == 0, T a multiple of 256, and
    t_real = T so the unfused reference (which never masks) matches.
    """
    import jax.numpy as jnp

    from ttasr.models.whisper.model import _self_attn, _self_attn_act8

    d, n_heads, t = 128, 2, 256
    rng = np.random.default_rng(5)

    def wleaf(scale=0.1):
        return quantize_tensor(
            rng.standard_normal((d, d)).astype(np.float32) * scale)

    blk = {
        "wq": wleaf(), "wk": wleaf(), "wv": wleaf(), "wo": wleaf(),
        "bq": jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.05,
        "bv": jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.05,
        "bo": jnp.asarray(rng.standard_normal((d,)), jnp.float32) * 0.05,
    }
    x = jnp.asarray(rng.standard_normal((2, t, d)), jnp.float32)
    want = np.asarray(_self_attn(x, blk, n_heads, fused=False))
    got = np.asarray(
        _self_attn_act8(x, blk, n_heads, t, interpret=True))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 0.06, err
