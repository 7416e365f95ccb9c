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
