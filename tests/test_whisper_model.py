"""Logit parity: ttasr JAX Whisper vs transformers torch Whisper.

Weights cannot be downloaded in this environment, so we instantiate a
random-init HF model from a small config, convert its state dict, and
require logits to agree to f32 tolerance.  This validates layer math,
weight conversion, masks, and the KV-cache incremental path.
"""

import numpy as np
import pytest

from ttasr.models.whisper import (
    WhisperConfig,
    decode_step,
    decode_train,
    encode,
    init_cache,
    params_from_hf_model,
)

TINY = dict(
    vocab_size=257,
    num_mel_bins=80,
    d_model=64,
    encoder_layers=2,
    encoder_attention_heads=4,
    decoder_layers=2,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    max_source_positions=64,
    max_target_positions=64,
)


@pytest.fixture(scope="module")
def hf_and_ours():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        **TINY, dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    params, cfg = params_from_hf_model(hf)
    return hf, params, cfg


@pytest.fixture(scope="module")
def mel_and_tokens():
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 128)).astype(np.float32) * 0.5
    tokens = rng.integers(0, 257, size=(2, 7)).astype(np.int64)
    return mel, tokens


def test_encoder_parity(hf_and_ours, mel_and_tokens):
    import torch

    hf, params, cfg = hf_and_ours
    mel, _ = mel_and_tokens
    with torch.no_grad():
        golden = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(encode(params, cfg, mel))
    assert ours.shape == golden.shape
    assert np.max(np.abs(ours - golden)) < 3e-3


def test_full_logits_parity(hf_and_ours, mel_and_tokens):
    import torch

    hf, params, cfg = hf_and_ours
    mel, tokens = mel_and_tokens
    with torch.no_grad():
        golden = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()
    enc = encode(params, cfg, mel)
    ours = np.asarray(decode_train(params, cfg, tokens.astype(np.int32), enc))
    assert ours.shape == golden.shape
    assert np.max(np.abs(ours - golden)) < 8e-3


def test_prefill_matches_teacher_forced_exactly(hf_and_ours, mel_and_tokens):
    # Same-shape computations must agree bit-for-bit: a full-sequence
    # prefill through the cache path IS the teacher-forced pass.
    hf, params, cfg = hf_and_ours
    mel, tokens = mel_and_tokens
    tokens = tokens.astype(np.int32)
    enc = encode(params, cfg, mel)
    full = np.asarray(decode_train(params, cfg, tokens, enc))
    cache = init_cache(params, cfg, enc, max_len=16)
    logits, _ = decode_step(params, cfg, tokens, 0, cache)
    # same-shape math; only the scan-vs-inline cross-KV fusion differs
    np.testing.assert_allclose(np.asarray(logits), full, atol=1e-5)


def test_incremental_matches_teacher_forced(hf_and_ours, mel_and_tokens):
    # Step-by-step decode differs from the batched pass only by f32
    # accumulation order (different matmul shapes select different BLAS
    # paths on CPU); bound the drift tightly relative to logit scale.
    hf, params, cfg = hf_and_ours
    mel, tokens = mel_and_tokens
    tokens = tokens.astype(np.int32)
    enc = encode(params, cfg, mel)
    full = np.asarray(decode_train(params, cfg, tokens, enc))

    cache = init_cache(params, cfg, enc, max_len=16)
    # prefill first 3 tokens, then step one-by-one
    logits_p, cache = decode_step(params, cfg, tokens[:, :3], 0, cache)
    step_logits = [np.asarray(logits_p)]
    for i in range(3, tokens.shape[1]):
        l, cache = decode_step(params, cfg, tokens[:, i : i + 1], i, cache)
        step_logits.append(np.asarray(l))
    inc = np.concatenate(step_logits, axis=1)
    assert inc.shape == full.shape
    assert np.max(np.abs(inc - full)) < 5e-3
    # and argmax agreement (what decoding actually consumes)
    assert (inc.argmax(-1) == full.argmax(-1)).mean() > 0.95


def test_cache_positions_independent_of_max_len(hf_and_ours, mel_and_tokens):
    hf, params, cfg = hf_and_ours
    mel, tokens = mel_and_tokens
    tokens = tokens.astype(np.int32)
    enc = encode(params, cfg, mel)
    c1 = init_cache(params, cfg, enc, max_len=8)
    c2 = init_cache(params, cfg, enc, max_len=32)
    l1, _ = decode_step(params, cfg, tokens[:, :4], 0, c1)
    l2, _ = decode_step(params, cfg, tokens[:, :4], 0, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
