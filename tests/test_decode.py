"""Decoding tests: timestamp rules vs HF's WhisperTimeStampLogitsProcessor,
greedy/beam behavior, prompt padding invariance."""

import numpy as np
import pytest

from ttasr.models.whisper import encode, params_from_hf_model
from ttasr.models.whisper.decode import (
    DecodingOptions,
    TokenizerInfo,
    beam_decode,
    build_prompt,
    compression_ratio,
    greedy_decode,
    pad_prompts,
)
from ttasr.text.tokenizer import build_byte_fallback_tokenizer

TOK = build_byte_fallback_tokenizer()
VOCAB = TOK.vocab_size


@pytest.fixture(scope="module")
def model():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        vocab_size=VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=64, max_target_positions=448,
        dropout=0.0, pad_token_id=TOK.eot, bos_token_id=TOK.eot,
        eos_token_id=TOK.eot, decoder_start_token_id=TOK.sot,
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    params, cfg = params_from_hf_model(hf)
    return hf, params, cfg


@pytest.fixture(scope="module")
def enc_out(model):
    _, params, cfg = model
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 128)).astype(np.float32) * 0.4
    return mel, encode(params, cfg, mel)


def _ti():
    return TokenizerInfo.from_tokenizer(TOK, n_vocab=VOCAB)


def _run_greedy(params, cfg, enc, prompt_ids, sample_len=24, temperature=0.0,
                without_timestamps=False):
    import jax

    opts = DecodingOptions(
        temperature=temperature, sample_len=sample_len,
        without_timestamps=without_timestamps,
    )
    prompt, pad = pad_prompts([prompt_ids], TOK.eot)
    out = greedy_decode(
        params, cfg, enc, prompt, pad, jax.random.PRNGKey(0),
        opts=opts, ti=_ti(),
    )
    n = int(out["lengths"][0])
    return [int(t) for t in np.asarray(out["tokens"][0])[:n]], out


def test_greedy_matches_hf_timestamp_processor(model, enc_out):
    """Manual torch greedy with HF's timestamp processor + the same static
    suppress mask must produce the identical token sequence."""
    import torch
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor,
    )

    hf, params, cfg = model
    mel, enc = enc_out
    ti = _ti()
    prompt_ids = TOK.sot_sequence("zh", "transcribe", predict_timestamps=True)

    class GenCfg:
        eos_token_id = TOK.eot
        no_timestamps_token_id = TOK.no_timestamps
        max_initial_timestamp_index = 50
        _detect_timestamp_from_logprob = True

    proc = WhisperTimeStampLogitsProcessor(GenCfg(), begin_index=len(prompt_ids))

    from ttasr.models.whisper.decode import _static_suppress_mask

    static_mask = torch.from_numpy(np.asarray(_static_suppress_mask(ti)))
    blank_ids = TOK.encode(" ") + [TOK.eot]

    tokens = torch.tensor([prompt_ids], dtype=torch.long)
    golden = []
    with torch.no_grad():
        enc_t = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state
        for step in range(24):
            logits = hf(
                decoder_input_ids=tokens, encoder_outputs=(enc_t,)
            ).logits[:, -1].float()
            logits = logits + static_mask
            if step == 0:
                logits[:, blank_ids] = float("-inf")
            logits = proc(tokens, logits)
            nxt = int(torch.argmax(logits, dim=-1))
            if nxt == TOK.eot:
                break
            golden.append(nxt)
            tokens = torch.cat([tokens, torch.tensor([[nxt]])], dim=1)

    ours, _ = _run_greedy(params, cfg, enc, prompt_ids, sample_len=24)
    assert ours == golden, f"{ours} != {golden}"


def test_greedy_timestamp_structure(model, enc_out):
    _, params, cfg = model
    _, enc = enc_out
    prompt_ids = TOK.sot_sequence("zh", predict_timestamps=True)
    toks, _ = _run_greedy(params, cfg, enc, prompt_ids, sample_len=32)
    assert len(toks) > 0
    # first sampled token must be a timestamp <= <|1.00|>
    assert TOK.is_timestamp(toks[0])
    assert toks[0] <= TOK.timestamp_begin + 50
    # timestamps must be monotonically non-decreasing
    ts = [t for t in toks if TOK.is_timestamp(t)]
    assert ts == sorted(ts)
    # none of the static suppress list appears
    assert not (set(toks) & set(_ti().suppress))


def test_without_timestamps_mode(model, enc_out):
    _, params, cfg = model
    _, enc = enc_out
    prompt_ids = TOK.sot_sequence("zh", predict_timestamps=False)
    toks, _ = _run_greedy(
        params, cfg, enc, prompt_ids, sample_len=16, without_timestamps=True
    )
    assert all(not TOK.is_timestamp(t) for t in toks)


def test_prompt_padding_invariance(model, enc_out):
    """The left-padded prompt buffer must behave identically regardless of
    junk in the padding region."""
    _, params, cfg = model
    _, enc = enc_out
    import jax

    prompt_ids = TOK.sot_sequence("zh", predict_timestamps=True)
    opts = DecodingOptions(sample_len=12)
    p1, pad1 = pad_prompts([prompt_ids], TOK.eot)
    p2 = p1.copy()
    p2[0, : pad1[0]] = 7  # different pad garbage
    o1 = greedy_decode(params, cfg, enc, p1, pad1, jax.random.PRNGKey(0),
                       opts=opts, ti=_ti())
    o2 = greedy_decode(params, cfg, enc, p2, pad1, jax.random.PRNGKey(0),
                       opts=opts, ti=_ti())
    np.testing.assert_array_equal(np.asarray(o1["tokens"]), np.asarray(o2["tokens"]))


def test_conditioning_changes_prompt(model, enc_out):
    prev = TOK.encode("previous window text")
    prompt = build_prompt(TOK, language="zh", previous_tokens=prev)
    assert prompt[0] == TOK.sot_prev
    assert prompt[-3:] == TOK.sot_sequence("zh", predict_timestamps=True)
    bare = build_prompt(TOK, language="zh")
    assert bare == TOK.sot_sequence("zh", predict_timestamps=True)


def test_beam_size_one_matches_greedy(model, enc_out):
    _, params, cfg = model
    _, enc = enc_out
    import jax

    prompt_ids = TOK.sot_sequence("zh", predict_timestamps=True)
    prompt, pad = pad_prompts([prompt_ids], TOK.eot)
    g = greedy_decode(params, cfg, enc, prompt, pad, jax.random.PRNGKey(0),
                      opts=DecodingOptions(sample_len=16), ti=_ti())
    b = beam_decode(params, cfg, enc, prompt, pad, jax.random.PRNGKey(0),
                    opts=DecodingOptions(sample_len=16, beam_size=1), ti=_ti())
    ng, nb = int(g["lengths"][0]), int(b["lengths"][0])
    assert np.asarray(g["tokens"])[0, :ng].tolist() == \
        np.asarray(b["tokens"])[0, :nb].tolist()


def test_beam_search_runs_and_is_no_worse(model, enc_out):
    _, params, cfg = model
    _, enc = enc_out
    import jax

    prompt_ids = TOK.sot_sequence("zh", predict_timestamps=True)
    prompt, pad = pad_prompts([prompt_ids], TOK.eot)
    g = greedy_decode(params, cfg, enc, prompt, pad, jax.random.PRNGKey(0),
                      opts=DecodingOptions(sample_len=16), ti=_ti())
    b = beam_decode(params, cfg, enc, prompt, pad, jax.random.PRNGKey(0),
                    opts=DecodingOptions(sample_len=16, beam_size=3), ti=_ti())
    # beam search maximizes sum logprob; must be >= greedy's (same rules)
    assert float(b["sum_logprob"][0]) >= float(g["sum_logprob"][0]) - 1e-4


def test_compression_ratio():
    assert compression_ratio("aaaaaaaaaaaaaaaaaaaaaaaaaaaa") > 2.0
    assert compression_ratio("the quick brown fox") < 1.5
    assert compression_ratio("") == 0.0


def test_bucketed_growth_consistency(model, enc_out):
    """Decoding across cache-growth buckets must equal a single flat
    bucket (greedy prefix + beam exact)."""
    import jax

    from ttasr.models.whisper import decode as D

    _, params, cfg = model
    _, enc = enc_out
    prompt_ids = TOK.sot_sequence("zh", predict_timestamps=True)
    prompt, pad = pad_prompts([prompt_ids], TOK.eot)
    key = jax.random.PRNGKey(0)
    opts = DecodingOptions(sample_len=48, beam_size=2)

    bucketed = beam_decode(params, cfg, enc, prompt, pad, key,
                           opts=opts, ti=_ti())
    orig = D._growth_buckets
    D._growth_buckets = lambda mp, sl, min_cap=32: [mp + sl]
    try:
        flat = beam_decode.__wrapped__(params, cfg, enc, prompt, pad, key,
                                       opts=opts, ti=_ti())
    finally:
        D._growth_buckets = orig
    np.testing.assert_array_equal(
        np.asarray(bucketed["tokens"]), np.asarray(flat["tokens"])
    )


def test_kv_int8_mode_runs(model, enc_out):
    import jax

    _, params, cfg = model
    _, enc = enc_out
    prompt, pad = pad_prompts([TOK.sot_sequence("zh", predict_timestamps=True)],
                              TOK.eot)
    out = greedy_decode(
        params, cfg, enc, prompt, pad, jax.random.PRNGKey(0),
        opts=DecodingOptions(sample_len=12, kv_int8=True), ti=_ti(),
    )
    assert np.asarray(out["tokens"]).shape == (1, 12)


def test_pallas_cross_attention_matches_xla_fallback():
    """The fused kernel (interpret mode on CPU) must match the XLA
    folded-scale path on identical quantized caches."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.model import _quant_self_attention, quantize_kv
    from ttasr.ops.cross_attention_pallas import (
        cross_attention_int8,
        transpose_scales,
    )

    rng = np.random.default_rng(3)
    B, K, H, Dh, S, S_REAL = 2, 5, 4, 64, 96, 90
    q = jnp.asarray(rng.standard_normal((B, K, H, Dh)), jnp.float32) * 0.5
    ck = jnp.asarray(rng.standard_normal((B, S, H, Dh)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((B, S, H, Dh)), jnp.float32)
    ck8, cks = quantize_kv(ck)
    cv8, cvs = quantize_kv(cv)

    got = np.asarray(cross_attention_int8(
        q, ck8.reshape(B, S, H * Dh), transpose_scales(cks),
        cv8.reshape(B, S, H * Dh), transpose_scales(cvs), S_REAL,
        interpret=True,
    ))
    mask = (jnp.arange(S)[None, :] < S_REAL)[None, None]
    ref = np.asarray(_quant_self_attention(
        q.reshape(B, K, H, Dh), ck8, cks, cv8, cvs, mask
    ))
    assert np.abs(got - ref).max() < 5e-3


def test_finished_set_insert_vectorization():
    """The one-hot finished-set insert in beam_decode matches a
    sequential reference over random eot patterns."""
    import numpy as np

    rng = np.random.default_rng(7)
    B, K, T = 3, 5, 12
    for _ in range(50):
        fin_tokens = rng.integers(0, 100, (B, K, T))
        fin_len = rng.integers(0, T, (B, K))
        fin_logprob = rng.standard_normal((B, K)).astype(np.float32)
        fin_count = rng.integers(0, K + 1, (B,))
        is_eot = rng.random((B, 2 * K)) < 0.4
        top_val = -np.abs(rng.standard_normal((B, 2 * K))).astype(np.float32)
        cand_tokens = rng.integers(0, 100, (B, 2 * K, T))
        cand_n = rng.integers(0, T, (B, 2 * K))

        # sequential reference (openai BeamSearchDecoder.update: scan
        # candidates best-first, STOP at the K-th non-eot survivor — an
        # eot finishes only while fewer than K survivors are collected)
        ft, fl, fp = fin_tokens.copy(), fin_len.copy(), fin_logprob.copy()
        fc = fin_count.copy()
        for b in range(B):
            c = int(fin_count[b])
            survivors = 0
            for i in range(2 * K):
                if is_eot[b, i]:
                    if survivors < K and c < K:
                        ft[b, c] = cand_tokens[b, i]
                        fl[b, c] = cand_n[b, i]
                        fp[b, c] = top_val[b, i]
                        c += 1
                else:
                    survivors += 1
            fc[b] = c

        # vectorized (mirrors decode.py beam body)
        non_eot = (~is_eot).astype(np.int32)
        non_eot_before = np.cumsum(non_eot, axis=1) - non_eot
        qualifies = is_eot & (non_eot_before < K)
        eot_rank = np.cumsum(qualifies, axis=1) - 1
        slot = fin_count[:, None] + eot_rank
        can_store = qualifies & (slot < K) & (eot_rank >= 0)
        sel = can_store[:, None, :] & (
            slot[:, None, :] == np.arange(K)[None, :, None])
        has = sel.any(axis=2)
        idx = sel.argmax(axis=2)
        got_tokens = np.take_along_axis(cand_tokens, idx[:, :, None], axis=1)
        vt = np.where(has[:, :, None], got_tokens, fin_tokens)
        vl = np.where(has, np.take_along_axis(cand_n, idx, axis=1), fin_len)
        vp = np.where(has, np.take_along_axis(top_val, idx, axis=1),
                      fin_logprob)
        vc = np.minimum(fin_count + can_store.sum(axis=1), K)

        np.testing.assert_array_equal(vt, ft)
        np.testing.assert_array_equal(vl, fl)
        np.testing.assert_array_equal(vp, fp)
        np.testing.assert_array_equal(vc, fc)


def test_pad_prompts_bucket_schedule():
    """Conditioned-prompt buckets (VERDICT round-2 #7): the steady-state
    condition_on_previous_text prompt (<=131 tokens) lands in the 144
    bucket, not the full 256-wide prefill."""
    for n, want in [(3, 16), (17, 32), (40, 64), (131, 144), (150, 256)]:
        prompt, pad = pad_prompts([[1] * n], 0)
        assert prompt.shape == (1, want), (n, prompt.shape)
        assert pad[0] == want - n


def test_conditioned_bucket_width_invariance(model, enc_out):
    """A conditioned prompt decoded in the 144 bucket must emit the same
    tokens as in the 256 buffer (left-pad masking + position shift)."""
    _, params, cfg = model
    _, enc = enc_out
    import jax

    prev = TOK.encode("previous window text " * 10)
    prompt_ids = build_prompt(TOK, language="zh", previous_tokens=prev)
    assert 64 < len(prompt_ids) <= 144
    opts = DecodingOptions(sample_len=12)
    p1, pad1 = pad_prompts([prompt_ids], TOK.eot)           # 144 bucket
    p2, pad2 = pad_prompts([prompt_ids], TOK.eot, width=256)
    assert p1.shape[1] == 144 and p2.shape[1] == 256
    o1 = greedy_decode(params, cfg, enc, p1, pad1, jax.random.PRNGKey(0),
                       opts=opts, ti=_ti())
    o2 = greedy_decode(params, cfg, enc, p2, pad2, jax.random.PRNGKey(0),
                       opts=opts, ti=_ti())
    n1, n2 = int(o1["lengths"][0]), int(o2["lengths"][0])
    assert n1 == n2
    assert (np.asarray(o1["tokens"])[0, :n1].tolist()
            == np.asarray(o2["tokens"])[0, :n2].tolist())


def test_fused_rules_logprobs_matches_two_stage():
    """_apply_rules_logprobs == log_softmax(_apply_rules(...)) over random
    logits and rule states, including rows where the probability-mass rule
    forces a timestamp (the analytically-renormalized branch)."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.decode import (
        _apply_rules,
        _apply_rules_logprobs,
        _static_suppress_mask,
    )

    ti = _ti()
    static_mask = jnp.asarray(_static_suppress_mask(ti))
    rng = np.random.default_rng(7)
    n = 12
    logits = rng.standard_normal((n, VOCAB)).astype(np.float32) * 2.0
    # Push some rows toward force-timestamp: boost the timestamp block
    logits[:4, ti.timestamp_begin:] += 6.0
    ts0 = ti.timestamp_begin
    n_sampled = jnp.asarray(
        rng.integers(0, 6, (n,)), jnp.int32).at[0].set(0)
    last = jnp.asarray(
        rng.choice([5, 17, ts0 + 3, ts0 + 9], (n,)), jnp.int32)
    penult = jnp.asarray(
        rng.choice([5, 17, ts0 + 2, ts0 + 8], (n,)), jnp.int32)
    max_ts = jnp.asarray(
        rng.choice([0, ts0 + 1, ts0 + 7], (n,)), jnp.int32)

    for without_ts in (False, True):
        opts = DecodingOptions(sample_len=16, without_timestamps=without_ts)
        kw = dict(ti=ti, opts=opts, static_mask=static_mask,
                  n_sampled=n_sampled, last_tok=last, penult_tok=penult,
                  max_ts_tok=max_ts)
        want = jax.nn.log_softmax(
            _apply_rules(jnp.asarray(logits), **kw), axis=-1)
        got = _apply_rules_logprobs(jnp.asarray(logits), **kw)
        want_np, got_np = np.asarray(want), np.asarray(got)
        finite = np.isfinite(want_np)
        assert (finite == np.isfinite(got_np)).all()
        np.testing.assert_allclose(
            got_np[finite], want_np[finite], rtol=1e-5, atol=1e-5)


def test_pad_vocab_ids_suppressed():
    """Models whose head is wider than the tokenizer's id space (e.g. the
    byte-fallback test tokenizer under a 51866-wide head) must never emit
    the padding ids: they decode to nothing, and being >= timestamp_begin
    they would parse as absurd timestamps (hours-long seek advances —
    the bench_e2e.py round-4 failure mode)."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.decode import (
        DecodingOptions, TokenizerInfo, _static_suppress_mask, beam_decode,
        pad_prompts)
    from ttasr.models.whisper.model import init_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    n_vocab = tok.vocab_size + 512  # padded head
    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=n_vocab)
    assert ti.pad_vocab_begin == max(tok.vocab_size,
                                     tok.timestamp_begin + 1501)
    mask = _static_suppress_mask(ti)
    assert (mask[ti.pad_vocab_begin:] < -1e30).all()
    assert mask[ti.timestamp_begin] == 0.0

    # full-vocab tokenizers mask nothing extra
    ti_full = TokenizerInfo.from_tokenizer(tok, n_vocab=tok.vocab_size)
    assert ti_full.pad_vocab_begin is None

    # decode end-to-end: no emitted id reaches the padding range
    cfg = WhisperConfig(name="t", vocab_size=n_vocab, num_mel_bins=80,
                        d_model=64, encoder_layers=2, encoder_heads=4,
                        decoder_layers=2, decoder_heads=4, ffn_dim=128,
                        max_source_positions=32)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(rng.standard_normal(
        (2, cfg.max_source_positions, cfg.d_model)).astype(np.float32))
    prompt, pad = pad_prompts([[ti.sot]] * 2, ti.eot, width=16)
    out = beam_decode(params, cfg, enc_out, prompt, pad,
                      jax.random.PRNGKey(0),
                      opts=DecodingOptions(beam_size=3, sample_len=12),
                      ti=ti)
    toks = np.asarray(out["tokens"])
    lens = np.asarray(out["lengths"])
    for row, n in zip(toks, lens):
        assert (row[:n] < ti.pad_vocab_begin).all(), row[:n]


def test_cross_attn_quantized_masks_pad_slots():
    """Short-window decode (VERDICT r3 #6) passes ``s_real`` = the
    pre-padding encoder length; init_cache pads the source axis to a
    sublane multiple (8 for int8, 16 for int4).  Junk written into the
    pad slots must never reach the attention output — in the fused
    kernel branch (single-token, interpret on CPU) and the XLA fallback
    (prefill) branch, for int8 and nibble-packed int4 caches."""
    import jax.numpy as jnp

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.decode import _cross_attn_quantized
    from ttasr.models.whisper.model import init_cache, init_params
    from ttasr.ops.quant import quantize_params

    cfg = WhisperConfig(name="s", vocab_size=64, num_mel_bins=80,
                        d_model=128, encoder_layers=1, encoder_heads=2,
                        decoder_layers=1, decoder_heads=2, ffn_dim=128,
                        max_source_positions=64)
    params = quantize_params(init_params(cfg, seed=0))
    rng = np.random.default_rng(3)
    s_real = 20
    enc = jnp.asarray(
        rng.standard_normal((1, s_real, cfg.d_model)).astype(np.float32))
    for int4 in (False, True):
        cache = init_cache(params, cfg, enc, max_len=8, kv_int8=True,
                           cross_kv_int8=True, cross_kv_int4=int4)
        ck, cv = cache.cross_k[0], cache.cross_v[0]
        cks, cvs = cache.cks[0], cache.cvs[0]
        if int4:
            # sublane-half packing (ttasr/ops/int4.py): byte [r, d] holds
            # slot r (low nibble) and slot r + S/2 (high nibble); with
            # S=32, s_real=20 the pad slots 20..31 are the HIGH nibbles
            # of rows >= 4 — junk only those, keeping the real low slots
            row0 = s_real - ck.shape[1]        # s_real - S/2
            assert 0 < row0 < ck.shape[1]

            def junk4(x):
                return x.at[:, row0:, :].set(
                    (x[:, row0:, :] & 0xF) | 0xF0)
            ck_j, cv_j = junk4(ck), junk4(cv)
        else:
            assert ck.shape[1] > s_real, "expected padded source slots"
            ck_j = ck.at[:, s_real:, :].set(127)
            cv_j = cv.at[:, s_real:, :].set(127)
        cks_j = cks.at[:, :, s_real:].set(1e4)
        cvs_j = cvs.at[:, :, s_real:].set(1e4)
        for t in (1, 4):   # kernel branch (t=1) and XLA fallback (t=4)
            qc = jnp.asarray(rng.standard_normal(
                (1, t, 2, 64)).astype(np.float32))
            base = _cross_attn_quantized(qc, cfg, ck, cks, cv, cvs, s_real)
            got = _cross_attn_quantized(qc, cfg, ck_j, cks_j, cv_j, cvs_j,
                                        s_real)
            np.testing.assert_array_equal(np.asarray(base), np.asarray(got),
                                          err_msg=f"int4={int4} t={t}")
