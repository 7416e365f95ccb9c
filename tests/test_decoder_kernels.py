"""Fused decoder Pallas kernels — correctness vs the XLA reference
(interpret mode on CPU; the real win is measured on TPU, PERF_NOTES.md)."""

from dataclasses import replace as dataclasses_replace

import numpy as np
import pytest

from ttasr.ops.quant import quantize_tensor


def _ref_mlp(x, ln_s, ln_b, w1, b1, w2, b2):
    from scipy.special import erf

    x32 = x.astype(np.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    ln = (x32 - mu) / np.sqrt(var + 1e-5) * ln_s + ln_b
    h = ln @ w1 + b1
    h = 0.5 * h * (1 + erf(h / np.sqrt(2)))
    return x32 + h @ w2 + b2


@pytest.mark.parametrize("shape", [(16, 256, 1024), (8, 128, 512)])
def test_mlp_int8_fused_matches_reference(shape):
    import jax.numpy as jnp

    from ttasr.ops.decoder_mlp_pallas import mlp_int8_fused

    r, d, f = shape
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((r, d)) * 0.3).astype(np.float32)
    ln_s = (rng.standard_normal(d) * 0.1 + 1).astype(np.float32)
    ln_b = (rng.standard_normal(d) * 0.1).astype(np.float32)
    w1 = (rng.standard_normal((d, f)) * 0.05).astype(np.float32)
    w2 = (rng.standard_normal((f, d)) * 0.05).astype(np.float32)
    b1 = (rng.standard_normal(f) * 0.02).astype(np.float32)
    b2 = (rng.standard_normal(d) * 0.02).astype(np.float32)
    q1, q2 = quantize_tensor(w1), quantize_tensor(w2)

    got = np.asarray(mlp_int8_fused(
        jnp.asarray(x), ln_s, ln_b, q1["q"], q1["s"], b1,
        q2["q"], q2["s"], b2, interpret=True,
    ))
    w1d = q1["q"].astype(np.float32) * q1["s"]
    w2d = q2["q"].astype(np.float32) * q2["s"]
    want = _ref_mlp(x, ln_s, ln_b, w1d, b1, w2d, b2)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 5e-2, rel  # bf16 compute tolerance


def test_qkv_and_attnout_kernels_match_reference():
    import jax.numpy as jnp

    from ttasr.ops.decoder_blocks_pallas import attnout_ln_q_fused, qkv_int8_fused

    rng = np.random.default_rng(1)
    r, d = 16, 256
    x = (rng.standard_normal((r, d)) * 0.3).astype(np.float32)
    attn = (rng.standard_normal((r, d)) * 0.3).astype(np.float32)
    ln_s = (rng.standard_normal(d) * 0.1 + 1).astype(np.float32)
    ln_b = (rng.standard_normal(d) * 0.1).astype(np.float32)
    wqkv = (rng.standard_normal((d, 3 * d)) * 0.05).astype(np.float32)
    bqkv = (rng.standard_normal(3 * d) * 0.02).astype(np.float32)
    qq = quantize_tensor(wqkv)

    got = np.asarray(qkv_int8_fused(jnp.asarray(x), ln_s, ln_b,
                                    qq["q"], qq["s"], bqkv, interpret=True))
    x32 = x.astype(np.float32)
    mu = x32.mean(-1, keepdims=True); var = x32.var(-1, keepdims=True)
    ln = (x32 - mu) / np.sqrt(var + 1e-5) * ln_s + ln_b
    want = ln @ (qq["q"].astype(np.float32) * qq["s"]) + bqkv
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 5e-2, rel

    wo = (rng.standard_normal((d, d)) * 0.05).astype(np.float32)
    bo = (rng.standard_normal(d) * 0.02).astype(np.float32)
    wqc = (rng.standard_normal((d, d)) * 0.05).astype(np.float32)
    bqc = (rng.standard_normal(d) * 0.02).astype(np.float32)
    qo, qc_ = quantize_tensor(wo), quantize_tensor(wqc)
    xo, qc = attnout_ln_q_fused(
        jnp.asarray(x), jnp.asarray(attn), qo["q"], qo["s"], bo,
        ln_s, ln_b, qc_["q"], qc_["s"], bqc, interpret=True,
    )
    xo, qc = np.asarray(xo), np.asarray(qc)
    want_xo = x32 + attn @ (qo["q"].astype(np.float32) * qo["s"]) + bo
    mu = want_xo.mean(-1, keepdims=True); var = want_xo.var(-1, keepdims=True)
    lnx = (want_xo - mu) / np.sqrt(var + 1e-5) * ln_s + ln_b
    want_qc = lnx @ (qc_["q"].astype(np.float32) * qc_["s"]) + bqc
    assert np.abs(xo - want_xo).max() / np.abs(want_xo).max() < 5e-2
    assert np.abs(qc - want_qc).max() / np.abs(want_qc).max() < 5e-2


def test_mlp_with_crossout_matches_composition():
    import jax.numpy as jnp

    from ttasr.ops.decoder_mlp_pallas import mlp_int8_fused, mlp_with_crossout_int8

    rng = np.random.default_rng(2)
    r, d, f = 16, 256, 1024
    x = (rng.standard_normal((r, d)) * 0.3).astype(np.float32)
    cross = (rng.standard_normal((r, d)) * 0.3).astype(np.float32)
    woc = quantize_tensor((rng.standard_normal((d, d)) * 0.05).astype(np.float32))
    boc = (rng.standard_normal(d) * 0.02).astype(np.float32)
    ln_s = (rng.standard_normal(d) * 0.1 + 1).astype(np.float32)
    ln_b = (rng.standard_normal(d) * 0.1).astype(np.float32)
    q1 = quantize_tensor((rng.standard_normal((d, f)) * 0.05).astype(np.float32))
    q2 = quantize_tensor((rng.standard_normal((f, d)) * 0.05).astype(np.float32))
    b1 = (rng.standard_normal(f) * 0.02).astype(np.float32)
    b2 = (rng.standard_normal(d) * 0.02).astype(np.float32)

    got = np.asarray(mlp_with_crossout_int8(
        jnp.asarray(x), jnp.asarray(cross), woc["q"], woc["s"], boc,
        ln_s, ln_b, q1["q"], q1["s"], b1, q2["q"], q2["s"], b2,
        interpret=True,
    ))
    xn = x + cross @ (woc["q"].astype(np.float32) * woc["s"]) + boc
    want = np.asarray(mlp_int8_fused(
        jnp.asarray(xn.astype(np.float32)), ln_s, ln_b,
        q1["q"], q1["s"], b1, q2["q"], q2["s"], b2, interpret=True,
    ))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel


def test_fused_decode_path_matches_unfused_int8():
    """greedy_decode through the fused Pallas layer kernels (interpret on
    CPU) emits the same tokens as the unfused int8 XLA path."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.decode import (
        DecodingOptions,
        TokenizerInfo,
        greedy_decode,
        pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    cfg = WhisperConfig(
        name="micro", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=256,
    )
    params = init_params(cfg, seed=0)
    qparams = quantize_params(params)
    fparams = fuse_qkv(qparams)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 48000)).astype(np.float32) * 0.1
    from ttasr.ops.mel import log_mel_spectrogram

    mel = log_mel_spectrogram(audio, n_mels=80)
    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    opts = DecodingOptions(beam_size=1, sample_len=12, kv_int8=True)
    prompt, pad = pad_prompts(
        [tok.sot_sequence("zh", predict_timestamps=True)] * 2, tok.eot)
    key = jax.random.PRNGKey(0)

    enc_q = encode(qparams, cfg, mel)
    out_ref = greedy_decode(qparams, cfg, enc_q, prompt, pad, key,
                            opts=opts, ti=ti)
    enc_f = encode(fparams, cfg, mel)
    out_fused = greedy_decode(fparams, cfg, enc_f, prompt, pad, key,
                              opts=opts, ti=ti)
    ref_tok = np.asarray(out_ref["tokens"])
    fus_tok = np.asarray(out_fused["tokens"])
    lengths = np.asarray(out_ref["lengths"])
    for b in range(2):
        n = int(lengths[b])
        assert list(ref_tok[b, :n]) == list(fus_tok[b, :n]), b


def test_attnout_cross_int8_matches_composition():
    """attnout_ln_q_cross_int8 == attnout_ln_q_fused + dequantized-KV
    cross attention (interpret mode)."""
    import jax.numpy as jnp

    from ttasr.models.whisper.model import quantize_kv
    from ttasr.ops.decoder_blocks_pallas import (
        attnout_ln_q_cross_int8,
        attnout_ln_q_fused,
    )

    rng = np.random.default_rng(3)
    b, k_pad, h, dh, s, s_real = 2, 8, 4, 64, 48, 45
    d = h * dh
    x = (rng.standard_normal((b, k_pad, d)) * 0.3).astype(np.float32)
    attn = (rng.standard_normal((b, k_pad, d)) * 0.3).astype(np.float32)
    ln_s = (rng.standard_normal(d) * 0.1 + 1).astype(np.float32)
    ln_b = (rng.standard_normal(d) * 0.1).astype(np.float32)
    wo = quantize_tensor((rng.standard_normal((d, d)) * 0.05).astype(np.float32))
    bo = (rng.standard_normal(d) * 0.02).astype(np.float32)
    wqc = quantize_tensor((rng.standard_normal((d, d)) * 0.05).astype(np.float32))
    bqc = (rng.standard_normal(d) * 0.02).astype(np.float32)
    ck = (rng.standard_normal((b, s, h, dh)) * 0.5).astype(np.float32)
    cv = (rng.standard_normal((b, s, h, dh)) * 0.5).astype(np.float32)
    ck8, cks = quantize_kv(jnp.asarray(ck))
    cv8, cvs = quantize_kv(jnp.asarray(cv))
    cks_t = jnp.swapaxes(cks, 1, 2)  # (B, H, S)
    cvs_t = jnp.swapaxes(cvs, 1, 2)

    xo_g, cross_g = attnout_ln_q_cross_int8(
        jnp.asarray(x), jnp.asarray(attn),
        wo["q"], wo["s"], bo, ln_s, ln_b, wqc["q"], wqc["s"], bqc,
        jnp.asarray(ck8).reshape(b, s, d), cks_t,
        jnp.asarray(cv8).reshape(b, s, d), cvs_t,
        s_real=s_real, interpret=True,
    )
    xo_g, cross_g = np.asarray(xo_g), np.asarray(cross_g)

    # reference: verified attnout kernel + f32 attention on dequantized KV
    xo_ref, qc_ref = attnout_ln_q_fused(
        jnp.asarray(x.reshape(b * k_pad, d)),
        jnp.asarray(attn.reshape(b * k_pad, d)),
        wo["q"], wo["s"], bo, ln_s, ln_b, wqc["q"], wqc["s"], bqc,
        interpret=True,
    )
    xo_ref = np.asarray(xo_ref).reshape(b, k_pad, d)
    qc_ref = np.asarray(qc_ref).reshape(b, k_pad, h, dh)
    ck_dq = np.asarray(ck8).astype(np.float32) * np.asarray(cks)[..., None]
    cv_dq = np.asarray(cv8).astype(np.float32) * np.asarray(cvs)[..., None]
    scores = np.einsum("bqhd,bkhd->bhqk", qc_ref * dh ** -0.5, ck_dq)
    scores[..., s_real:] = -1e30
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    cross_ref = np.einsum("bhqk,bkhd->bqhd", probs, cv_dq).reshape(b, k_pad, d)

    assert np.abs(xo_g - xo_ref).max() / np.abs(xo_ref).max() < 5e-2
    rel = np.abs(cross_g - cross_ref).max() / (np.abs(cross_ref).max() + 1e-9)
    assert rel < 5e-2, rel


def test_fused_cross_decode_path_matches_unfused():
    """greedy_decode with cross_kv_int8 through the combined kernel
    (dh=64 config) emits the same tokens as the unfused int8 XLA path."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.decode import (
        DecodingOptions,
        TokenizerInfo,
        greedy_decode,
        pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.mel import log_mel_spectrogram
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    cfg = WhisperConfig(
        name="micro64", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=128, encoder_layers=1, encoder_heads=2,
        decoder_layers=2, decoder_heads=2, ffn_dim=256,
    )
    qparams = quantize_params(init_params(cfg, seed=0))
    fparams = fuse_qkv(qparams)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 48000)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(audio, n_mels=80)
    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    opts = DecodingOptions(beam_size=1, sample_len=8, kv_int8=True,
                           cross_kv_int8=True)
    prompt, pad = pad_prompts(
        [tok.sot_sequence("zh", predict_timestamps=True)] * 2, tok.eot)
    key = jax.random.PRNGKey(0)

    enc_q = encode(qparams, cfg, mel)
    enc_f = encode(fparams, cfg, mel)
    from ttasr.models.whisper.decode import beam_decode

    for decode_fn, beam in [(greedy_decode, 1), (beam_decode, 3)]:
        o = dataclasses_replace(opts, beam_size=beam)
        out_ref = decode_fn(qparams, cfg, enc_q, prompt, pad, key,
                            opts=o, ti=ti)
        out_fused = decode_fn(fparams, cfg, enc_f, prompt, pad, key,
                              opts=o, ti=ti)
        ref_tok = np.asarray(out_ref["tokens"])
        fus_tok = np.asarray(out_fused["tokens"])
        lengths = np.asarray(out_ref["lengths"])
        for i in range(2):
            n = int(lengths[i])
            assert list(ref_tok[i, :n]) == list(fus_tok[i, :n]), (beam, i)


def test_self_attn_step_kernel_matches_unfused():
    """self_attn_step_int8 (interpret) == quantize_kv + cache update +
    _quant_self_attention over the 5-D layout."""
    import jax.numpy as jnp

    from ttasr.models.whisper.model import _quant_self_attention, quantize_kv
    from ttasr.ops.self_attention_pallas import self_attn_step_int8

    rng = np.random.default_rng(5)
    b, k_rows, h, dh, s_len = 2, 3, 2, 64, 16
    d = h * dh
    bk = b * k_rows
    hp = 8
    slot = 10
    pad = np.array([[0, 2, 0], [1, 0, 3]], np.int32)

    qkv = (rng.standard_normal((b, k_rows, 3 * d)) * 0.5).astype(np.float32)
    cache_kv = (rng.standard_normal((2, bk, s_len, h, dh)) * 0.5
                ).astype(np.float32)
    k8c, ksc = quantize_kv(jnp.asarray(cache_kv[0]))
    v8c, vsc = quantize_kv(jnp.asarray(cache_kv[1]))
    # zero out slots >= slot (not yet written) for clarity
    zero = (np.arange(s_len) >= slot)[None, :, None, None]
    k8c = jnp.where(zero, 0, k8c)
    v8c = jnp.where(zero, 0, v8c)
    ksc = jnp.where(zero[..., 0], 0, ksc)
    vsc = jnp.where(zero[..., 0], 0, vsc)

    # ---- reference: quantize new rows, update cache, attend --------------
    qkv_flat = qkv.reshape(bk, 1, 3 * d)
    q = jnp.asarray(qkv_flat[:, :, :d]).reshape(bk, 1, h, dh)
    k_new = jnp.asarray(qkv_flat[:, :, d:2 * d]).reshape(bk, 1, h, dh)
    v_new = jnp.asarray(qkv_flat[:, :, 2 * d:]).reshape(bk, 1, h, dh)
    k8n, ksn = quantize_kv(k_new)
    v8n, vsn = quantize_kv(v_new)
    import jax

    k8u = jax.lax.dynamic_update_slice_in_dim(k8c, k8n, slot, axis=1)
    v8u = jax.lax.dynamic_update_slice_in_dim(v8c, v8n, slot, axis=1)
    ksu = jax.lax.dynamic_update_slice_in_dim(ksc, ksn, slot, axis=1)
    vsu = jax.lax.dynamic_update_slice_in_dim(vsc, vsn, slot, axis=1)
    kid = np.arange(s_len)[None, :]
    mask = jnp.asarray(
        (kid <= slot) & (kid >= pad.reshape(bk)[:, None])
    )[:, None, None]                                       # (BK,1,1,S)
    want = np.asarray(_quant_self_attention(
        q.astype(jnp.bfloat16), k8u, ksu, v8u, vsu, mask
    )).reshape(b, k_rows, d)

    # ---- kernel ----------------------------------------------------------
    def to_kernel_scales(sc):
        t = jnp.swapaxes(sc, 1, 2)                        # (BK, H, S)
        t = jnp.pad(t, ((0, 0), (0, hp - h), (0, 0)))
        return t.reshape(b, k_rows, hp, s_len)

    got = self_attn_step_int8(
        jnp.asarray(qkv),
        jnp.asarray(k8c).reshape(b, k_rows, s_len, d),
        to_kernel_scales(ksc),
        jnp.asarray(v8c).reshape(b, k_rows, s_len, d),
        to_kernel_scales(vsc),
        jnp.asarray(pad), jnp.asarray(slot, jnp.int32),
        n_heads=h, interpret=True,
    )
    attn, k8_out, ks_out, v8_out, vs_out = [np.asarray(x) for x in got]

    np.testing.assert_array_equal(
        k8_out.reshape(bk, 1, h, dh), np.asarray(k8n))
    np.testing.assert_allclose(
        ks_out.reshape(bk, 1, h), np.asarray(ksn), rtol=1e-6)
    np.testing.assert_array_equal(
        v8_out.reshape(bk, 1, h, dh), np.asarray(v8n))
    rel = np.abs(attn - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel


def test_self_attn_indirect_kernel_matches_gathered():
    """self_attn_step_indirect_int8 over an UN-reordered cache + ancestry
    map == self_attn_step_int8 over the position-wise gathered cache."""
    import jax.numpy as jnp

    from ttasr.models.whisper.model import quantize_kv
    from ttasr.ops.self_attention_pallas import (
        self_attn_step_indirect_int8,
        self_attn_step_int8,
    )

    rng = np.random.default_rng(11)
    b, k_rows, h, dh, s_len = 2, 3, 2, 64, 16
    d = h * dh
    bk = b * k_rows
    hp = 8
    slot = 10
    pad = np.array([[0, 2, 0], [1, 0, 3]], np.int32)

    qkv = (rng.standard_normal((b, k_rows, 3 * d)) * 0.5).astype(np.float32)
    cache_kv = (rng.standard_normal((2, bk, s_len, h, dh)) * 0.5
                ).astype(np.float32)
    k8c, ksc = quantize_kv(jnp.asarray(cache_kv[0]))
    v8c, vsc = quantize_kv(jnp.asarray(cache_kv[1]))
    zero = (np.arange(s_len) >= slot)[None, :, None, None]
    k8c = np.asarray(jnp.where(zero, 0, k8c))
    v8c = np.asarray(jnp.where(zero, 0, v8c))
    ksc = np.asarray(jnp.where(zero[..., 0], 0, ksc))
    vsc = np.asarray(jnp.where(zero[..., 0], 0, vsc))

    # ancestry: arbitrary (not necessarily a permutation — beams may
    # share an ancestor row), group-relative source rows per position
    anc = rng.integers(0, k_rows, (b, k_rows, s_len)).astype(np.int32)

    # reference: physically gather the cache position-wise, run the
    # direct kernel on it
    def gather(arr):  # (BK, S, ...) -> per (audio, beam, t) from anc row
        out = np.empty_like(arr)
        for bi in range(b):
            for j in range(k_rows):
                for t in range(s_len):
                    out[bi * k_rows + j, t] = arr[
                        bi * k_rows + anc[bi, j, t], t]
        return out

    def to_kernel_scales(sc):
        t = jnp.swapaxes(jnp.asarray(sc), 1, 2)          # (BK, H, S)
        t = jnp.pad(t, ((0, 0), (0, hp - h), (0, 0)))
        return t.reshape(b, k_rows, hp, s_len)

    want = self_attn_step_int8(
        jnp.asarray(qkv),
        jnp.asarray(gather(k8c)).reshape(b, k_rows, s_len, d),
        to_kernel_scales(gather(ksc)),
        jnp.asarray(gather(v8c)).reshape(b, k_rows, s_len, d),
        to_kernel_scales(gather(vsc)),
        jnp.asarray(pad), jnp.asarray(slot, jnp.int32),
        n_heads=h, interpret=True,
    )
    got = self_attn_step_indirect_int8(
        jnp.asarray(qkv),
        jnp.asarray(k8c).reshape(b, k_rows, s_len, d),
        to_kernel_scales(ksc),
        jnp.asarray(v8c).reshape(b, k_rows, s_len, d),
        to_kernel_scales(vsc),
        jnp.asarray(anc),
        jnp.asarray(pad), jnp.asarray(slot, jnp.int32),
        n_heads=h, interpret=True,
    )
    # attention outputs agree up to fp summation order (the indirect
    # softmax denominator reduces per chunk); new-row quantization is
    # identical code in both kernels
    attn_w, attn_g = np.asarray(want[0]), np.asarray(got[0])
    rel = np.abs(attn_g - attn_w).max() / (np.abs(attn_w).max() + 1e-9)
    assert rel < 1e-4, rel
    for i in (1, 2, 3, 4):
        np.testing.assert_array_equal(np.asarray(want[i]), np.asarray(got[i]))


def test_beam_indirect_matches_gather_path():
    """beam_decode with ancestry indirection (beam_indirect=True) selects
    the same tokens as the physical cache-gather path.

    sample_len=40 crosses the 32-token growth bucket so the ancestry
    map's pad-and-carry across a cache regrow is exercised too."""
    import jax

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.decode import (
        DecodingOptions,
        TokenizerInfo,
        _use_flat_kv,
        beam_decode,
        pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.mel import log_mel_spectrogram
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    # head_dim MUST be 64: _use_flat_kv gates the fused-kernel (and
    # therefore indirect) path on d_model // decoder_heads == 64
    cfg = WhisperConfig(
        name="micro", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=128, encoder_layers=2, encoder_heads=2,
        decoder_layers=2, decoder_heads=2, ffn_dim=256,
    )
    fparams = fuse_qkv(quantize_params(init_params(cfg, seed=0)))

    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 48000)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(audio, n_mels=80)
    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    prompt, pad = pad_prompts(
        [tok.sot_sequence("zh", predict_timestamps=True)] * 2, tok.eot)
    key = jax.random.PRNGKey(0)
    enc = encode(fparams, cfg, mel)

    outs = {}
    for indirect in (True, False):
        opts = DecodingOptions(beam_size=3, sample_len=40, kv_int8=True,
                               beam_indirect=indirect)
        # guard against vacuity: the flat fused path must be active, or
        # beam_indirect is silently ignored and this test compares a run
        # against itself
        assert _use_flat_kv(fparams, cfg, opts)
        outs[indirect] = beam_decode(fparams, cfg, enc, prompt, pad, key,
                                     opts=opts, ti=ti)
    tok_i = np.asarray(outs[True]["tokens"])
    tok_g = np.asarray(outs[False]["tokens"])
    lengths = np.asarray(outs[False]["lengths"])
    for bi in range(2):
        n = int(lengths[bi])
        assert list(tok_i[bi, :n]) == list(tok_g[bi, :n]), bi


def test_encoder_attention_merged_matches_reference():
    """Merged-layout encoder pair-attention kernel (interpret) matches
    the XLA attention with the pad columns masked."""
    import jax.numpy as jnp

    from ttasr.models.whisper.model import _attention
    from ttasr.ops.encoder_attention_pallas import encoder_attention_merged

    rng = np.random.default_rng(9)
    b, t_pad, t_real, h, dh = 2, 512, 500, 4, 64
    d = h * dh
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((b, t_pad, d)) * 0.5, jnp.float32)
    q, k, v = mk(), mk(), mk()

    got = np.asarray(encoder_attention_merged(
        (q * dh ** -0.5).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), t_real, interpret=True))

    mask = (np.arange(t_pad) < t_real)[None, None, None, :]
    want = np.asarray(_attention(
        q.reshape(b, t_pad, h, dh).astype(jnp.bfloat16),
        k.reshape(b, t_pad, h, dh).astype(jnp.bfloat16),
        v.reshape(b, t_pad, h, dh).astype(jnp.bfloat16),
        jnp.asarray(mask))).reshape(b, t_pad, d)

    # only the real rows must agree (pad-row outputs are junk by design)
    g, w = got[:, :t_real].astype(np.float32), want[:, :t_real].astype(np.float32)
    rel = np.abs(g - w).max() / (np.abs(w).max() + 1e-9)
    assert rel < 3e-2, rel


def test_cross_attn_alignment_works_with_fused_params():
    """decode_with_cross_attn (word-timestamp path) must consume the
    fused int8 ``wqkv`` layout — fuse_qkv removes wq/wk/wv, which used
    to KeyError and silently empty every int8 engine's word list."""
    import jax.numpy as jnp

    from ttasr.models.whisper.align import decode_with_cross_attn
    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.model import init_params
    from ttasr.ops.quant import fuse_qkv, quantize_params

    cfg = WhisperConfig(
        name="micro", vocab_size=256, num_mel_bins=80,
        d_model=64, encoder_layers=1, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
        max_source_positions=16,
    )
    qparams = quantize_params(init_params(cfg, seed=0))
    fparams = fuse_qkv(qparams)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 256, (1, 6)), jnp.int32)
    enc_out = jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)

    x_ref, qk_ref = decode_with_cross_attn(qparams, cfg, tokens, enc_out)
    x_fus, qk_fus = decode_with_cross_attn(fparams, cfg, tokens, enc_out)
    np.testing.assert_allclose(np.asarray(x_fus), np.asarray(x_ref),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(qk_fus), np.asarray(qk_ref),
                               rtol=2e-2, atol=2e-3)


def test_beam_gather_kernel_matches_xla_gather():
    """Pallas permuted-copy of the flat int8 self-KV cache must be
    bit-identical to the XLA batch-axis gather it replaces
    (decode.py::_gather_cache)."""
    import jax.numpy as jnp

    from ttasr.ops.beam_gather_pallas import gather_cache_rows

    rng = np.random.default_rng(0)
    l, bk, t, d, hp = 3, 10, 48, 256, 8
    k = jnp.asarray(rng.integers(-127, 128, (l, bk, t, d)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (l, bk, t, d)), jnp.int8)
    ks = jnp.asarray(rng.standard_normal((l, bk, hp, t)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((l, bk, hp, t)), jnp.float32)
    # beam-style permutation: repeats + identity rows mixed
    idx = jnp.asarray([0, 0, 3, 2, 4, 9, 5, 5, 7, 6], jnp.int32)

    gk, gv, gks, gvs = gather_cache_rows(k, v, ks, vs, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(k[:, idx]))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(v[:, idx]))
    np.testing.assert_array_equal(np.asarray(gks), np.asarray(ks[:, idx]))
    np.testing.assert_array_equal(np.asarray(gvs), np.asarray(vs[:, idx]))


def test_int4_pack_roundtrip():
    """Nibble packing (ttasr/ops/int4.py) is lossless over [-8, 7]."""
    import jax.numpy as jnp

    from ttasr.ops.int4 import pack_int4, unpack_int4

    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(3, 32, 20), dtype=np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 16, 20)
    out = np.asarray(unpack_int4(packed))
    np.testing.assert_array_equal(out, q)


def test_int4_quantize_range():
    """quantize_kv4 stays in [-7, 7] and dequantizes within one scale
    step of the input."""
    import jax.numpy as jnp

    from ttasr.ops.int4 import quantize_kv4

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 16, 4, 64)) * 3).astype(np.float32)
    q, scale = quantize_kv4(jnp.asarray(x))
    q, scale = np.asarray(q), np.asarray(scale)
    assert q.min() >= -7 and q.max() <= 7
    err = np.abs(q * scale[..., None] - x)
    assert (err <= scale[..., None] * 0.5 + 1e-6).all()


def test_attnout_cross_int4_packed_matches_unpacked():
    """attnout_ln_q_cross_int8 over a nibble-packed int4 cache equals the
    same kernel over the identical int4 values stored as int8 — the
    unpack is the only difference, so agreement is exact."""
    import jax.numpy as jnp

    from ttasr.ops.decoder_blocks_pallas import attnout_ln_q_cross_int8
    from ttasr.ops.int4 import pack_int4, quantize_kv4

    rng = np.random.default_rng(5)
    b, k_pad, h, dh, s, s_real = 2, 8, 4, 64, 48, 45
    d = h * dh
    x = (rng.standard_normal((b, k_pad, d)) * 0.3).astype(np.float32)
    attn = (rng.standard_normal((b, k_pad, d)) * 0.3).astype(np.float32)
    ln_s = (rng.standard_normal(d) * 0.1 + 1).astype(np.float32)
    ln_b = (rng.standard_normal(d) * 0.1).astype(np.float32)
    wo = quantize_tensor((rng.standard_normal((d, d)) * 0.05).astype(np.float32))
    bo = (rng.standard_normal(d) * 0.02).astype(np.float32)
    wqc = quantize_tensor((rng.standard_normal((d, d)) * 0.05).astype(np.float32))
    bqc = (rng.standard_normal(d) * 0.02).astype(np.float32)
    ck = (rng.standard_normal((b, s, h, dh)) * 0.5).astype(np.float32)
    cv = (rng.standard_normal((b, s, h, dh)) * 0.5).astype(np.float32)
    ck4, cks = quantize_kv4(jnp.asarray(ck))
    cv4, cvs = quantize_kv4(jnp.asarray(cv))
    cks_t = jnp.swapaxes(cks, 1, 2)
    cvs_t = jnp.swapaxes(cvs, 1, 2)
    ck_flat = jnp.asarray(ck4).reshape(b, s, d)
    cv_flat = jnp.asarray(cv4).reshape(b, s, d)

    args = (jnp.asarray(x), jnp.asarray(attn),
            wo["q"], wo["s"], bo, ln_s, ln_b, wqc["q"], wqc["s"], bqc)
    xo_i8, cross_i8 = attnout_ln_q_cross_int8(
        *args, ck_flat, cks_t, cv_flat, cvs_t,
        s_real=s_real, interpret=True)
    xo_i4, cross_i4 = attnout_ln_q_cross_int8(
        *args, pack_int4(ck_flat), cks_t, pack_int4(cv_flat), cvs_t,
        s_real=s_real, interpret=True)
    np.testing.assert_array_equal(np.asarray(xo_i4), np.asarray(xo_i8))
    np.testing.assert_allclose(np.asarray(cross_i4), np.asarray(cross_i8),
                               rtol=0, atol=0)


def test_cross_attention_int4_packed_matches_unpacked():
    """Standalone cross_attention_int8 kernel: packed int4 == the same
    int4 values fed as int8."""
    import jax.numpy as jnp

    from ttasr.ops.cross_attention_pallas import cross_attention_int8
    from ttasr.ops.int4 import pack_int4, quantize_kv4

    rng = np.random.default_rng(6)
    b, k, h, dh, s, s_real = 2, 5, 4, 64, 32, 29
    q = (rng.standard_normal((b, k, h, dh)) * 0.4).astype(np.float32)
    ck = (rng.standard_normal((b, s, h, dh)) * 0.5).astype(np.float32)
    cv = (rng.standard_normal((b, s, h, dh)) * 0.5).astype(np.float32)
    ck4, cks = quantize_kv4(jnp.asarray(ck))
    cv4, cvs = quantize_kv4(jnp.asarray(cv))
    cks_t = jnp.swapaxes(cks, 1, 2)
    cvs_t = jnp.swapaxes(cvs, 1, 2)
    ck_flat = jnp.asarray(ck4).reshape(b, s, h * dh)
    cv_flat = jnp.asarray(cv4).reshape(b, s, h * dh)

    out_i8 = cross_attention_int8(
        jnp.asarray(q), ck_flat, cks_t, cv_flat, cvs_t, s_real,
        interpret=True)
    out_i4 = cross_attention_int8(
        jnp.asarray(q), pack_int4(ck_flat), cks_t, pack_int4(cv_flat),
        cvs_t, s_real, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_i4), np.asarray(out_i8))


def test_decode_cross_int4_end_to_end():
    """greedy + beam decode run with cross_kv_int4 on the fused path and
    emit valid tokens; the int4 gate accepts the fused micro config."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.decode import (
        DecodingOptions,
        TokenizerInfo,
        _use_cross_int4,
        beam_decode,
        greedy_decode,
        pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.mel import log_mel_spectrogram
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    cfg = WhisperConfig(
        name="micro64", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=128, encoder_layers=1, encoder_heads=2,
        decoder_layers=2, decoder_heads=2, ffn_dim=256,
    )
    fparams = fuse_qkv(quantize_params(init_params(cfg, seed=0)))

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 48000)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(audio, n_mels=80)
    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    opts = DecodingOptions(beam_size=1, sample_len=8, kv_int8=True,
                           cross_kv_int8=True, cross_kv_int4=True)
    assert _use_cross_int4(fparams, cfg, opts)
    prompt, pad = pad_prompts(
        [tok.sot_sequence("zh", predict_timestamps=True)] * 2, tok.eot)
    key = jax.random.PRNGKey(0)
    enc_f = encode(fparams, cfg, mel)

    for decode_fn, beam in [(greedy_decode, 1), (beam_decode, 3)]:
        o = dataclasses_replace(opts, beam_size=beam)
        out = decode_fn(fparams, cfg, enc_f, prompt, pad, key,
                        opts=o, ti=ti)
        toks = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        assert (toks >= 0).all() and (toks < cfg.vocab_size).all()
        assert (lengths >= 1).all()


def test_attnout_cross_grouped_matches_ungrouped():
    """group=2/4 (audios per grid step) is bit-identical to group=1,
    and a non-dividing group falls back to 1."""
    import jax.numpy as jnp

    from ttasr.ops.decoder_blocks_pallas import attnout_ln_q_cross_int8
    from ttasr.ops.int4 import pack_int4, quantize_kv4

    rng = np.random.default_rng(7)
    b, k_pad, h, dh, s, s_real = 4, 8, 4, 64, 48, 45
    d = h * dh
    x = (rng.standard_normal((b, k_pad, d)) * 0.3).astype(np.float32)
    attn = (rng.standard_normal((b, k_pad, d)) * 0.3).astype(np.float32)
    ln_s = (rng.standard_normal(d) * 0.1 + 1).astype(np.float32)
    ln_b = (rng.standard_normal(d) * 0.1).astype(np.float32)
    wo = quantize_tensor((rng.standard_normal((d, d)) * 0.05).astype(np.float32))
    bo = (rng.standard_normal(d) * 0.02).astype(np.float32)
    wqc = quantize_tensor((rng.standard_normal((d, d)) * 0.05).astype(np.float32))
    bqc = (rng.standard_normal(d) * 0.02).astype(np.float32)
    ck = (rng.standard_normal((b, s, h, dh)) * 0.5).astype(np.float32)
    cv = (rng.standard_normal((b, s, h, dh)) * 0.5).astype(np.float32)
    ck4, cks = quantize_kv4(jnp.asarray(ck))
    cv4, cvs = quantize_kv4(jnp.asarray(cv))
    cks_t = jnp.swapaxes(cks, 1, 2)
    cvs_t = jnp.swapaxes(cvs, 1, 2)
    ckp = pack_int4(jnp.asarray(ck4).reshape(b, s, d))
    cvp = pack_int4(jnp.asarray(cv4).reshape(b, s, d))

    args = (jnp.asarray(x), jnp.asarray(attn),
            wo["q"], wo["s"], bo, ln_s, ln_b, wqc["q"], wqc["s"], bqc,
            ckp, cks_t, cvp, cvs_t)
    xo1, cr1 = attnout_ln_q_cross_int8(*args, s_real=s_real, group=1,
                                       interpret=True)
    for grp in (2, 3, 4):  # 3 does not divide b=4 -> falls back to 1
        xo_g, cr_g = attnout_ln_q_cross_int8(*args, s_real=s_real,
                                             group=grp, interpret=True)
        np.testing.assert_array_equal(np.asarray(xo_g), np.asarray(xo1))
        np.testing.assert_array_equal(np.asarray(cr_g), np.asarray(cr1))


# ---------------------------------------------------------------------------
# int4 lane-packed self-KV (VERDICT r4 #2)
# ---------------------------------------------------------------------------

def _int4_self_fixture(seed=7, b=2, k_rows=3, h=2, dh=64, s_len=16, slot=10):
    """Shared int4 self-KV kernel fixture: an int4-quantized cache
    (lane-packed), kernel-layout scales, fused qkv rows, pads."""
    import jax.numpy as jnp

    from ttasr.ops.int4 import pack_int4_lanes, quantize_kv4

    rng = np.random.default_rng(seed)
    d = h * dh
    bk = b * k_rows
    hp = 8
    pad = np.array([[0, 2, 0], [1, 0, 3]], np.int32)[:b, :k_rows]

    qkv = (rng.standard_normal((b, k_rows, 3 * d)) * 0.5).astype(np.float32)
    cache_kv = (rng.standard_normal((2, bk, s_len, h, dh)) * 0.5
                ).astype(np.float32)
    k4c, ksc = quantize_kv4(jnp.asarray(cache_kv[0]))
    v4c, vsc = quantize_kv4(jnp.asarray(cache_kv[1]))
    zero = (np.arange(s_len) >= slot)[None, :, None, None]
    k4c = jnp.where(zero, 0, k4c)
    v4c = jnp.where(zero, 0, v4c)
    ksc = jnp.where(zero[..., 0], 0, ksc)
    vsc = jnp.where(zero[..., 0], 0, vsc)
    kp = pack_int4_lanes(jnp.asarray(k4c).reshape(bk, s_len, d))
    vp = pack_int4_lanes(jnp.asarray(v4c).reshape(bk, s_len, d))

    def to_kernel_scales(sc):
        t = jnp.swapaxes(jnp.asarray(sc), 1, 2)          # (BK, H, S)
        t = jnp.pad(t, ((0, 0), (0, hp - h), (0, 0)))
        return t.reshape(b, k_rows, hp, s_len)

    return dict(rng=rng, b=b, k_rows=k_rows, h=h, dh=dh, d=d, bk=bk, hp=hp,
                s_len=s_len, slot=slot, pad=pad, qkv=qkv,
                k4c=k4c, v4c=v4c, ksc=ksc, vsc=vsc,
                kp=kp.reshape(b, k_rows, s_len, d // 2),
                vp=vp.reshape(b, k_rows, s_len, d // 2),
                ks_k=to_kernel_scales(ksc), vs_k=to_kernel_scales(vsc))


def test_self_attn_step_int4_matches_unpacked_reference():
    """self_attn_step_int8(int4=True) over the lane-packed cache ==
    the unfused 5-D reference attending over the UNPACKED int4 values
    with int4 scales (same dequantized tensor), with the new entry
    quantized at the +/-7 range.  New-row outputs must pack EXACTLY."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.model import _quant_self_attention
    from ttasr.ops.int4 import pack_int4_lanes, quantize_kv4
    from ttasr.ops.self_attention_pallas import self_attn_step_int8

    f = _int4_self_fixture()
    b, k_rows, h, dh, d, bk = (f[k] for k in
                               ("b", "k_rows", "h", "dh", "d", "bk"))
    s_len, slot = f["s_len"], f["slot"]

    # reference: quantize new rows at int4 range, update the UNPACKED
    # cache, attend via the generic quantized-attention helper
    qkv_flat = f["qkv"].reshape(bk, 1, 3 * d)
    q = jnp.asarray(qkv_flat[:, :, :d]).reshape(bk, 1, h, dh)
    k_new = jnp.asarray(qkv_flat[:, :, d:2 * d]).reshape(bk, 1, h, dh)
    v_new = jnp.asarray(qkv_flat[:, :, 2 * d:]).reshape(bk, 1, h, dh)
    k4n, ksn = quantize_kv4(k_new)
    v4n, vsn = quantize_kv4(v_new)
    k4u = jax.lax.dynamic_update_slice_in_dim(f["k4c"], k4n, slot, axis=1)
    v4u = jax.lax.dynamic_update_slice_in_dim(f["v4c"], v4n, slot, axis=1)
    ksu = jax.lax.dynamic_update_slice_in_dim(f["ksc"], ksn, slot, axis=1)
    vsu = jax.lax.dynamic_update_slice_in_dim(f["vsc"], vsn, slot, axis=1)
    kid = np.arange(s_len)[None, :]
    mask = jnp.asarray(
        (kid <= slot) & (kid >= f["pad"].reshape(bk)[:, None])
    )[:, None, None]
    want = np.asarray(_quant_self_attention(
        q.astype(jnp.bfloat16), k4u, ksu, v4u, vsu, mask
    )).reshape(b, k_rows, d)

    got = self_attn_step_int8(
        jnp.asarray(f["qkv"]), f["kp"], f["ks_k"], f["vp"], f["vs_k"],
        jnp.asarray(f["pad"]), jnp.asarray(slot, jnp.int32),
        n_heads=h, int4=True, interpret=True,
    )
    attn, k4_out, ks_out, v4_out, vs_out = [np.asarray(x) for x in got]

    assert k4_out.dtype == np.uint8 and k4_out.shape == (b, k_rows, d // 2)
    np.testing.assert_array_equal(
        k4_out.reshape(bk, d // 2),
        np.asarray(pack_int4_lanes(jnp.asarray(k4n).reshape(bk, d))))
    np.testing.assert_array_equal(
        v4_out.reshape(bk, d // 2),
        np.asarray(pack_int4_lanes(jnp.asarray(v4n).reshape(bk, d))))
    np.testing.assert_allclose(
        ks_out.reshape(bk, 1, h), np.asarray(ksn), rtol=1e-6)
    np.testing.assert_allclose(
        vs_out.reshape(bk, 1, h), np.asarray(vsn), rtol=1e-6)
    rel = np.abs(attn - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 2e-2, rel


def test_self_attn_step_int4_pad_junk_invariant():
    """Junk nibbles in masked cache positions (pad slots and slots >=
    slot) must never reach the int4 kernel's attention output — direct
    and ancestry-indirect variants (mirrors
    test_cross_attn_quantized_masks_pad_slots for the self cache)."""
    import jax.numpy as jnp

    from ttasr.ops.self_attention_pallas import (
        self_attn_step_indirect_int8,
        self_attn_step_int8,
    )

    f = _int4_self_fixture()
    b, k_rows, h = f["b"], f["k_rows"], f["h"]
    s_len, slot = f["s_len"], f["slot"]
    rng = np.random.default_rng(99)
    # audio-uniform pads: all beam rows of one audio share the prompt
    # (and so its pad) — the production invariant the ancestry map
    # relies on (a random anc may read ANOTHER row's cache at t, which
    # is only junk-free when pads match across the audio's rows)
    f["pad"] = np.repeat(np.array([[2], [1]], np.int32)[:b], k_rows, axis=1)

    # junk every masked position: slots >= slot (incl. the not-yet-
    # written current slot) and per-row pad prefixes
    def junk(packed):
        arr = np.asarray(packed).copy()
        j = rng.integers(0, 256, arr.shape, dtype=np.uint16).astype(np.uint8)
        m = np.zeros(arr.shape, bool)
        m[:, :, slot:, :] = True
        for bi in range(b):
            for kj in range(k_rows):
                m[bi, kj, : f["pad"][bi, kj], :] = True
        arr[m] = j[m]
        return jnp.asarray(arr)

    anc = jnp.asarray(
        rng.integers(0, k_rows, (b, k_rows, s_len)).astype(np.int32))
    base_args = (jnp.asarray(f["qkv"]),)
    tail = (jnp.asarray(f["pad"]), jnp.asarray(slot, jnp.int32))

    clean = self_attn_step_int8(
        *base_args, f["kp"], f["ks_k"], f["vp"], f["vs_k"], *tail,
        n_heads=h, int4=True, interpret=True)
    junked = self_attn_step_int8(
        *base_args, junk(f["kp"]), f["ks_k"], junk(f["vp"]), f["vs_k"],
        *tail, n_heads=h, int4=True, interpret=True)
    for a, bb in zip(clean, junked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    clean_i = self_attn_step_indirect_int8(
        *base_args, f["kp"], f["ks_k"], f["vp"], f["vs_k"], anc, *tail,
        n_heads=h, int4=True, interpret=True)
    junked_i = self_attn_step_indirect_int8(
        *base_args, junk(f["kp"]), f["ks_k"], junk(f["vp"]), f["vs_k"],
        anc, *tail, n_heads=h, int4=True, interpret=True)
    for a, bb in zip(clean_i, junked_i):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_self_attn_indirect_int4_matches_gathered():
    """int4 ancestry-indirect kernel over an un-reordered packed cache
    == int4 direct kernel over the position-wise gathered packed cache
    (mirror of test_self_attn_indirect_kernel_matches_gathered)."""
    import jax.numpy as jnp

    from ttasr.ops.self_attention_pallas import (
        self_attn_step_indirect_int8,
        self_attn_step_int8,
    )

    f = _int4_self_fixture(seed=13)
    b, k_rows, h = f["b"], f["k_rows"], f["h"]
    s_len, slot = f["s_len"], f["slot"]
    rng = np.random.default_rng(17)
    anc = rng.integers(0, k_rows, (b, k_rows, s_len)).astype(np.int32)

    def gather(arr4):  # (B, K, S, cols): row from anc per (audio, beam, t)
        arr = np.asarray(arr4)
        out = np.empty_like(arr)
        for bi in range(b):
            for j in range(k_rows):
                for t in range(s_len):
                    out[bi, j, t] = arr[bi, anc[bi, j, t], t]
        return jnp.asarray(out)

    def gather_scales(sc):  # (BK, S, H) raw scales -> gathered kernel layout
        arr = np.asarray(sc).reshape(b, k_rows, s_len, h)
        out = np.empty_like(arr)
        for bi in range(b):
            for j in range(k_rows):
                for t in range(s_len):
                    out[bi, j, t] = arr[bi, anc[bi, j, t], t]
        t_ = jnp.swapaxes(jnp.asarray(out.reshape(b * k_rows, s_len, h)),
                          1, 2)                          # (BK, H, S)
        t_ = jnp.pad(t_, ((0, 0), (0, f["hp"] - h), (0, 0)))
        return t_.reshape(b, k_rows, f["hp"], s_len)

    tail = (jnp.asarray(f["pad"]), jnp.asarray(slot, jnp.int32))
    want = self_attn_step_int8(
        jnp.asarray(f["qkv"]), gather(f["kp"]), gather_scales(f["ksc"]),
        gather(f["vp"]), gather_scales(f["vsc"]), *tail,
        n_heads=h, int4=True, interpret=True)
    got = self_attn_step_indirect_int8(
        jnp.asarray(f["qkv"]), f["kp"], f["ks_k"], f["vp"], f["vs_k"],
        jnp.asarray(anc), *tail, n_heads=h, int4=True, interpret=True)
    attn_w, attn_g = np.asarray(want[0]), np.asarray(got[0])
    rel = np.abs(attn_g - attn_w).max() / (np.abs(attn_w).max() + 1e-9)
    assert rel < 1e-4, rel
    for i in (1, 2, 3, 4):
        np.testing.assert_array_equal(np.asarray(want[i]), np.asarray(got[i]))


def test_self_kv_int4_decode_bucket_consistency():
    """End-to-end greedy + beam decode with the int4 lane-packed self-KV
    cache: tokens must be IDENTICAL across growth-bucket schedules
    (min_cap 32 vs one flat bucket) — exercising the int4 prefill
    packing, both kernels (direct + ancestry-indirect), and
    _pad_cache_to growth over packed caches."""
    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.decode import (
        DecodingOptions,
        TokenizerInfo,
        beam_decode,
        greedy_decode,
        pad_prompts,
    )
    from ttasr.models.whisper.model import encode, init_params
    from ttasr.ops.mel import log_mel_spectrogram
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    cfg = WhisperConfig(
        name="micro64", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=128, encoder_layers=1, encoder_heads=2,
        decoder_layers=2, decoder_heads=2, ffn_dim=256,
    )
    fparams = fuse_qkv(quantize_params(init_params(cfg, seed=0)))

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 48000)).astype(np.float32) * 0.1
    mel = log_mel_spectrogram(audio, n_mels=80)
    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    prompt, pad = pad_prompts(
        [tok.sot_sequence("zh", predict_timestamps=True)] * 2, tok.eot)
    key = jax.random.PRNGKey(0)
    enc_f = encode(fparams, cfg, mel)

    for decode_fn, beam in [(greedy_decode, 1), (beam_decode, 3)]:
        outs = []
        for min_cap in (32, 64):  # 64 > sample_len 40 -> multi vs fewer
            o = DecodingOptions(beam_size=beam, sample_len=40,
                                kv_int8=True, cross_kv_int8=True,
                                kv_int4=True, growth_min_cap=min_cap)
            out = decode_fn(fparams, cfg, enc_f, prompt, pad, key,
                            opts=o, ti=ti)
            outs.append((np.asarray(out["tokens"]),
                         np.asarray(out["lengths"])))
        (t0, l0), (t1, l1) = outs
        np.testing.assert_array_equal(l0, l1)
        for i in range(2):
            n = int(l0[i])
            assert list(t0[i, :n]) == list(t1[i, :n]), (beam, i)


def test_self_attn_indirect_group_invariance():
    """self_attn_step_indirect_int8 with ``group`` audios per grid step
    must equal the group-1 result exactly — int8 and int4 modes (mirror
    of the cross kernel's group test)."""
    import jax.numpy as jnp

    from ttasr.models.whisper.model import quantize_kv
    from ttasr.ops.int4 import pack_int4_lanes, quantize_kv4
    from ttasr.ops.self_attention_pallas import self_attn_step_indirect_int8

    rng = np.random.default_rng(23)
    b, k_rows, h, dh, s_len = 4, 3, 2, 64, 16
    d = h * dh
    bk = b * k_rows
    hp = 8
    slot = 9
    pad = np.repeat(np.array([[2], [0], [1], [3]], np.int32), k_rows, axis=1)
    qkv = (rng.standard_normal((b, k_rows, 3 * d)) * 0.5).astype(np.float32)
    cache_kv = (rng.standard_normal((2, bk, s_len, h, dh)) * 0.5
                ).astype(np.float32)
    anc = jnp.asarray(
        rng.integers(0, k_rows, (b, k_rows, s_len)).astype(np.int32))

    def to_kernel_scales(sc):
        t = jnp.swapaxes(jnp.asarray(sc), 1, 2)
        t = jnp.pad(t, ((0, 0), (0, hp - h), (0, 0)))
        return t.reshape(b, k_rows, hp, s_len)

    for int4 in (False, True):
        quant = quantize_kv4 if int4 else quantize_kv
        k8c, ksc = quant(jnp.asarray(cache_kv[0]))
        v8c, vsc = quant(jnp.asarray(cache_kv[1]))
        if int4:
            kc = pack_int4_lanes(jnp.asarray(k8c).reshape(bk, s_len, d)
                                 ).reshape(b, k_rows, s_len, d // 2)
            vc = pack_int4_lanes(jnp.asarray(v8c).reshape(bk, s_len, d)
                                 ).reshape(b, k_rows, s_len, d // 2)
        else:
            kc = jnp.asarray(k8c).reshape(b, k_rows, s_len, d)
            vc = jnp.asarray(v8c).reshape(b, k_rows, s_len, d)
        args = (jnp.asarray(qkv), kc, to_kernel_scales(ksc), vc,
                to_kernel_scales(vsc), anc, jnp.asarray(pad),
                jnp.asarray(slot, jnp.int32))
        base = self_attn_step_indirect_int8(
            *args, n_heads=h, int4=int4, group=1, interpret=True)
        for grp in (2, 3, 4):  # 3 does not divide b=4 -> falls back to 1
            got = self_attn_step_indirect_int8(
                *args, n_heads=h, int4=int4, group=grp, interpret=True)
            for x, y in zip(base, got):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
