"""Decode-step microprofile on the real TPU: where does the step time go?

Times isolated jitted stages at the exact shapes of the headline bench
(large-v3, batch 8, beam 5 -> 40 decode rows, int8 fused weights, int8
self-KV), each fetched to host (axon's block_until_ready does not fully
synchronize — CLAUDE.md).  Prints one JSON line per stage.

Usage: python tools/profile_decode.py [--batch 8] [--beam 5] [--len 144]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ttasr-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np  # noqa: E402


def timeit(fn, *args, repeats=20):
    import jax

    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)  # compile + sync
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x), out)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--len", type=int, dest="cache_len", default=144)
    p.add_argument("--repeats", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.decode import DecodingOptions, TokenizerInfo, _step
    from ttasr.models.whisper.model import (
        _quant_self_attention,
        init_cache,
        init_params,
        quantize_kv,
    )
    from ttasr.ops.quant import fuse_qkv, quantize_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    cfg = get_config("large-v3")
    b, k = args.batch, args.beam
    bk = b * k
    h, dh = cfg.decoder_heads, cfg.d_model // cfg.decoder_heads
    d = cfg.d_model
    L = cfg.decoder_layers
    S = cfg.max_source_positions  # 1500
    clen = args.cache_len
    rng = np.random.default_rng(0)
    results = {}

    params = init_params(cfg, seed=0, dtype=jnp.bfloat16)
    params_q = fuse_qkv(quantize_params(params))
    enc_out = jnp.asarray(
        rng.standard_normal((b, S, d)).astype(np.float32), jnp.bfloat16)

    tok = build_byte_fallback_tokenizer()
    ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)

    # ---- full _step at fixed cache length (fused int8 weights) ----------
    # All big operands are jit ARGUMENTS: closure-captured arrays become
    # compile-time constants shipped to the remote compile service (3 GB
    # -> broken pipe).
    token = jnp.zeros((bk, 1), jnp.int32)
    pad = jnp.zeros((bk,), jnp.int32)
    slot = jnp.asarray(clen - 8, jnp.int32)

    @jax.jit
    def step_fn(prms, cache):
        logits, new_cache = _step(prms, cfg, token, slot, pad, cache)
        return logits

    def make_cache(prms, cross_int8):
        cache = init_cache(prms, cfg, enc_out, max_len=clen, beam_expand=k,
                           kv_int8=True, cross_kv_int8=cross_int8)
        kv = rng.standard_normal((L, bk, clen, h, dh)).astype(np.float32)
        q8, sc = quantize_kv(jnp.asarray(kv.reshape(L * bk, clen, h, dh)))
        return cache.__class__(
            k=q8.reshape(L, bk, clen, h, dh),
            v=q8.reshape(L, bk, clen, h, dh),
            cross_k=cache.cross_k, cross_v=cache.cross_v,
            ks=sc.reshape(L, bk, clen, h), vs=sc.reshape(L, bk, clen, h),
            cks=cache.cks, cvs=cache.cvs)

    results["full_step_int8w"] = timeit(
        step_fn, params_q, make_cache(params_q, False), repeats=args.repeats)
    results["full_step_int8w_crossint8"] = timeit(
        step_fn, params_q, make_cache(params_q, True), repeats=args.repeats)
    results["full_step_bf16w"] = timeit(
        step_fn, params, make_cache(params, False), repeats=args.repeats)

    # ---- cross attention only: XLA bf16 vs Pallas int8 ------------------
    qc = jnp.asarray(rng.standard_normal((bk, 1, h, dh)), jnp.bfloat16)
    ck = jnp.asarray(rng.standard_normal((L, b, S, h, dh)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((L, b, S, h, dh)), jnp.bfloat16)

    @jax.jit
    def cross_bf16(qc, ck, cv):
        from ttasr.models.whisper.model import _cross_attention

        def body(carry, scanned):
            ck_l, cv_l = scanned
            out = _cross_attention(carry, ck_l, cv_l)
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(body, qc, (ck, cv))
        return out

    results["cross_attn_bf16_32L"] = timeit(cross_bf16, qc, ck, cv,
                                            repeats=args.repeats)

    from ttasr.ops.cross_attention_pallas import (
        cross_attention_int8,
        transpose_scales,
    )

    s_pad = S + (-S) % 8
    ck8_flat = jnp.asarray(
        rng.integers(-127, 127, (L, b, s_pad, h * dh)), jnp.int8)
    scales = jnp.asarray(
        rng.standard_normal((L * b, s_pad, h)).astype(np.float32) ** 2 + 0.01)
    sc_t = transpose_scales(scales).reshape(L, b, h, s_pad)

    @jax.jit
    def cross_int8(qc, ck8_flat, sc_t):
        def body(carry, scanned):
            ck_l, cks_l, cv_l, cvs_l = scanned
            out = cross_attention_int8(
                carry.reshape(b, k, h, dh).astype(jnp.float32),
                ck_l, cks_l, cv_l, cvs_l, S)
            return out.reshape(bk, 1, h, dh).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, qc, (ck8_flat, sc_t, ck8_flat, sc_t))
        return out

    results["cross_attn_int8_pallas_32L"] = timeit(
        cross_int8, qc, ck8_flat, sc_t, repeats=args.repeats)

    # ---- self attention int8 over cache ---------------------------------
    q = jnp.asarray(rng.standard_normal((bk, 1, h, dh)), jnp.bfloat16)
    k8 = jnp.asarray(rng.integers(-127, 127, (L, bk, clen, h, dh)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.standard_normal((L, bk, clen, h))) + 0.01,
                     jnp.float32)
    mask = jnp.ones((bk, 1, 1, clen), bool)

    @jax.jit
    def self_int8(q, k8, ks):
        def body(carry, scanned):
            k_l, ks_l, v_l, vs_l = scanned
            out = _quant_self_attention(carry, k_l, ks_l, v_l, vs_l, mask)
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(body, q, (k8, ks, k8, ks))
        return out

    results["self_attn_int8_32L"] = timeit(self_int8, q, k8, ks,
                                           repeats=args.repeats)

    # ---- fused weight kernels over 32 layers -----------------------------
    from ttasr.ops.decoder_blocks_pallas import (
        attnout_ln_q_fused,
        qkv_int8_fused,
    )
    from ttasr.ops.decoder_mlp_pallas import mlp_with_crossout_int8

    blocks = params_q["decoder"]["blocks"]
    x2 = jnp.asarray(rng.standard_normal((bk, d)), jnp.float32)

    @jax.jit
    def weights_only(x2, blocks):
        def body(carry, blk):
            qkv = qkv_int8_fused(carry, blk["ln1_s"], blk["ln1_b"],
                                 blk["wqkv"]["q"], blk["wqkv"]["s"],
                                 blk["bqkv"])
            attn = qkv[:, :d]
            xo, qc_ = attnout_ln_q_fused(
                carry, attn, blk["wo"]["q"], blk["wo"]["s"], blk["bo"],
                blk["lnc_s"], blk["lnc_b"],
                blk["wq_c"]["q"], blk["wq_c"]["s"], blk["bq_c"])
            x_new = mlp_with_crossout_int8(
                xo, qc_, blk["wo_c"]["q"], blk["wo_c"]["s"], blk["bo_c"],
                blk["ln2_s"], blk["ln2_b"],
                blk["w1"]["q"], blk["w1"]["s"], blk["b1"],
                blk["w2"]["q"], blk["w2"]["s"], blk["b2"])
            return x_new, None

        out, _ = jax.lax.scan(body, x2, blocks)
        return out

    results["weight_kernels_32L"] = timeit(weights_only, x2, blocks,
                                           repeats=args.repeats)

    # ---- unembed + beam bookkeeping --------------------------------------
    hdn = jnp.asarray(rng.standard_normal((bk, d)), jnp.bfloat16)

    @jax.jit
    def unembed_topk(hdn, dec):
        from ttasr.models.whisper.model import _unembed

        logits = _unembed(hdn, dec).astype(jnp.float32)
        cand = logits.reshape(b, k * cfg.vocab_size)
        return jax.lax.top_k(cand, 2 * k)

    results["unembed_topk"] = timeit(unembed_topk, hdn, params_q["decoder"],
                                     repeats=args.repeats)

    idx = jnp.asarray(rng.integers(0, bk, (bk,)), jnp.int32)

    @jax.jit
    def beam_gather(k8, ks, idx):
        # checksum the gathered caches so only scalars cross the tunnel
        # (fetching the 236 MB arrays through the axon relay dominates
        # the measurement otherwise)
        idx2 = jnp.roll(idx, 1)  # distinct gathers (defeat CSE): k and v
        g1, g2 = k8[:, idx], k8[:, idx2]
        s1, s2 = ks[:, idx], ks[:, idx2]
        return (g1.astype(jnp.int32).sum() + g2.astype(jnp.int32).sum(),
                s1.sum() + s2.sum())

    results["beam_gather_kv"] = timeit(beam_gather, k8, ks, idx,
                                       repeats=args.repeats)

    for name, t in results.items():
        print(json.dumps({"stage": name, "ms": round(t * 1e3, 3),
                          "shapes": f"b{b} k{k} len{clen}"}))


if __name__ == "__main__":
    main()
