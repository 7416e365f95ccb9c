"""Decode-step microprofile on the real TPU: where does the step time go?

Each stage runs ITERS times inside one jitted ``lax.fori_loop`` with a
carried data dependence, so the axon relay's per-dispatch RPC latency
(~30-60 ms round trip — it dwarfs sub-ms kernels) amortizes away:
stage_ms = (elapsed - rpc_baseline) / ITERS.  Big operands are jit
ARGUMENTS (closure-captured arrays ship to the remote compile service
as constants — 3 GB broke its transport).

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

ITERS = 50


def timeit(fn, *args, repeats=5):
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
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ttasr.models.whisper.config import get_config
    from ttasr.models.whisper.decode import _step
    from ttasr.models.whisper.model import (
        _quant_self_attention,
        init_cache,
        init_params,
        quantize_kv,
    )
    from ttasr.ops.quant import fuse_qkv, quantize_params

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
    if bk > 48:
        # the bf16-weights full-step A/B below is gated to bk <= 48 —
        # holding the unquantized set (~3.1 GB) through the batch-48
        # int8-cross stage (cross K+V ~5.9 GB) OOM'd the 16 GB chip
        del params
        params = None
    enc_out = jnp.asarray(
        rng.standard_normal((b, S, d)).astype(np.float32), jnp.bfloat16)

    # ---- RPC baseline: empty-ish loop ------------------------------------
    @jax.jit
    def rpc_base(x):
        def body(i, c):
            return c + 1.0
        return jax.lax.fori_loop(0, ITERS, body, x)

    def emit(name, value):
        results[name] = value
        print(json.dumps({"stage": name, "ms": round(value * 1e3, 3),
                          "shapes": f"b{b} k{k} len{clen}"}), flush=True)

    base = timeit(rpc_base, jnp.zeros((8, 128), jnp.float32),
                  repeats=args.repeats)
    emit("rpc_baseline_total", base)

    def per_iter(total):
        return (total - base) / ITERS

    def record(name, total):
        # print-as-you-go: a late-stage OOM (beam_gather at batch 48)
        # must not lose the 30+ min of stages that already ran
        emit(name, per_iter(total))

    # ---- full _step loop (token fed back from logits) --------------------
    pad = jnp.zeros((bk,), jnp.int32)
    slot = jnp.asarray(clen - 8, jnp.int32)

    def step_loop(prms, cache):
        def body(i, carry):
            token, cache = carry
            logits, cache = _step(prms, cfg, token, slot, pad, cache)
            token = (jnp.argmax(logits, -1) % 1000).astype(jnp.int32)[:, None]
            return (token, cache)

        token0 = jnp.zeros((bk, 1), jnp.int32)
        token, cache = jax.lax.fori_loop(0, ITERS, body, (token0, cache))
        return token

    step_jit = jax.jit(step_loop)

    def make_cache(prms, cross_mode):
        # int8 values + positive scales generated DIRECTLY: routing a
        # (L, BK, clen, H, Dh) f32 tensor through quantize_kv OOM'd the
        # 16 GB chip at batch 16 (1.9 GB f32 temporary on top of both
        # param sets).  cross_mode: "bf16" | "int8" | "int4" (the
        # production default is int4).
        flat = "wqkv" in prms["decoder"]["blocks"] and dh == 64
        # init_cache must run under jit here: eagerly, the cross-KV
        # projection + quantization materializes ~4 GB of per-op f32
        # temporaries at batch 16 (inside beam_decode XLA fuses them)
        from functools import partial as _partial

        jit_init = jax.jit(_partial(
            init_cache, cfg=cfg, max_len=clen, beam_expand=k,
            kv_int8=True, cross_kv_int8=cross_mode == "int8",
            cross_kv_int4=cross_mode == "int4", flat_kv=flat))
        cache = jit_init(prms, enc_out=enc_out)
        # .astype on the HOST before jnp.asarray: rng.integers returns
        # int64 and an (L, BK, clen, H, Dh) int64 upload is 8x the int8
        # payload — at batch 48 that alone exhausted the 16 GB chip
        q8 = jnp.asarray(
            rng.integers(-127, 127, (L, bk, clen, h, dh)).astype(np.int8))
        sc = jnp.asarray(
            np.abs(rng.standard_normal((L, bk, clen, h))).astype(np.float32)
            + 0.01)
        if flat:
            hp = ((h + 7) // 8) * 8
            sc_t = jnp.pad(jnp.swapaxes(sc, 2, 3),
                           ((0, 0), (0, 0), (0, hp - h), (0, 0)))
            return cache.__class__(
                k=q8.reshape(L, bk, clen, h * dh),
                v=q8.reshape(L, bk, clen, h * dh),
                cross_k=cache.cross_k, cross_v=cache.cross_v,
                ks=sc_t, vs=sc_t, cks=cache.cks, cvs=cache.cvs)
        return cache.__class__(
            k=q8, v=q8,
            cross_k=cache.cross_k, cross_v=cache.cross_v,
            ks=sc, vs=sc, cks=cache.cks, cvs=cache.cvs)

    if b <= 16:
        # cross-KV at bf16 is b * 245.8 MB for K+V (11.8 GB at batch
        # 48) — the A/B only fits at small batch
        record("full_step_int8w", timeit(
            step_jit, params_q, make_cache(params_q, "bf16"),
            repeats=args.repeats))
    record("full_step_int8w_crossint8", timeit(
        step_jit, params_q, make_cache(params_q, "int8"),
        repeats=args.repeats))
    record("full_step_int8w_crossint4", timeit(
        step_jit, params_q, make_cache(params_q, "int4"),
        repeats=args.repeats))
    if bk <= 48:
        # bf16 A/B only at small batch: both param sets + caches exceed
        # the 16 GB chip at batch 16 x beam 5
        record("full_step_bf16w", timeit(
            step_jit, params, make_cache(params, "bf16"),
            repeats=args.repeats))
    del params

    # ---- cross attention only: XLA bf16 vs Pallas fused -----------------
    qc0 = jnp.asarray(
        rng.standard_normal((bk, 1, h, dh)).astype(np.float32), jnp.bfloat16)
    if b <= 16:
        # bf16 K+V = b * 245.8 MB — doesn't fit alongside params at 48
        ck = jnp.asarray(
            rng.standard_normal((L, b, S, h, dh)).astype(np.float32),
            jnp.bfloat16)
        cv = jnp.asarray(
            rng.standard_normal((L, b, S, h, dh)).astype(np.float32),
            jnp.bfloat16)

        @jax.jit
        def cross_bf16(qc, ck, cv):
            from ttasr.models.whisper.model import _cross_attention

            def layer(carry, scanned):
                ck_l, cv_l = scanned
                out = _cross_attention(carry, ck_l, cv_l)
                return out.astype(carry.dtype), None

            def body(i, carry):
                out, _ = jax.lax.scan(layer, carry, (ck, cv))
                return out

            return jax.lax.fori_loop(0, ITERS, body, qc)

        record("cross_attn_bf16_32L", timeit(
            cross_bf16, qc0, ck, cv, repeats=args.repeats))
        del ck, cv

    from ttasr.ops.cross_attention_pallas import (
        cross_attention_int8,
        transpose_scales,
    )

    s_pad = S + (-S) % 8
    ck8_flat = jnp.asarray(
        rng.integers(-127, 127, (L, b, s_pad, h * dh)).astype(np.int8))
    scales = jnp.asarray(
        rng.standard_normal((L * b, s_pad, h)).astype(np.float32) ** 2 + 0.01)
    sc_t = transpose_scales(scales).reshape(L, b, h, s_pad)

    @jax.jit
    def cross_int8_standalone(qc, ck8_flat, sc_t):
        def layer(carry, scanned):
            ck_l, cks_l, cv_l, cvs_l = scanned
            out = cross_attention_int8(
                carry.reshape(b, k, h, dh).astype(jnp.float32),
                ck_l, cks_l, cv_l, cvs_l, S)
            return out.reshape(bk, 1, h, dh).astype(carry.dtype), None

        def body(i, carry):
            out, _ = jax.lax.scan(layer, carry,
                                  (ck8_flat, sc_t, ck8_flat, sc_t))
            return out

        return jax.lax.fori_loop(0, ITERS, body, qc)

    record("cross_attn_int8_standalone_32L", timeit(
        cross_int8_standalone, qc0, ck8_flat, sc_t, repeats=args.repeats))

    # ---- fused attnout+cross kernel over 32 layers -----------------------
    from ttasr.ops.decoder_blocks_pallas import attnout_ln_q_cross_int8

    blocks = params_q["decoder"]["blocks"]
    x0 = jnp.asarray(rng.standard_normal((b, 8, d)).astype(np.float32))

    @jax.jit
    def fused_attnout_cross(x, blocks, ck8_flat, sc_t):
        def layer(carry, scanned):
            blk, ck_l, cks_l, cv_l, cvs_l = scanned
            xo, cross = attnout_ln_q_cross_int8(
                carry, carry,
                blk["wo"]["q"], blk["wo"]["s"], blk["bo"],
                blk["lnc_s"], blk["lnc_b"],
                blk["wq_c"]["q"], blk["wq_c"]["s"], blk["bq_c"],
                ck_l, cks_l, cv_l, cvs_l, s_real=S)
            return xo + cross, None

        def body(i, carry):
            out, _ = jax.lax.scan(layer, carry,
                                  (blocks, ck8_flat, sc_t, ck8_flat, sc_t))
            return out

        return jax.lax.fori_loop(0, ITERS, body, x)

    record("fused_attnout_cross_int8_32L", timeit(
        fused_attnout_cross, x0, blocks, ck8_flat, sc_t,
        repeats=args.repeats))

    # same kernel over the int4 nibble-packed cache (s_pad % 16 == 0)
    if s_pad % 16 == 0:
        from ttasr.ops.int4 import pack_int4

        ck4_flat = jax.jit(pack_int4)(ck8_flat)
        record("fused_attnout_cross_int4_32L", timeit(
            fused_attnout_cross, x0, blocks, ck4_flat, sc_t,
            repeats=args.repeats))

        # grouped variant: 2 audios per grid step (weight matmuls
        # amortize; VMEM only fits the packed cache)
        @jax.jit
        def fused_attnout_cross_g2(x, blocks, ck8_flat, sc_t):
            def layer(carry, scanned):
                blk, ck_l, cks_l, cv_l, cvs_l = scanned
                xo, cross = attnout_ln_q_cross_int8(
                    carry, carry,
                    blk["wo"]["q"], blk["wo"]["s"], blk["bo"],
                    blk["lnc_s"], blk["lnc_b"],
                    blk["wq_c"]["q"], blk["wq_c"]["s"], blk["bq_c"],
                    ck_l, cks_l, cv_l, cvs_l, s_real=S, group=2)
                return xo + cross, None

            def body(i, carry):
                out, _ = jax.lax.scan(layer, carry,
                                      (blocks, ck8_flat, sc_t,
                                       ck8_flat, sc_t))
                return out

            return jax.lax.fori_loop(0, ITERS, body, x)

        if b % 2 == 0:
            record("fused_attnout_cross_int4_g2_32L", timeit(
                fused_attnout_cross_g2, x0, blocks, ck4_flat, sc_t,
                repeats=args.repeats))

    # ---- self attention int8 over cache ----------------------------------
    q0 = jnp.asarray(
        rng.standard_normal((bk, 1, h, dh)).astype(np.float32), jnp.bfloat16)
    k8 = jnp.asarray(
        rng.integers(-127, 127, (L, bk, clen, h, dh)).astype(np.int8))
    ks = jnp.asarray(
        (np.abs(rng.standard_normal((L, bk, clen, h))) + 0.01)
        .astype(np.float32))
    mask = jnp.ones((bk, 1, 1, clen), bool)

    @jax.jit
    def self_int8(q, k8, ks):
        def layer(carry, scanned):
            k_l, ks_l, v_l, vs_l = scanned
            out = _quant_self_attention(carry, k_l, ks_l, v_l, vs_l, mask)
            return out.astype(carry.dtype), None

        def body(i, carry):
            out, _ = jax.lax.scan(layer, carry, (k8, ks, k8, ks))
            return out

        return jax.lax.fori_loop(0, ITERS, body, q)

    record("self_attn_int8_32L", timeit(
        self_int8, q0, k8, ks, repeats=args.repeats))

    # ---- fused self-attn megakernel: direct vs ancestry-indirect ----------
    # Kernel-level A/B for the beam-reorder trade WITHOUT the ~200 s
    # whole-beam compiles: direct kernel (+ the beam_gather_pallas stage
    # below = the copy path's true per-step cost) vs the indirect kernel
    # reading through an anc map (no copy at all).
    from ttasr.ops.self_attention_pallas import (
        self_attn_step_indirect_int8,
        self_attn_step_int8,
    )

    k_rows = args.beam
    b_audio = max(bk // k_rows, 1)
    hp = ((h + 7) // 8) * 8
    qkv0 = jnp.asarray(
        (rng.standard_normal((b_audio, k_rows, 3 * d)) * 0.1)
        .astype(np.float32))
    kf8 = jnp.asarray(
        rng.integers(-127, 127, (L, b_audio, k_rows, clen, d))
        .astype(np.int8))
    kfs = jnp.asarray(
        (np.abs(rng.standard_normal((L, b_audio, k_rows, hp, clen))) + 0.01)
        .astype(np.float32))
    pad0 = jnp.zeros((b_audio, k_rows), jnp.int32)
    anc0 = jnp.asarray(
        rng.integers(0, k_rows, (b_audio, k_rows, clen)).astype(np.int32))
    slot_mid = clen - 2

    def _megakernel_loop(indirect):
        def layer(carry, scanned):
            k_l, ks_l = scanned
            if indirect:
                attn, *_ = self_attn_step_indirect_int8(
                    carry, k_l, ks_l, k_l, ks_l, anc0, pad0, slot_mid,
                    n_heads=h)
            else:
                attn, *_ = self_attn_step_int8(
                    carry, k_l, ks_l, k_l, ks_l, pad0, slot_mid, n_heads=h)
            # float *0.0 keeps the loop-carried dependence (NaN-safe:
            # XLA cannot fold it away, unlike integer *0)
            nxt = carry + jnp.concatenate(
                [attn, attn, attn], axis=-1) * 0.0
            return nxt, None

        @jax.jit
        def run(qkv, kf8, kfs):
            def body(i, carry):
                out, _ = jax.lax.scan(layer, carry, (kf8, kfs))
                return out

            return jax.lax.fori_loop(0, ITERS, body, qkv)

        return run

    record("self_attn_kernel_32L", timeit(
        _megakernel_loop(False), qkv0, kf8, kfs, repeats=args.repeats))
    record("self_attn_indirect_kernel_32L", timeit(
        _megakernel_loop(True), qkv0, kf8, kfs, repeats=args.repeats))

    # ---- fused weight kernels over 32 layers ------------------------------
    from ttasr.ops.decoder_blocks_pallas import (
        attnout_ln_q_fused,
        qkv_int8_fused,
    )
    from ttasr.ops.decoder_mlp_pallas import mlp_with_crossout_int8

    x2_0 = jnp.asarray(rng.standard_normal((bk, d)).astype(np.float32))

    @jax.jit
    def weights_only(x2, blocks):
        def layer(carry, blk):
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

        def body(i, carry):
            out, _ = jax.lax.scan(layer, carry, blocks)
            return out

        return jax.lax.fori_loop(0, ITERS, body, x2)

    record("weight_kernels_32L", timeit(
        weights_only, x2_0, blocks, repeats=args.repeats))

    # ---- unembed + top-k ---------------------------------------------------
    hdn0 = jnp.asarray(
        rng.standard_normal((bk, d)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def unembed_topk(hdn, dec):
        from ttasr.models.whisper.model import _unembed

        def body(i, carry):
            logits = _unembed(carry, dec).astype(jnp.float32)
            cand = logits.reshape(b, k * cfg.vocab_size)
            vals, _ = jax.lax.top_k(cand, 2 * k)
            # fold a scalar back in to serialize iterations
            return carry * (1.0 + 0.0 * vals.sum().astype(carry.dtype))

        return jax.lax.fori_loop(0, ITERS, body, hdn)

    record("unembed_topk", timeit(
        unembed_topk, hdn0, params_q["decoder"], repeats=args.repeats))

    # ---- beam-step glue: rules + log_softmax + top-k + bookkeeping -------
    from ttasr.models.whisper.decode import (
        TokenizerInfo as _TI,
        _apply_rules,
        _static_suppress_mask,
        DecodingOptions as _DO,
    )
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer as _bt

    _tok = _bt()
    _ti = _TI.from_tokenizer(_tok, n_vocab=cfg.vocab_size)
    _opts = _DO(beam_size=k, sample_len=128, kv_int8=True,
                cross_kv_int8=True)
    _smask = jnp.asarray(_static_suppress_mask(_ti))
    lg0 = jnp.asarray(
        rng.standard_normal((bk, cfg.vocab_size)).astype(np.float32))
    nvec = jnp.full((bk,), 5, jnp.int32)
    lastv = jnp.full((bk,), 123, jnp.int32)

    @jax.jit
    def rules_softmax_topk(lg):
        def body(i, carry):
            logits = _apply_rules(
                carry, ti=_ti, opts=_opts, static_mask=_smask,
                n_sampled=nvec, last_tok=lastv, penult_tok=lastv,
                max_ts_tok=nvec)
            lp = jax.nn.log_softmax(logits, axis=-1)
            cand = lp.reshape(b, k * cfg.vocab_size)
            vals, _ = jax.lax.top_k(cand, 2 * k)
            return carry * (1.0 + 0.0 * vals.sum())

        return jax.lax.fori_loop(0, ITERS, body, lg)

    record("rules_softmax_topk", timeit(
        rules_softmax_topk, lg0, repeats=args.repeats))

    from ttasr.models.whisper.decode import _apply_rules_logprobs

    @jax.jit
    def rules_fused_topk(lg):
        def body(i, carry):
            lp = _apply_rules_logprobs(
                carry, ti=_ti, opts=_opts, static_mask=_smask,
                n_sampled=nvec, last_tok=lastv, penult_tok=lastv,
                max_ts_tok=nvec)
            cand = lp.reshape(b, k * cfg.vocab_size)
            vals, _ = jax.lax.top_k(cand, 2 * k)
            return carry * (1.0 + 0.0 * vals.sum())

        return jax.lax.fori_loop(0, ITERS, body, lg)

    record("rules_fused_topk", timeit(
        rules_fused_topk, lg0, repeats=args.repeats))

    # ---- beam-reorder gather of the self-KV caches -------------------------
    # the gather's g1/g2/s1/s2 temporaries need ~4.5 GB headroom at
    # batch 48: drop the cross caches (~4.6 GB) and megakernel operands
    # (~4.1 GB) that are dead from here on
    del ck8_flat, sc_t, kf8, kfs, qkv0, x0, q0
    if "ck4_flat" in dir():
        del ck4_flat
    idx0 = jnp.asarray(rng.integers(0, bk, (bk,)).astype(np.int32))

    @jax.jit
    def beam_gather(k8, ks, idx):
        def body(i, carry):
            # idx must be genuinely loop-variant: integer `chk * 0` or
            # `chk % 1` folds to 0 and the gathers hoist.  A select on
            # chk's parity keeps a REAL data dependence (both branches
            # are valid permutations, so the measured work is identical).
            idx, acc = carry
            g1, g2 = k8[:, idx], k8[:, jnp.roll(idx, 1)]   # k and v gathers
            s1, s2 = ks[:, idx], ks[:, jnp.roll(idx, 1)]
            chk = (g1.astype(jnp.int32).sum() + g2.astype(jnp.int32).sum()
                   + (s1.sum() + s2.sum()).astype(jnp.int32))
            rolled = jnp.roll(idx, 1)
            nxt = jnp.where(chk % 2 == 0, rolled, jnp.roll(rolled, 1))
            return (nxt, acc + chk)

        _, acc = jax.lax.fori_loop(0, ITERS, body, (idx, jnp.int32(0)))
        return acc

    record("beam_gather_kv", timeit(
        beam_gather, k8, ks, idx0, repeats=args.repeats))

    # ---- the same reorder via the Pallas permuted-copy kernel --------------
    hp = ((h + 7) // 8) * 8
    k8_flat = k8.reshape(L, bk, clen, h * dh)
    ks_flat = jnp.pad(jnp.swapaxes(ks, 2, 3),
                      ((0, 0), (0, 0), (0, hp - h), (0, 0)))

    @jax.jit
    def beam_gather_kernel(k8, ks, idx):
        from ttasr.ops.beam_gather_pallas import gather_cache_rows

        def body(i, carry):
            idx, acc = carry
            gk, gv, gks, gvs = gather_cache_rows(k8, k8, ks, ks, idx)
            chk = (gk.astype(jnp.int32).sum() + gv.astype(jnp.int32).sum()
                   + (gks.sum() + gvs.sum()).astype(jnp.int32))
            rolled = jnp.roll(idx, 1)  # parity select: see beam_gather
            nxt = jnp.where(chk % 2 == 0, rolled, jnp.roll(rolled, 1))
            return (nxt, acc + chk)

        _, acc = jax.lax.fori_loop(0, ITERS, body, (idx, jnp.int32(0)))
        return acc

    record("beam_gather_pallas", timeit(
        beam_gather_kernel, k8_flat, ks_flat, idx0, repeats=args.repeats))

    # ---- whole beam step: beam_decode at two lengths, slope = ms/step ----
    # Everything (_step + rules + top_k + finished insert + cache gather)
    # measured as the marginal cost of 64 extra tokens — immune to the
    # loop-hoisting pitfalls above because beam_decode is the REAL
    # program the bench runs.
    from ttasr.models.whisper.decode import (
        DecodingOptions, TokenizerInfo, beam_decode, pad_prompts,
    )
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    import dataclasses as _dc

    base_ti = TokenizerInfo.from_tokenizer(tok, n_vocab=cfg.vocab_size)
    ti = _dc.replace(base_ti, suppress=tuple(
        sorted(set(base_ti.suppress) | {base_ti.eot})))
    prompt, ppad = pad_prompts(
        [tok.sot_sequence("zh", "transcribe", predict_timestamps=True)] * b,
        tok.eot)
    key = jax.random.PRNGKey(0)
    for tag, indirect, int4 in (("", True, True), ("_crossint8", True, False),
                                ("_gather", False, False)):
        beam_ms = {}
        for n_tok in (64, 128):
            opts = DecodingOptions(beam_size=k, sample_len=n_tok,
                                   kv_int8=True, cross_kv_int8=True,
                                   cross_kv_int4=int4,
                                   beam_indirect=indirect)
            t_run = timeit(
                lambda o=opts: beam_decode(params_q, cfg, enc_out, prompt,
                                           ppad, key, opts=o, ti=ti),
                repeats=args.repeats)
            beam_ms[n_tok] = t_run
        emit(f"beam_step_marginal{tag}", (beam_ms[128] - beam_ms[64]) / 64)
        emit(f"beam64_total{tag}", beam_ms[64])
        emit(f"beam128_total{tag}", beam_ms[128])



if __name__ == "__main__":
    main()
