"""Whisper decoding: greedy and beam search with CT2-parity logit rules.

This replaces CTranslate2's C++ beam-search decoder (the engine behind
``WhisperModel.transcribe`` at reference asr_core.py:159, with
``beam_size=5, condition_on_previous_text=True``).  Everything here is
TPU-idiomatic: fixed shapes, one compiled prefill and one compiled step
per (batch, beam) configuration, ``lax.while_loop`` token loops, and
logit rules expressed as vectorized masks (no per-token Python).

Implemented rule set (semantics of openai-whisper / faster-whisper):
- static suppress list (non-speech tokens + control specials),
- SuppressBlank at the first sampled position,
- ApplyTimestampRules: pairing, monotonicity, ``max_initial_timestamp``,
  and the "timestamp probability mass exceeds max text prob" rule,
- temperature 0 argmax / categorical sampling at t>0,
- beam search with per-audio finished-sequence bookkeeping and
  GoogleNMT-style length penalty (faster-whisper ``length_penalty=1.0``).

Prompt handling uses a fixed-size left-padded prompt buffer so that
``condition_on_previous_text`` (varying prompt lengths) never triggers
recompilation: pad tokens are masked out of attention and position
embeddings are shifted by the pad count.
"""

from __future__ import annotations

import dataclasses
import os
import zlib
from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ttasr.models.whisper.config import WhisperConfig
from ttasr.ops.cross_attention_pallas import cross_attention_int8
from ttasr.models.whisper.model import (
    DecodeCache,
    _attention,
    _cross_attention,
    _embed_lookup,
    _ln,
    _merge_heads,
    _mlp,
    _model_dtype,
    _proj,
    _quant_self_attention,
    _split_heads,
    _unembed,
    init_cache,
    quantize_kv,
)

NEG_INF = float(np.finfo(np.float32).min)

# Fixed shapes: one compilation serves every prompt/condition combination.
MAX_PROMPT = 256   # left-padded prompt buffer
SAMPLE_LEN = 224   # max new tokens per window (n_ctx // 2)
MAX_TOTAL = MAX_PROMPT + SAMPLE_LEN


@dataclasses.dataclass(frozen=True)
class DecodingOptions:
    """Static decode configuration (hashable: used as a jit static arg)."""

    beam_size: int = 5
    temperature: float = 0.0  # 0 = deterministic; >0 enables sampling ops
    length_penalty: float = 1.0
    patience: float = 1.0
    without_timestamps: bool = False
    max_initial_timestamp: float = 1.0
    suppress_blank: bool = True
    sample_len: int = SAMPLE_LEN
    max_prompt: int = MAX_PROMPT
    kv_int8: bool = False  # int8 self-KV cache: halves decode HBM traffic
    cross_kv_int8: bool = False  # int8 cross-KV: needs a fused kernel to win
    # Beam reorder via ancestry indirection (flat-cache kernel path only):
    # permute a (BK, len) index map instead of physically copying the
    # caches each step.  Default-on since the TPU A/B
    # (tools/profile_decode.py, batch 16): beam step 20.46 -> 15.30 ms,
    # beam128 total 2.50 -> 2.01 s — the +1.1 ms indirect-kernel masking
    # cost buys out the 4.6 ms Pallas permuted-copy gather entirely.
    beam_indirect: bool = True
    # int4 nibble-packed cross-KV (fused-kernel path only): halves the
    # dominant per-step HBM stream again.  A sub-mode of cross_kv_int8
    # (both must be set; the engine and bench default BOTH on).
    # Quantization error is bounded by tools/check_beam_divergence.py
    # --cross-int4, not assumed.
    cross_kv_int4: bool = False
    # int4 LANE-packed self-KV cache (fused flat-kernel path only): the
    # batch-48 profile converts cache bytes ~1:1 into step time and the
    # int8 self-KV is its largest term (2.84 GB/step, 5x beam-
    # replicated) — packing along D within-row halves it while the
    # per-step single-slot write stays a pure write (VERDICT r4 #2).
    # A sub-mode of kv_int8, like cross_kv_int4 of cross_kv_int8.
    kv_int4: bool = False
    # A/B control: run the two-stage rules + log_softmax path instead of
    # _apply_rules_logprobs.  Part of the jit cache key (opts is static);
    # the beam_decode/greedy_decode wrappers set it from
    # TTASR_UNFUSED_RULES at call time, so toggling the env between calls
    # recompiles correctly.
    unfused_rules: bool = False
    # Tensor-parallel mesh axis name when the decode body runs per-shard
    # inside shard_map (ttasr.parallel.tp.beam_decode_tp): attention
    # kernels see local heads; merged outputs all-gather over this axis.
    # None = single-chip / GSPMD paths (no collectives emitted).
    tp_axis: Optional[str] = None
    # TP v2 (row-parallel): wo / wo_c / MLP weights carry ROW slices per
    # shard (ttasr.parallel.tp.build_tp_decoder(row_parallel=True)), so
    # the per-chip weight stream shrinks with the mesh; partial sums
    # psum over tp_axis (3 collectives/layer) instead of gathering the
    # attention outputs (2/layer).  Requires matching v2 params.
    tp_row_parallel: bool = False
    # Smallest new-token capacity in the cache growth schedule.  Each
    # bucket compiles its OWN while_loop body (the full fused kernel
    # stack at that cache length), so bucket count trades cold-compile
    # time against the triangular cache-read saving: min_cap 32 ->
    # buckets 32/64/128 (3 compiles), 64 -> 64/128 (2), 128 -> one flat
    # loop.  tools/compile_breakdown.py measures both sides.
    growth_min_cap: int = 32


@dataclasses.dataclass(frozen=True)
class TokenizerInfo:
    """The token ids decoding needs (hashable, static under jit)."""

    eot: int
    sot: int
    no_timestamps: int
    timestamp_begin: int
    no_speech: Optional[int]
    blank: Tuple[int, ...]          # ids of " " (for SuppressBlank)
    suppress: Tuple[int, ...]       # static suppress list
    n_vocab: int
    # First id of the model's vocab PADDING (ids past the tokenizer's
    # real id space, e.g. a model head wider than the tokenizer).  These
    # ids decode to nothing and — being >= timestamp_begin — would parse
    # as absurd timestamps (hours-long seek advances); the static mask
    # bans them.  None when the tokenizer covers the full model vocab
    # (real Whisper vocabs: ts_end == n_vocab, nothing masked).
    pad_vocab_begin: Optional[int] = None

    @classmethod
    def from_tokenizer(cls, tok, n_vocab: Optional[int] = None) -> "TokenizerInfo":
        n_vocab = n_vocab or tok.vocab_size
        ts_end = None
        if tok.timestamp_begin is not None:
            ts_end = tok.timestamp_begin + 1501  # <|0.00|>..<|30.00|>
        id_space_end = max(tok.vocab_size, ts_end or 0)
        return cls(
            eot=tok.eot,
            sot=tok.sot,
            no_timestamps=tok.no_timestamps,
            timestamp_begin=tok.timestamp_begin,
            no_speech=tok.no_speech,
            blank=tuple(tok.encode(" ")),
            suppress=tuple(tok.suppress_tokens_default()),
            n_vocab=n_vocab,
            pad_vocab_begin=(id_space_end if n_vocab > id_space_end else None),
        )


# ---------------------------------------------------------------------------
# Prefill with left-padded prompt
# ---------------------------------------------------------------------------

def _qkv_proj(h, blk, cfg: WhisperConfig):
    """Self-attn q/k/v projections; consumes the fused ``wqkv`` layout
    (ttasr.ops.quant.fuse_qkv) when present.

    Head count derives from the projection WIDTH (local width // global
    head_dim), so tensor-parallel shards — whose blocks carry only their
    local heads' columns (ttasr.parallel.tp) — split correctly.
    """
    if "wqkv" in blk:
        qkv = _proj(h, blk["wqkv"], blk["bqkv"])
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    else:
        q = _proj(h, blk["wq"], blk["bq"])
        k_new = _proj(h, blk["wk"])
        v_new = _proj(h, blk["wv"], blk["bv"])
    dh = cfg.d_model // cfg.decoder_heads
    split = lambda t: _split_heads(t, t.shape[-1] // dh)  # noqa: E731
    return split(q), split(k_new), split(v_new)


def _tp_gather(x, tp_axis):
    """Concatenate head-local last-dim blocks across the tensor-parallel
    mesh axis.  No-op outside shard_map (``tp_axis=None``) — the
    single-chip fast path is byte-identical.  Shard i holds heads
    [i*h_loc, (i+1)*h_loc), so the tiled gather restores head order."""
    if tp_axis is None:
        return x
    return jax.lax.all_gather(x, tp_axis, axis=x.ndim - 1, tiled=True)


def _rp_proj(x_local, w, b, tp_axis):
    """Row-parallel projection: local input slice x ROW-slice weight,
    ``psum`` over the model axis, bias added once (TP v2)."""
    out = jax.lax.psum(_proj(x_local, w, None).astype(jnp.float32), tp_axis)
    return (out + b.astype(jnp.float32)).astype(x_local.dtype)


def _rp_mlp(xln, blk, tp_axis):
    """Row-parallel MLP: w1/b1 column-split (local hidden), w2
    row-split; partial sums psum, b2 added once (TP v2)."""
    h = jax.nn.gelu(_proj(xln, blk["w1"], blk["b1"]), approximate=False)
    out = jax.lax.psum(_proj(h, blk["w2"], None).astype(jnp.float32),
                       tp_axis)
    return (out + blk["b2"].astype(jnp.float32)).astype(xln.dtype)


def _prefill(params, cfg: WhisperConfig, tokens, pad_len, cache: DecodeCache,
             tp_axis=None, s_real=None, tp_row_parallel=False):
    """Teacher-forced pass over the fixed-size prompt buffer.

    tokens: (B, MAX_PROMPT) int32, left-padded; real tokens occupy
    positions ``pad_len..MAX_PROMPT-1`` and get positional indices
    ``0..real-1``.  pad_len: (B,) int32.
    Returns (logits (B, MAX_PROMPT, V), cache).

    ``tp_axis``: mesh axis name when running per-shard inside shard_map
    (ttasr.parallel.tp) — attention runs on the shard's local heads and
    the merged outputs all-gather before the replicated wo/wo_c/MLP.
    ``s_real``: valid cross-attention source slots — the pre-padding
    encoder length.  None = the full 30 s window
    (cfg.max_source_positions); short streaming windows pass their
    bucketed prefix length (VERDICT r3 #6).
    """
    if s_real is None:
        s_real = cfg.max_source_positions
    dec = params["decoder"]
    b, t = tokens.shape
    pos_ids = jnp.maximum(jnp.arange(t)[None, :] - pad_len[:, None], 0)
    x = _embed_lookup(dec, tokens) + dec["pos"][pos_ids]
    x = x.astype(_model_dtype(dec))

    q_ids = jnp.arange(t)[None, :, None]       # (1, T, 1) global slot of query
    k_ids = jnp.arange(t)[None, None, :]       # (1, 1, T) global slot of key
    valid = k_ids >= pad_len[:, None, None]    # pad slots never attend
    causal = k_ids <= q_ids
    mask = (causal & valid)[:, None]           # (B, 1, T, T)

    quantized = cache.quantized
    cross_quantized = cache.cross_quantized
    flat = cache.flat
    self_int4 = cache.self_int4

    def scan_block(x, scanned):
        if quantized and cross_quantized:
            blk, k_cache, v_cache, ks_cache, vs_cache, ck, cv, cks, cvs = scanned
        elif quantized:
            blk, k_cache, v_cache, ks_cache, vs_cache, ck, cv = scanned
        elif cross_quantized:
            blk, k_cache, v_cache, ck, cv, cks, cvs = scanned
        else:
            blk, k_cache, v_cache, ck, cv = scanned
        h = _ln(x, blk["ln1_s"], blk["ln1_b"])
        q, k_new, v_new = _qkv_proj(h, blk, cfg)
        if quantized and flat:
            # flat int8 layout: k/v (BK, len, D), scales (BK, HP, len);
            # int4 mode packs the merged rows along D (pure-write slots)
            if self_int4:
                from ttasr.ops.int4 import pack_int4_lanes, quantize_kv4

                k8, k_scale = quantize_kv4(k_new)
                v8, v_scale = quantize_kv4(v_new)
                store = lambda t: pack_int4_lanes(_merge_heads(t))  # noqa: E731
            else:
                k8, k_scale = quantize_kv(k_new)
                v8, v_scale = quantize_kv(v_new)
                store = _merge_heads
            hp = ks_cache.shape[1]
            n_h = k_scale.shape[-1]

            def sc_t(s):
                s = jnp.swapaxes(s, 1, 2)                   # (BK, H, T)
                return jnp.pad(s, ((0, 0), (0, hp - n_h), (0, 0)))

            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, store(k8), 0, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, store(v8), 0, axis=1)
            ks_cache = jax.lax.dynamic_update_slice_in_dim(
                ks_cache, sc_t(k_scale), 0, axis=2)
            vs_cache = jax.lax.dynamic_update_slice_in_dim(
                vs_cache, sc_t(v_scale), 0, axis=2)
        elif quantized:
            k8, k_scale = quantize_kv(k_new)
            v8, v_scale = quantize_kv(v_new)
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k8, 0, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v8, 0, axis=1)
            ks_cache = jax.lax.dynamic_update_slice_in_dim(ks_cache, k_scale, 0, axis=1)
            vs_cache = jax.lax.dynamic_update_slice_in_dim(vs_cache, v_scale, 0, axis=1)
        else:
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new, 0, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new, 0, axis=1)
        # prefill attends its own (exact) K/V block
        attn = _attention(q, k_new, v_new, mask)
        if tp_axis is not None and tp_row_parallel:
            # TP v2: local-head attention x the shard's wo ROW slice,
            # psum partial sums; same for wo_c and the MLP (the weight
            # stream splits over the model axis — VERDICT r4 #6a)
            x = x + _rp_proj(_merge_heads(attn), blk["wo"], blk["bo"],
                             tp_axis)
        else:
            x = x + _proj(_tp_gather(_merge_heads(attn), tp_axis),
                          blk["wo"], blk["bo"])
        hc = _ln(x, blk["lnc_s"], blk["lnc_b"])
        qc_flat = _proj(hc, blk["wq_c"], blk["bq_c"])
        qc = _split_heads(qc_flat,
                          qc_flat.shape[-1] // (cfg.d_model // cfg.decoder_heads))
        if cross_quantized:
            cross = _cross_attn_quantized(qc, cfg, ck, cks, cv, cvs, s_real)
        else:
            cross = _cross_attention(qc, ck, cv)
        if tp_axis is not None and tp_row_parallel:
            x = x + _rp_proj(_merge_heads(cross), blk["wo_c"],
                             blk["bo_c"], tp_axis)
            x = x + _rp_mlp(_ln(x, blk["ln2_s"], blk["ln2_b"]), blk,
                            tp_axis)
        else:
            x = x + _proj(_tp_gather(_merge_heads(cross), tp_axis),
                          blk["wo_c"], blk["bo_c"])
            x = x + _mlp(_ln(x, blk["ln2_s"], blk["ln2_b"]), blk)
        if quantized:
            return x, (k_cache, v_cache, ks_cache, vs_cache)
        return x, (k_cache, v_cache)

    operands = [dec["blocks"], cache.k, cache.v]
    if quantized:
        operands += [cache.ks, cache.vs]
    operands += [cache.cross_k, cache.cross_v]
    if cross_quantized:
        operands += [cache.cks, cache.cvs]
    if quantized:
        x, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
            scan_block, x, tuple(operands))
    else:
        x, (new_k, new_v) = jax.lax.scan(scan_block, x, tuple(operands))
        new_ks, new_vs = cache.ks, cache.vs
    x = _ln(x, dec["ln_s"], dec["ln_b"])
    return x, DecodeCache(new_k, new_v, cache.cross_k, cache.cross_v,
                          new_ks, new_vs, cache.cks, cache.cvs)


def _logits_at(params, hidden):
    """Project selected hidden rows (N, d) to vocab logits (N, V) —
    avoids materializing (N, MAX_PROMPT, V) prefill logits."""
    return _unembed(hidden, params["decoder"])


def _step(params, cfg: WhisperConfig, token, slot, pad_len, cache: DecodeCache,
          anc=None, tp_axis=None, s_real=None, tp_row_parallel=False):
    """Single-token decode at global cache slot ``slot`` (scalar int32).

    token: (B, 1).  pad_len: (B,) — pad slots stay masked out.
    anc: optional (B, cache_len) int32 beam-ancestry map (group-relative
    physical row per cache position) — beam_decode passes it on the flat
    fused-kernel path so the self-attention kernel reads through the
    indirection instead of a physically reordered cache.
    tp_axis: mesh axis name inside shard_map (ttasr.parallel.tp): the
    attention kernels run the shard's LOCAL heads (the KV cache streams
    — the dominant per-step HBM terms — split across chips); merged
    attention/cross outputs all-gather before the replicated wo/MLP.
    s_real: valid cross-attention source slots (pre-padding encoder
    length); None = cfg.max_source_positions (the full 30 s window).
    """
    if s_real is None:
        s_real = cfg.max_source_positions
    dec = params["decoder"]
    b = token.shape[0]
    max_len = cache.k.shape[2]
    pos = jnp.maximum(slot - pad_len, 0)       # (B,) real positional index
    x = _embed_lookup(dec, token) + dec["pos"][pos][:, None, :]
    x = x.astype(_model_dtype(dec))

    k_ids = jnp.arange(max_len)[None, :]
    mask = ((k_ids <= slot) & (k_ids >= pad_len[:, None]))[:, None, None]  # (B,1,1,T)

    quantized = cache.quantized
    cross_quantized = cache.cross_quantized
    flat = cache.flat

    # Fused Pallas decode path: active when the weights carry the fused
    # int8 layout (engine compute_type="int8" + fuse_qkv).  Every weight
    # matmul of the layer runs inside three kernels that stream int8
    # weights and convert in VMEM (XLA hoists the convert otherwise —
    # PERF_NOTES.md), collapsing ~40 XLA ops/layer of dispatch.
    dec_blocks = dec["blocks"]
    fused_kernels = "wqkv" in dec_blocks and quantized

    def scan_block_fused(x, scanned):
        import jax as _jax

        from ttasr.ops.decoder_blocks_pallas import (
            attnout_ln_q_fused,
            qkv_int8_fused,
        )
        from ttasr.ops.decoder_mlp_pallas import mlp_with_crossout_int8

        if cross_quantized:
            blk, k_cache, v_cache, ks_cache, vs_cache, ck, cv, cks, cvs = scanned
        else:
            blk, k_cache, v_cache, ks_cache, vs_cache, ck, cv = scanned
        interp = _jax.default_backend() == "cpu"
        x2 = x[:, 0].astype(jnp.float32)  # (B, D)
        qkv = qkv_int8_fused(
            x2, blk["ln1_s"], blk["ln1_b"],
            blk["wqkv"]["q"], blk["wqkv"]["s"], blk["bqkv"],
            interpret=interp,
        )
        # local head count from the projection width (= global heads on
        # one chip; heads/shard under tensor parallelism)
        dh = cfg.d_model // cfg.decoder_heads
        h = (qkv.shape[-1] // 3) // dh
        bk = x2.shape[0]
        b_audio = ck.shape[0]
        group = bk // b_audio
        if flat:
            # fused quantize + cache-read attention + in-softmax merge of
            # the new entry; caches updated AFTER with one small slice
            # write each (the kernel replaces ~19 XLA ops per layer).
            from ttasr.ops.self_attention_pallas import (
                self_attn_step_indirect_int8,
                self_attn_step_int8,
            )

            d = h * dh  # local width (== cfg.d_model on one chip)
            hp = ks_cache.shape[1]
            cache_len = k_cache.shape[1]
            d_store = k_cache.shape[-1]  # D, or D/2 int4 lane-packed
            self_int4 = d_store != d
            if anc is not None:
                # 2 audios per grid step: per-program fixed cost (DMA
                # setup, grid overhead) amortizes — same heuristic as
                # the cross kernel's audios_per_program
                attn_g, k8n, ksn, v8n, vsn = self_attn_step_indirect_int8(
                    qkv.reshape(b_audio, group, 3 * d),
                    k_cache.reshape(b_audio, group, cache_len, d_store),
                    ks_cache.reshape(b_audio, group, hp, cache_len),
                    v_cache.reshape(b_audio, group, cache_len, d_store),
                    vs_cache.reshape(b_audio, group, hp, cache_len),
                    anc.reshape(b_audio, group, cache_len),
                    pad_len.reshape(b_audio, group), slot,
                    n_heads=h, int4=self_int4,
                    group=2 if b_audio % 2 == 0 else 1, interpret=interp,
                )
            else:
                # audios per grid step: the greedy path has ONE row per
                # audio, so batch-48 would otherwise run 48 single-row
                # programs per layer; cap rows/program at ~16
                ap = next((a for a in (8, 4, 2)
                           if b_audio % a == 0 and a * group <= 16), 1)
                attn_g, k8n, ksn, v8n, vsn = self_attn_step_int8(
                    qkv.reshape(b_audio, group, 3 * d),
                    k_cache.reshape(b_audio, group, cache_len, d_store),
                    ks_cache.reshape(b_audio, group, hp, cache_len),
                    v_cache.reshape(b_audio, group, cache_len, d_store),
                    vs_cache.reshape(b_audio, group, hp, cache_len),
                    pad_len.reshape(b_audio, group), slot,
                    n_heads=h, int4=self_int4, group=ap, interpret=interp,
                )
            attn2 = attn_g.reshape(bk, d)

            def sc_pad(s):
                s = s.reshape(bk, h)
                return jnp.pad(s, ((0, 0), (0, hp - h)))

            # Do NOT write the caches here: threading the full cache
            # slabs through scan ys makes XLA rewrite the ENTIRE cache
            # every step (~1 GB/step of pass-through writes).  The new
            # rows are tiny — stack them as ys and write all layers
            # with ONE dynamic_update_slice per tensor after the scan.
            new_rows = (k8n.reshape(bk, d_store), v8n.reshape(bk, d_store),
                        sc_pad(ksn), sc_pad(vsn))
        else:
            q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
            split = lambda t: _split_heads(t[:, None, :], h)  # noqa: E731
            q, k_new, v_new = split(q), split(k_new), split(v_new)
            k8, k_scale = quantize_kv(k_new)
            v8, v_scale = quantize_kv(v_new)
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k8, slot, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v8, slot, axis=1)
            ks_cache = jax.lax.dynamic_update_slice_in_dim(
                ks_cache, k_scale, slot, axis=1)
            vs_cache = jax.lax.dynamic_update_slice_in_dim(
                vs_cache, v_scale, slot, axis=1)
            attn = _quant_self_attention(q, k_cache, ks_cache, v_cache,
                                         vs_cache, mask)
            attn2 = _merge_heads(attn)[:, 0].astype(jnp.float32)
        if tp_axis is not None and tp_row_parallel:
            # TP v2 (row-parallel): no attention gather — the shard's
            # local-head attn multiplies its ROW slice of wo and the
            # partial sums psum, so wo/wo_c/MLP weight streams split
            # over the model axis (VERDICT r4 #6a).  Biases add ONCE
            # after each psum (they are not partial-summable).
            from ttasr.ops.decoder_blocks_pallas import (
                ln_q_cross_int8,
                matmul_int8_partial,
            )
            from ttasr.ops.decoder_mlp_pallas import mlp_int8_fused

            partial_o = matmul_int8_partial(
                attn2, blk["wo"]["q"], blk["wo"]["s"], interpret=interp)
            xo = (x2 + _jax.lax.psum(partial_o, tp_axis)
                  + blk["bo"].reshape(1, -1).astype(jnp.float32))
            if cross_quantized and dh == 64 and h % 2 == 0 and group <= 8:
                audios_per_program = (
                    2 if ck.dtype == jnp.uint8 and b_audio % 2 == 0 else 1)
                cross_g = ln_q_cross_int8(
                    xo.reshape(b_audio, group, -1),
                    blk["lnc_s"], blk["lnc_b"],
                    blk["wq_c"]["q"], blk["wq_c"]["s"], blk["bq_c"],
                    ck, cks, cv, cvs, s_real=s_real,
                    group=audios_per_program, interpret=interp)
                cross2 = cross_g.reshape(bk, h * dh)
            else:
                qc = qkv_int8_fused(
                    xo, blk["lnc_s"], blk["lnc_b"],
                    blk["wq_c"]["q"], blk["wq_c"]["s"], blk["bq_c"],
                    interpret=interp)
                qc = _split_heads(qc[:, None, :].astype(x.dtype),
                                  qc.shape[-1] // dh)
                if cross_quantized:
                    cross = _cross_attn_quantized(qc, cfg, ck, cks, cv,
                                                  cvs, s_real)
                else:
                    cross = _cross_attention(qc, ck, cv)
                cross2 = _merge_heads(cross)[:, 0].astype(jnp.float32)
            partial_oc = matmul_int8_partial(
                cross2, blk["wo_c"]["q"], blk["wo_c"]["s"], interpret=interp)
            x_mid = (xo + _jax.lax.psum(partial_oc, tp_axis)
                     + blk["bo_c"].reshape(1, -1).astype(jnp.float32))
            partial_mlp = mlp_int8_fused(
                x_mid, blk["ln2_s"], blk["ln2_b"],
                blk["w1"]["q"], blk["w1"]["s"], blk["b1"],
                blk["w2"]["q"], blk["w2"]["s"], blk["b2"],
                interpret=interp, partial=True)
            x_new = (x_mid + _jax.lax.psum(partial_mlp, tp_axis)
                     + blk["b2"].reshape(1, -1).astype(jnp.float32))
            if flat:
                return x_new[:, None, :].astype(x.dtype), new_rows
            return x_new[:, None, :].astype(x.dtype), (
                k_cache, v_cache, ks_cache, vs_cache)
        # TP v1: gather local-head attention before the replicated wo —
        # the attnout kernels fuse wo@attn + residual + LN, so the
        # collective must land here, not after the kernel
        attn2 = _tp_gather(attn2, tp_axis)
        if cross_quantized and dh == 64 and h % 2 == 0 and group <= 8:
            # attn out-proj + lnc + cross-q + int8 cross-attention in ONE
            # kernel per layer: the int8 cross-KV stream (the dominant
            # per-step HBM term) converts in VMEM with no re-layouts.
            from ttasr.ops.decoder_blocks_pallas import (
                attnout_ln_q_cross_int8,
            )

            to_groups = lambda t: t.reshape(b_audio, group, -1)  # noqa: E731
            # 2 audios per grid step when the cache is int4-packed:
            # the kernel's weight matmuls amortize over 2x the rows
            # (4.98 -> 4.55 ms/step at batch 16; int8 blocks would
            # double-buffer past VMEM, so packed-only)
            audios_per_program = (
                2 if ck.dtype == jnp.uint8 and b_audio % 2 == 0 else 1)
            xo_g, cross_g = attnout_ln_q_cross_int8(
                to_groups(x2), to_groups(attn2),
                blk["wo"]["q"], blk["wo"]["s"], blk["bo"],
                blk["lnc_s"], blk["lnc_b"],
                blk["wq_c"]["q"], blk["wq_c"]["s"], blk["bq_c"],
                ck, cks, cv, cvs,
                s_real=s_real,
                group=audios_per_program, interpret=interp,
            )
            xo = xo_g.reshape(bk, cfg.d_model)
            cross2 = _tp_gather(cross_g.reshape(bk, h * dh), tp_axis)
        else:
            xo, qc = attnout_ln_q_fused(
                x2, attn2,
                blk["wo"]["q"], blk["wo"]["s"], blk["bo"],
                blk["lnc_s"], blk["lnc_b"],
                blk["wq_c"]["q"], blk["wq_c"]["s"], blk["bq_c"],
                interpret=interp,
            )
            qc = _split_heads(qc[:, None, :].astype(x.dtype),
                              qc.shape[-1] // dh)
            if cross_quantized:
                cross = _cross_attn_quantized(qc, cfg, ck, cks, cv, cvs,
                                              s_real)
            else:
                cross = _cross_attention(qc, ck, cv)
            cross2 = _tp_gather(
                _merge_heads(cross)[:, 0].astype(jnp.float32), tp_axis)
        x_new = mlp_with_crossout_int8(
            xo, cross2,
            blk["wo_c"]["q"], blk["wo_c"]["s"], blk["bo_c"],
            blk["ln2_s"], blk["ln2_b"],
            blk["w1"]["q"], blk["w1"]["s"], blk["b1"],
            blk["w2"]["q"], blk["w2"]["s"], blk["b2"],
            interpret=interp,
        )
        if flat:
            return x_new[:, None, :].astype(x.dtype), new_rows
        return x_new[:, None, :].astype(x.dtype), (
            k_cache, v_cache, ks_cache, vs_cache)

    def scan_block(x, scanned):
        if quantized and cross_quantized:
            blk, k_cache, v_cache, ks_cache, vs_cache, ck, cv, cks, cvs = scanned
        elif quantized:
            blk, k_cache, v_cache, ks_cache, vs_cache, ck, cv = scanned
        elif cross_quantized:
            blk, k_cache, v_cache, ck, cv, cks, cvs = scanned
        else:
            blk, k_cache, v_cache, ck, cv = scanned
        h = _ln(x, blk["ln1_s"], blk["ln1_b"])
        q, k_new, v_new = _qkv_proj(h, blk, cfg)
        if quantized:
            k8, k_scale = quantize_kv(k_new)
            v8, v_scale = quantize_kv(v_new)
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k8, slot, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v8, slot, axis=1)
            ks_cache = jax.lax.dynamic_update_slice_in_dim(
                ks_cache, k_scale, slot, axis=1)
            vs_cache = jax.lax.dynamic_update_slice_in_dim(
                vs_cache, v_scale, slot, axis=1)
            attn = _quant_self_attention(q, k_cache, ks_cache, v_cache,
                                         vs_cache, mask)
        else:
            k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new, slot, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new, slot, axis=1)
            attn = _attention(q, k_cache, v_cache, mask)
        x = x + _proj(_tp_gather(_merge_heads(attn), tp_axis),
                      blk["wo"], blk["bo"])
        hc = _ln(x, blk["lnc_s"], blk["lnc_b"])
        qc_flat = _proj(hc, blk["wq_c"], blk["bq_c"])
        qc = _split_heads(qc_flat,
                          qc_flat.shape[-1] // (cfg.d_model // cfg.decoder_heads))
        if cross_quantized:
            cross = _cross_attn_quantized(qc, cfg, ck, cks, cv, cvs, s_real)
        else:
            cross = _cross_attention(qc, ck, cv)
        x = x + _proj(_tp_gather(_merge_heads(cross), tp_axis),
                      blk["wo_c"], blk["bo_c"])
        x = x + _mlp(_ln(x, blk["ln2_s"], blk["ln2_b"]), blk)
        if quantized:
            return x, (k_cache, v_cache, ks_cache, vs_cache)
        return x, (k_cache, v_cache)

    if fused_kernels:
        scan_block = scan_block_fused

    operands = [dec["blocks"], cache.k, cache.v]
    if quantized:
        operands += [cache.ks, cache.vs]
    operands += [cache.cross_k, cache.cross_v]
    if cross_quantized:
        operands += [cache.cks, cache.cvs]
    if quantized and flat and fused_kernels:
        # scan ys are just each layer's new (BK, D) row / (BK, HP)
        # scales; write all layers with ONE dynamic_update_slice per
        # tensor.  (Threading the caches through ys made XLA rewrite
        # the ENTIRE ~1 GB cache every step — PERF_NOTES.md.)
        x, (k_rows, v_rows, ks_rows, vs_rows) = jax.lax.scan(
            scan_block, x, tuple(operands))
        zero = jnp.int32(0)
        new_k = jax.lax.dynamic_update_slice(
            cache.k, k_rows[:, :, None, :], (zero, zero, slot, zero))
        new_v = jax.lax.dynamic_update_slice(
            cache.v, v_rows[:, :, None, :], (zero, zero, slot, zero))
        new_ks = jax.lax.dynamic_update_slice(
            cache.ks, ks_rows[:, :, :, None], (zero, zero, zero, slot))
        new_vs = jax.lax.dynamic_update_slice(
            cache.vs, vs_rows[:, :, :, None], (zero, zero, zero, slot))
    elif quantized:
        x, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
            scan_block, x, tuple(operands))
    else:
        x, (new_k, new_v) = jax.lax.scan(scan_block, x, tuple(operands))
        new_ks, new_vs = cache.ks, cache.vs
    x = _ln(x, dec["ln_s"], dec["ln_b"])
    logits = _unembed(x[:, 0], dec)
    return logits, DecodeCache(new_k, new_v, cache.cross_k, cache.cross_v,
                               new_ks, new_vs, cache.cks, cache.cvs)


# ---------------------------------------------------------------------------
# Logit rules
# ---------------------------------------------------------------------------

def _static_suppress_mask(ti: TokenizerInfo) -> np.ndarray:
    mask = np.zeros((ti.n_vocab,), dtype=np.float32)
    for t in ti.suppress:
        if 0 <= t < ti.n_vocab:
            mask[t] = NEG_INF
    mask[ti.no_timestamps] = NEG_INF
    if ti.pad_vocab_begin is not None:
        # vocab padding past the tokenizer's id space: undecodable, and
        # ids >= timestamp_begin would parse as absurd timestamps
        mask[ti.pad_vocab_begin:] = NEG_INF
    return mask


def _apply_rules(logits, *, ti: TokenizerInfo, opts: DecodingOptions,
                 static_mask, n_sampled, last_tok, penult_tok, max_ts_tok):
    """Vectorized logit rules. logits: (N, V) f32. Scalars are per-row (N,)."""
    v = ti.n_vocab
    ids = jnp.arange(v)[None, :]
    logits = logits + static_mask[None, :]

    if opts.suppress_blank:
        blank_ids = jnp.asarray(list(ti.blank) + [ti.eot])
        blank_mask = jnp.where(
            jnp.isin(ids, blank_ids), NEG_INF, 0.0
        )
        logits = logits + jnp.where((n_sampled == 0)[:, None], blank_mask, 0.0)

    ts0 = ti.timestamp_begin
    if opts.without_timestamps:
        # timestamps fully disabled
        return logits + jnp.where(ids >= ts0, NEG_INF, 0.0)

    is_ts = ids >= ts0
    last_is_ts = last_tok >= ts0
    penult_is_ts = penult_tok >= ts0
    # pairing rules (active once at least one token sampled)
    active = n_sampled > 0
    # last was ts, penult was ts -> next cannot be a timestamp
    rule_a = (active & last_is_ts & ((n_sampled < 2) | penult_is_ts))[:, None] & is_ts
    # wait: when n_sampled == 1 and last is ts, next must be text?  openai:
    # penultimate_was_timestamp = (len < 2) or tokens[-2] >= ts0 -> mask timestamps.
    # last was ts, penult NOT ts -> next must be ts or eot
    rule_b = (active & last_is_ts & (n_sampled >= 2) & (~penult_is_ts))[:, None] & (
        (~is_ts) & (ids != ti.eot)
    )
    logits = jnp.where(rule_a | rule_b, NEG_INF, logits)

    # monotonicity: next timestamp >= last (strictly greater after a paired
    # segment-end timestamp; equality allowed after an unpaired start — the
    # openai "timestamp_last" rule).
    unpaired_last = active & last_is_ts & (n_sampled >= 2) & (~penult_is_ts)
    floor = jnp.maximum(max_ts_tok + jnp.where(unpaired_last, 0, 1), ts0)
    has_ts = max_ts_tok > 0
    mono = is_ts & (ids < floor[:, None]) & (active & has_ts)[:, None]
    logits = jnp.where(mono, NEG_INF, logits)

    # first sampled token must be a timestamp, bounded by max_initial_timestamp
    # (openai suppresses every non-timestamp at the first position, eot too)
    max_init = ts0 + int(round(opts.max_initial_timestamp / 0.02))
    first = (n_sampled == 0)[:, None]
    first_mask = (~is_ts) | (ids > max_init)
    logits = jnp.where(first & first_mask, NEG_INF, logits)

    # probability-mass rule: if sum of timestamp probs > max text prob,
    # force a timestamp.
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_mass = jax.nn.logsumexp(jnp.where(is_ts, logprobs, NEG_INF), axis=-1)
    text_max = jnp.max(jnp.where(is_ts, NEG_INF, logprobs), axis=-1)
    force_ts = (ts_mass > text_max)[:, None]
    logits = jnp.where(force_ts & (~is_ts), NEG_INF, logits)
    return logits


def _apply_rules_logprobs(logits, *, ti: TokenizerInfo,
                          opts: DecodingOptions, static_mask, n_sampled,
                          last_tok, penult_tok, max_ts_tok):
    """:func:`_apply_rules` fused with the caller's ``log_softmax``.

    The decode hot loops all need LOGPROBS of the post-rules logits; the
    two-stage form costs a second full softmax over (N, V) plus ~15
    materializing elementwise passes (measured 4.2 ms/step at batch 16
    on one chip — as much as an attention kernel).  This builds ONE
    suppress mask (every rule except probability-mass is
    logits-independent), softmaxes once, and applies the mass rule by
    analytic renormalization: forcing timestamps zeroes the text mass,
    so the renormalized logprob over the timestamp block is exactly
    ``lp - ts_mass`` (= logit - logsumexp(ts logits)) — identical math
    to re-softmaxing the masked logits, with no second pass.

    Token-for-token equal to ``log_softmax(_apply_rules(...))`` up to
    fp summation order (tests/test_decode.py covers the rule semantics
    through the one-pass path; `_apply_rules` itself remains for the
    HF-processor parity fixtures).
    """
    v = ti.n_vocab
    ids = jnp.arange(v)[None, :]
    masked = logits + static_mask[None, :]

    sup = jnp.zeros(masked.shape, bool)
    if opts.suppress_blank:
        blank_ids = jnp.asarray(list(ti.blank) + [ti.eot])
        sup = sup | ((n_sampled == 0)[:, None] & jnp.isin(ids, blank_ids))

    ts0 = ti.timestamp_begin
    is_ts = ids >= ts0
    if opts.without_timestamps:
        lp = jax.nn.log_softmax(
            jnp.where(sup | is_ts, NEG_INF, masked), axis=-1)
        return lp

    last_is_ts = last_tok >= ts0
    penult_is_ts = penult_tok >= ts0
    active = n_sampled > 0
    rule_a = ((active & last_is_ts
               & ((n_sampled < 2) | penult_is_ts))[:, None] & is_ts)
    rule_b = ((active & last_is_ts & (n_sampled >= 2)
               & (~penult_is_ts))[:, None]
              & ((~is_ts) & (ids != ti.eot)))
    unpaired_last = active & last_is_ts & (n_sampled >= 2) & (~penult_is_ts)
    floor = jnp.maximum(max_ts_tok + jnp.where(unpaired_last, 0, 1), ts0)
    has_ts = max_ts_tok > 0
    mono = is_ts & (ids < floor[:, None]) & (active & has_ts)[:, None]
    max_init = ts0 + int(round(opts.max_initial_timestamp / 0.02))
    first = (n_sampled == 0)[:, None] & ((~is_ts) | (ids > max_init))
    sup = sup | rule_a | rule_b | mono | first

    lp = jax.nn.log_softmax(jnp.where(sup, NEG_INF, masked), axis=-1)
    ts_mass = jax.nn.logsumexp(jnp.where(is_ts, lp, NEG_INF), axis=-1)
    text_max = jnp.max(jnp.where(is_ts, NEG_INF, lp), axis=-1)
    force = (ts_mass > text_max)[:, None]
    return jnp.where(force,
                     jnp.where(is_ts, lp - ts_mass[:, None], NEG_INF),
                     lp)




def _untranspose_scales(scales_t, h: int):
    """Kernel (B, H, S) scale layout back to (B, S, H)."""
    return jnp.swapaxes(scales_t, 1, 2)


def _cross_attn_quantized(qc, cfg: WhisperConfig, ck8, cks_t, cv8, cvs_t,
                          s_real: int):
    """Dispatch quantized cross-attention over the FLAT int8 cache.

    ck8/cv8: (B, S, H*Dh) int8 (init_cache stores the quantized cross-KV
    flat — a 5-D int8 layout tile-pads in HBM and forces a per-step
    relayout at the kernel boundary).  Single-token steps with <=8 beam
    rows per audio use the fused Pallas kernel; other shapes (prefill)
    fall back to the XLA folded-scale path with the padded source slots
    masked out.
    """
    bk, t, h, dh = qc.shape
    packed = ck8.dtype == jnp.uint8
    b = ck8.shape[0]
    s = 2 * ck8.shape[1] if packed else ck8.shape[1]
    group = bk // b
    on_tpu = jax.default_backend() == "tpu"
    if t == 1 and group <= 8 and dh == 64 and h % 2 == 0:
        out = cross_attention_int8(
            qc.reshape(b, group, h, dh), ck8, cks_t, cv8, cvs_t, s_real,
            interpret=not on_tpu,
        )
        return out.reshape(bk, t, h, dh).astype(qc.dtype)
    # XLA fallback (prefill, once per window): folded scales + mask.
    # int4 unpacks here too — once per window, not per step.
    if packed:
        from ttasr.ops.int4 import unpack_int4

        ck8 = unpack_int4(ck8)
        cv8 = unpack_int4(cv8)
    cks = _untranspose_scales(cks_t, h)
    cvs = _untranspose_scales(cvs_t, h)
    qg = qc.reshape(b, group * t, h, dh)
    mask = (jnp.arange(s)[None, :] < s_real)[None, None]
    out = _quant_self_attention(qg, ck8.reshape(b, s, h, dh), cks,
                                cv8.reshape(b, s, h, dh), cvs, mask)
    return out.reshape(bk, t, h, dh)

def _use_flat_kv(params, cfg: WhisperConfig, opts: DecodingOptions) -> bool:
    """Flat int8 self-KV layout: only when the fused decode kernels run
    (int8 fused weights) and the self-attention kernel's head_dim-64
    assumption holds."""
    return (opts.kv_int8
            and "wqkv" in params["decoder"]["blocks"]
            and cfg.d_model // cfg.decoder_heads == 64)


def _use_cross_int4(params, cfg: WhisperConfig, opts: DecodingOptions) -> bool:
    """int4 cross-KV needs the fused-kernel configuration: the packed
    cache only has in-VMEM unpack paths in the Pallas kernels and the
    once-per-window XLA prefill fallback — under a mesh (unfused
    GSPMD-partitioned graph) the per-step XLA unpack would materialize,
    so the option is silently ignored there (like ``beam_indirect``).

    Requires ``cross_kv_int8`` too: int4 is a sub-mode of the quantized
    cross pipeline, so disabling cross_kv_int8 (bench --no-cross-kv-int8,
    engine compute_type != int8) yields the bf16 cross cache rather than
    silently keeping int4 active."""
    return (opts.cross_kv_int4
            and opts.cross_kv_int8
            and _use_flat_kv(params, cfg, opts)
            and cfg.decoder_heads % 2 == 0)


def _use_self_int4(params, cfg: WhisperConfig, opts: DecodingOptions) -> bool:
    """int4 lane-packed self-KV: flat fused-kernel path only (the packed
    cache unpacks in-VMEM inside the self-attention kernels), even head
    count (the D/2 column split must land on a head boundary), and a
    sub-mode of kv_int8 so disabling the quantized cache disables this
    too.  Head-count parity is checked on the LOCAL width under tensor
    parallelism (init_cache sizes to the shard)."""
    return (opts.kv_int4
            and opts.kv_int8
            and _use_flat_kv(params, cfg, opts)
            and cfg.decoder_heads % 2 == 0)


def _growth_buckets(max_prompt: int, sample_len: int, min_cap: int = 32):
    """Static cache-length schedule: the per-step beam gather and
    self-attention read cost track the CURRENT cache length, so decoding
    in growing buckets (32/64/128/... new-token capacity) pays the
    triangular cost instead of the rectangular one (PERF_NOTES.md).
    ``min_cap`` sets the first bucket (DecodingOptions.growth_min_cap):
    every bucket is a separately compiled while_loop body, so fewer
    buckets = faster cold compile at a bounded extra read cost."""
    buckets = []
    cap = max(min_cap, 1)
    while cap < sample_len:
        buckets.append(max_prompt + cap)
        cap *= 2
    buckets.append(max_prompt + sample_len)
    return buckets


def _tile_cache_rows(cache: DecodeCache, k: int) -> DecodeCache:
    """Tile the SELF caches K x along the row axis (beam expansion after
    a B-row prefill): each beam row starts with its audio's prompt K/V.
    Cross K/V stay at B — the kernels broadcast over the beam group."""
    if k == 1:
        return cache

    def rep(x):
        return jnp.repeat(x, k, axis=1) if x.ndim > 1 else x

    return dataclasses.replace(
        cache, k=rep(cache.k), v=rep(cache.v),
        ks=rep(cache.ks), vs=rep(cache.vs),
    )


def _pad_cache_to(cache: DecodeCache, new_len: int) -> DecodeCache:
    """Grow the self-KV caches (len axis) to ``new_len`` slots."""
    cur = cache.k.shape[2]
    if cur >= new_len:
        return cache
    pad = new_len - cur

    def grow(x, axis=2):
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    sc_axis = 3 if cache.flat else 2  # flat scales are (L, BK, HP, len)
    ks = grow(cache.ks, sc_axis) if cache.quantized else cache.ks
    vs = grow(cache.vs, sc_axis) if cache.quantized else cache.vs
    return DecodeCache(grow(cache.k), grow(cache.v),
                       cache.cross_k, cache.cross_v, ks, vs,
                       cache.cks, cache.cvs)


# ---------------------------------------------------------------------------
# Greedy / sampling decode
# ---------------------------------------------------------------------------

def _env_unfused_rules() -> bool:
    """Explicit truthiness for TTASR_UNFUSED_RULES: "0"/"false"/"no"/""
    disable, "1"/"true"/"yes" enable (any other non-empty value also
    enables, with the usual flag-env convention)."""
    val = os.environ.get("TTASR_UNFUSED_RULES", "").strip().lower()
    return val not in ("", "0", "false", "no")


def greedy_decode(params, cfg: WhisperConfig, enc_out, prompt, pad_len, rng,
                  temperature=None, *, opts: DecodingOptions,
                  ti: TokenizerInfo):
    """Greedy / temperature-sampled decode — see :func:`_greedy_decode`.

    Thin wrapper resolving the TTASR_UNFUSED_RULES A/B env var at CALL
    time into the static ``opts.unfused_rules`` flag, symmetric with
    :func:`beam_decode` (the flag is honored by both decode paths).
    """
    if _env_unfused_rules() and not opts.unfused_rules:
        opts = dataclasses.replace(opts, unfused_rules=True)
    return _greedy_decode(params, cfg, enc_out, prompt, pad_len, rng,
                          temperature, opts=opts, ti=ti)


@partial(jax.jit, static_argnames=("cfg", "opts", "ti"))
def _greedy_decode(params, cfg: WhisperConfig, enc_out, prompt, pad_len, rng,
                   temperature=None, *, opts: DecodingOptions,
                   ti: TokenizerInfo):
    """Greedy / temperature-sampled decode of one batch of 30 s windows.

    Args:
      enc_out: (B, 1500, d).
      prompt: (B, MAX_PROMPT) left-padded prompt (pad value irrelevant).
      pad_len: (B,) number of pad slots.
      rng: PRNG key (used when sampling).
      temperature: traced scalar OR (B,) per-row vector; defaults to
        ``opts.temperature``.  Being traced, the whole temperature-fallback
        ladder reuses ONE compile — and per-row temperatures let a
        continuous-batching server pack requests at different ladder
        rungs into one step.

    Returns dict with tokens (B, sample_len), lengths, sum_logprob,
    no_speech_prob.
    """
    b = enc_out.shape[0]
    if temperature is None:
        temperature = jnp.asarray(opts.temperature, jnp.float32)
    else:
        temperature = jnp.asarray(temperature, jnp.float32)
    temperature = jnp.broadcast_to(temperature, (b,))
    max_prompt = prompt.shape[1]
    buckets = _growth_buckets(max_prompt, opts.sample_len,
                               opts.growth_min_cap)
    cache = init_cache(params, cfg, enc_out,
                       max_len=buckets[0],
                       kv_int8=opts.kv_int8,
                       cross_kv_int8=opts.cross_kv_int8,
                       cross_kv_int4=_use_cross_int4(params, cfg, opts),
                       flat_kv=_use_flat_kv(params, cfg, opts),
                       kv_int4=_use_self_int4(params, cfg, opts))
    hidden, cache = _prefill(params, cfg, prompt, pad_len, cache,
                             tp_axis=opts.tp_axis, s_real=enc_out.shape[1],
                             tp_row_parallel=opts.tp_row_parallel)

    # no_speech prob: at the sot position's logits (predicting the token
    # after sot). sot sits right after the pad at index pad_len + sot_index;
    # faster-whisper reads it at the sot position of the forward pass.
    sot_slot = jnp.argmax((prompt == ti.sot).astype(jnp.int32) *
                          jnp.arange(max_prompt)[None, :], axis=1)
    sot_hidden = jnp.take_along_axis(
        hidden, sot_slot[:, None, None], axis=1
    )[:, 0]
    sot_logits = _logits_at(params, sot_hidden).astype(jnp.float32)
    no_speech_prob = (
        jax.nn.softmax(sot_logits, axis=-1)[:, ti.no_speech]
        if ti.no_speech is not None
        else jnp.zeros((b,), jnp.float32)
    )

    static_mask = jnp.asarray(_static_suppress_mask(ti))
    last_logits = _logits_at(params, hidden[:, -1]).astype(jnp.float32)

    state = dict(
        tokens=jnp.full((b, opts.sample_len), ti.eot, jnp.int32),
        n=jnp.zeros((b,), jnp.int32),               # sampled count per row
        finished=jnp.zeros((b,), bool),
        sum_logprob=jnp.zeros((b,), jnp.float32),
        last=jnp.full((b,), -1, jnp.int32),
        penult=jnp.full((b,), -1, jnp.int32),
        max_ts=jnp.zeros((b,), jnp.int32),
        logits=last_logits,
        cache=cache,
        step=jnp.asarray(0, jnp.int32),
        rng=rng,
    )

    def body(s):
        if opts.unfused_rules:  # A/B control path (static: in the jit key)
            logprobs = jax.nn.log_softmax(_apply_rules(
                s["logits"], ti=ti, opts=opts, static_mask=static_mask,
                n_sampled=s["n"], last_tok=s["last"], penult_tok=s["penult"],
                max_ts_tok=s["max_ts"]), axis=-1)
        else:
            # one-pass rules + softmax (logprobs are shift-invariant per
            # row, so argmax and temperature sampling are unchanged)
            logprobs = _apply_rules_logprobs(
                s["logits"], ti=ti, opts=opts, static_mask=static_mask,
                n_sampled=s["n"], last_tok=s["last"], penult_tok=s["penult"],
                max_ts_tok=s["max_ts"],
            )
        new_rng, sub = jax.random.split(s["rng"])
        greedy_tok = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
        sampled_tok = jax.random.categorical(
            sub, logprobs / jnp.maximum(temperature, 1e-6)[:, None], axis=-1
        ).astype(jnp.int32)
        next_tok = jnp.where(temperature > 0.0, sampled_tok, greedy_tok)
        tok_logprob = jnp.take_along_axis(
            logprobs, next_tok[:, None], axis=1
        )[:, 0]
        newly_finished = next_tok == ti.eot
        active = ~s["finished"]
        # faster/openai include the eot logprob in sum_logprob
        sum_logprob = s["sum_logprob"] + jnp.where(active, tok_logprob, 0.0)
        write_tok = jnp.where(active, next_tok, ti.eot)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            s["tokens"], write_tok[:, None], s["step"], axis=1
        )
        # bookkeeping (only for active, non-eot samples)
        sampled = active & (~newly_finished)
        penult = jnp.where(sampled, s["last"], s["penult"])
        last = jnp.where(sampled, next_tok, s["last"])
        is_ts = sampled & (next_tok >= ti.timestamp_begin)
        # monotonicity floor: next timestamp must be >= current (CT2 allows
        # equal), so floor = max_ts = sampled timestamp.
        max_ts = jnp.where(is_ts, jnp.maximum(s["max_ts"], next_tok), s["max_ts"])
        n = s["n"] + sampled.astype(jnp.int32)
        finished = s["finished"] | newly_finished

        slot = max_prompt + s["step"]
        new_logits, new_cache = _step(
            params, cfg, write_tok[:, None], slot, pad_len, s["cache"],
            tp_axis=opts.tp_axis, s_real=enc_out.shape[1],
            tp_row_parallel=opts.tp_row_parallel,
        )
        return dict(
            tokens=tokens, n=n, finished=finished, sum_logprob=sum_logprob,
            last=last, penult=penult, max_ts=max_ts,
            logits=new_logits.astype(jnp.float32), cache=new_cache,
            step=s["step"] + 1, rng=new_rng,
        )

    final = state
    for bucket_len in buckets:
        final = dict(final, cache=_pad_cache_to(final["cache"], bucket_len))
        cap = bucket_len - max_prompt

        def bucket_cond(s, _cap=cap):
            return ((s["step"] < _cap)
                    & (s["step"] < opts.sample_len)
                    & (~jnp.all(s["finished"])))

        final = jax.lax.while_loop(bucket_cond, body, final)
    return {
        "tokens": final["tokens"],
        "lengths": final["n"],
        "sum_logprob": final["sum_logprob"],
        "no_speech_prob": no_speech_prob,
    }


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

def _gather_cache(cache: DecodeCache, idx) -> DecodeCache:
    """Reorder the batch axis (axis=1 of (L,B,...)) by ``idx``.

    Cross-attention K/V are NOT gathered: beam reordering only permutes
    beams within the same audio, and cross K/V are identical across those
    beams — skipping the gather saves the dominant HBM copy per step.

    The flat int8 layout routes through a Pallas permuted-copy kernel:
    XLA's batch-axis gather on these arrays measured ~8x off the HBM
    roofline and matched the cost of the whole rest of the decode step
    (PERF_NOTES.md, tools/profile_decode.py ``beam_gather_kv``).
    """
    if cache.flat and cache.quantized:
        from ttasr.ops.beam_gather_pallas import gather_cache_rows

        k, v, ks, vs = gather_cache_rows(
            cache.k, cache.v, cache.ks, cache.vs, idx,
            interpret=jax.default_backend() == "cpu",
        )
        return DecodeCache(
            k=k, v=v, cross_k=cache.cross_k, cross_v=cache.cross_v,
            ks=ks, vs=vs, cks=cache.cks, cvs=cache.cvs,
        )
    ks = cache.ks[:, idx] if cache.quantized else cache.ks
    vs = cache.vs[:, idx] if cache.quantized else cache.vs
    return DecodeCache(
        k=cache.k[:, idx], v=cache.v[:, idx],
        cross_k=cache.cross_k, cross_v=cache.cross_v, ks=ks, vs=vs,
        cks=cache.cks, cvs=cache.cvs,
    )


def beam_decode(params, cfg: WhisperConfig, enc_out, prompt, pad_len, rng,
                *, opts: DecodingOptions, ti: TokenizerInfo):
    """Beam-search decode (beam_size = opts.beam_size) of B windows.

    Thin wrapper that resolves the TTASR_UNFUSED_RULES A/B env var at
    CALL time into the static ``opts.unfused_rules`` flag — reading the
    env at trace time would leave it out of the jit cache key, so
    toggling it within one process would silently reuse the other leg's
    compiled program.  See :func:`_beam_decode` for semantics.
    """
    if _env_unfused_rules() and not opts.unfused_rules:
        opts = dataclasses.replace(opts, unfused_rules=True)
    return _beam_decode(params, cfg, enc_out, prompt, pad_len, rng,
                        opts=opts, ti=ti)


@partial(jax.jit, static_argnames=("cfg", "opts", "ti"))
def _beam_decode(params, cfg: WhisperConfig, enc_out, prompt, pad_len, rng,
                 *, opts: DecodingOptions, ti: TokenizerInfo):
    """Beam-search decode (beam_size = opts.beam_size) of B windows.

    Follows openai-whisper BeamSearchDecoder semantics: per-audio
    finished-sequence set of size K, completion when K sequences have
    finished (patience scales that), final selection by length-penalized
    total logprob.

    Returns dict with tokens (B, sample_len), lengths, sum_logprob,
    no_speech_prob — the selected best sequence per audio.
    """
    b = enc_out.shape[0]
    k = opts.beam_size
    bk = b * k

    # Beams of the same audio share encoder output and cross-KV; only the
    # self-attn caches expand to B*K rows.
    pad_rep = jnp.repeat(pad_len, k, axis=0)

    max_prompt = prompt.shape[1]
    buckets = _growth_buckets(max_prompt, opts.sample_len,
                               opts.growth_min_cap)
    flat_kv = _use_flat_kv(params, cfg, opts)
    # Ancestry indirection: beams never physically reorder the flat
    # caches; a (BK, len) map of group-relative source rows is permuted
    # instead and the self-attention kernel reads through it.
    use_indirect = flat_kv and opts.beam_indirect
    own_row = (jnp.arange(bk, dtype=jnp.int32) % k)[:, None]
    # Prefill ONCE per audio, not per beam: all K beams of an audio share
    # the identical prompt, so the teacher-forced pass runs at B rows and
    # the written self caches tile K x afterwards (cross K/V already stay
    # at B; the kernels broadcast over the beam group) — 1/K the prefill
    # FLOPs and prompt-region cache writes.
    cache = init_cache(params, cfg, enc_out,
                       max_len=buckets[0], beam_expand=1,
                       kv_int8=opts.kv_int8,
                       cross_kv_int8=opts.cross_kv_int8,
                       cross_kv_int4=_use_cross_int4(params, cfg, opts),
                       flat_kv=flat_kv,
                       kv_int4=_use_self_int4(params, cfg, opts))
    hidden_b, cache = _prefill(params, cfg, prompt, pad_len, cache,
                               tp_axis=opts.tp_axis, s_real=enc_out.shape[1],
                             tp_row_parallel=opts.tp_row_parallel)
    cache = _tile_cache_rows(cache, k)

    sot_slot = jnp.argmax((prompt == ti.sot).astype(jnp.int32) *
                          jnp.arange(max_prompt)[None, :], axis=1)
    sot_hidden = jnp.take_along_axis(
        hidden_b, sot_slot[:, None, None], axis=1
    )[:, 0]
    sot_logits = _logits_at(params, sot_hidden).astype(jnp.float32)
    no_speech_prob = (
        jax.nn.softmax(sot_logits, axis=-1)[:, ti.no_speech]
        if ti.no_speech is not None
        else jnp.zeros((b,), jnp.float32)
    )

    static_mask = jnp.asarray(_static_suppress_mask(ti))
    max_finished = k  # completion target per audio (patience=1.0)

    state = dict(
        tokens=jnp.full((bk, opts.sample_len), ti.eot, jnp.int32),
        n=jnp.zeros((bk,), jnp.int32),
        cum_logprob=jnp.where(  # only beam 0 live initially
            (jnp.arange(bk) % k) == 0, 0.0, NEG_INF
        ).astype(jnp.float32),
        last=jnp.full((bk,), -1, jnp.int32),
        penult=jnp.full((bk,), -1, jnp.int32),
        max_ts=jnp.zeros((bk,), jnp.int32),
        # last-prompt-position logits are identical across a group: the
        # (B, V) unembed repeats K x instead of running at BK rows
        logits=jnp.repeat(
            _logits_at(params, hidden_b[:, -1]).astype(jnp.float32),
            k, axis=0),
        cache=cache,
        fin_tokens=jnp.full((b, k, opts.sample_len), ti.eot, jnp.int32),
        fin_len=jnp.zeros((b, k), jnp.int32),
        fin_logprob=jnp.full((b, k), NEG_INF, jnp.float32),
        fin_count=jnp.zeros((b,), jnp.int32),
        step=jnp.asarray(0, jnp.int32),
    )
    if use_indirect:
        # prefill wrote each row's own prompt -> identity ancestry
        state["anc"] = jnp.broadcast_to(own_row, (bk, buckets[0]))

    def body(s):
        if opts.unfused_rules:  # A/B control path (static: in the jit key)
            logprobs = jax.nn.log_softmax(_apply_rules(
                s["logits"], ti=ti, opts=opts, static_mask=static_mask,
                n_sampled=s["n"], last_tok=s["last"], penult_tok=s["penult"],
                max_ts_tok=s["max_ts"]), axis=-1)
        else:
            logprobs = _apply_rules_logprobs(            # (BK, V)
                s["logits"], ti=ti, opts=opts, static_mask=static_mask,
                n_sampled=s["n"], last_tok=s["last"], penult_tok=s["penult"],
                max_ts_tok=s["max_ts"],
            )
        v = ti.n_vocab
        cand = s["cum_logprob"][:, None] + logprobs     # (BK, V)
        cand = cand.reshape(b, k * v)
        # top 2K candidates so that eot-finishing beams don't starve the beam
        top_val, top_idx = jax.lax.top_k(cand, 2 * k)   # (B, 2K)
        src_beam = top_idx // v                          # within-audio beam
        tok = (top_idx % v).astype(jnp.int32)
        is_eot = tok == ti.eot

        # --- finished bookkeeping -----------------------------------------
        # openai BeamSearchDecoder.update semantics: candidates are
        # scanned best-first and the scan STOPS once beam_size non-eot
        # survivors are collected — an eot candidate reaches the finished
        # set only if it ranks ABOVE the K-th survivor.  (Harvesting eot
        # from the whole top-2K floods the finished set with low-score
        # finishers and ends the search early — the round-3 beam-5
        # failure on the overfit micro model was exactly this.)
        non_eot = (~is_eot).astype(jnp.int32)
        non_eot_before = jnp.cumsum(non_eot, axis=1) - non_eot  # exclusive
        qualifies = is_eot & (non_eot_before < k)
        eot_rank = jnp.cumsum(qualifies.astype(jnp.int32), axis=1) - 1
        slot = s["fin_count"][:, None] + eot_rank
        can_store = qualifies & (slot < k) & (eot_rank >= 0)
        # gather candidate sequences (tokens come from their source beams)
        src_flat = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)
        cand_tokens = s["tokens"][src_flat].reshape(b, 2 * k, opts.sample_len)
        cand_n = s["n"][src_flat].reshape(b, 2 * k)

        # Vectorized finished-set insert: for each target slot s there is
        # at most ONE storable candidate (slot = fin_count + eot_rank is
        # strictly increasing over eot candidates), so a (B, K, 2K)
        # one-hot + argmax replaces the former 2K-iteration fori_loop of
        # scatter updates (~6 dispatches per iteration in the hot step).
        sel = can_store[:, None, :] & (
            slot[:, None, :] == jnp.arange(k)[None, :, None]
        )                                                   # (B, K, 2K)
        has = jnp.any(sel, axis=2)                          # (B, K)
        idx = jnp.argmax(sel, axis=2)                       # (B, K)
        got_tokens = jnp.take_along_axis(
            cand_tokens, idx[:, :, None], axis=1)           # (B, K, T)
        fin_tokens = jnp.where(has[:, :, None], got_tokens, s["fin_tokens"])
        fin_len = jnp.where(
            has, jnp.take_along_axis(cand_n, idx, axis=1), s["fin_len"])
        fin_logprob = jnp.where(
            has, jnp.take_along_axis(top_val, idx, axis=1), s["fin_logprob"])
        fin_count = jnp.minimum(
            s["fin_count"] + jnp.sum(can_store, axis=1), k
        )

        # --- select K surviving (non-eot) candidates ----------------------
        surv_score = jnp.where(is_eot, NEG_INF, top_val)
        surv_rank = jnp.argsort(-surv_score, axis=1)[:, :k]      # (B, K)
        row = jnp.arange(b)[:, None]
        sel_tok = tok[row, surv_rank]                            # (B, K)
        sel_score = surv_score[row, surv_rank]
        sel_src = src_beam[row, surv_rank]                       # (B, K)
        sel_flat_src = (jnp.arange(b)[:, None] * k + sel_src).reshape(-1)

        # reorder state along beams
        tokens = s["tokens"][sel_flat_src]
        n = s["n"][sel_flat_src]
        last = s["last"][sel_flat_src]
        penult = s["penult"][sel_flat_src]
        max_ts = s["max_ts"][sel_flat_src]
        if use_indirect:
            # permute the 74 KB ancestry map, not the ~GB caches; the
            # new entry this step lands in each beam's OWN physical row
            cache2 = s["cache"]
            anc2 = s["anc"][sel_flat_src]
            anc2 = jax.lax.dynamic_update_slice(
                anc2, own_row, (jnp.int32(0), max_prompt + s["step"]))
        else:
            cache2 = _gather_cache(s["cache"], sel_flat_src)
            anc2 = None

        new_tok = sel_tok.reshape(-1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, new_tok[:, None], s["step"], axis=1
        )
        penult = last
        last = new_tok
        is_ts = new_tok >= ti.timestamp_begin
        max_ts = jnp.where(is_ts, jnp.maximum(max_ts, new_tok), max_ts)
        n = n + 1
        cum_logprob = sel_score.reshape(-1)

        slot_id = max_prompt + s["step"]
        new_logits, cache3 = _step(
            params, cfg, new_tok[:, None], slot_id, pad_rep, cache2, anc2,
            tp_axis=opts.tp_axis, s_real=enc_out.shape[1],
            tp_row_parallel=opts.tp_row_parallel,
        )
        out = dict(
            tokens=tokens, n=n, cum_logprob=cum_logprob, last=last,
            penult=penult, max_ts=max_ts,
            logits=new_logits.astype(jnp.float32), cache=cache3,
            fin_tokens=fin_tokens, fin_len=fin_len, fin_logprob=fin_logprob,
            fin_count=fin_count, step=s["step"] + 1,
        )
        if use_indirect:
            out["anc"] = anc2
        return out

    s = state
    for bucket_len in buckets:
        s = dict(s, cache=_pad_cache_to(s["cache"], bucket_len))
        if use_indirect:
            cur_len = s["anc"].shape[1]
            if cur_len < bucket_len:
                s["anc"] = jnp.concatenate(
                    [s["anc"],
                     jnp.broadcast_to(own_row, (bk, bucket_len - cur_len))],
                    axis=1)
        cap = bucket_len - max_prompt

        def bucket_cond(st, _cap=cap):
            return ((st["step"] < _cap)
                    & (st["step"] < opts.sample_len)
                    & (~jnp.all(st["fin_count"] >= max_finished)))

        s = jax.lax.while_loop(bucket_cond, body, s)

    # If an audio has no finished sequence (hit sample_len), fall back to the
    # best live beam, appending an implicit eot.
    live_best = jnp.argmax(s["cum_logprob"].reshape(b, k), axis=1)
    row = jnp.arange(b)
    live_tokens = s["tokens"].reshape(b, k, -1)[row, live_best]
    live_len = s["n"].reshape(b, k)[row, live_best]
    live_logprob = s["cum_logprob"].reshape(b, k)[row, live_best]

    need_fallback = s["fin_count"] == 0
    fin_tokens = jnp.where(need_fallback[:, None, None],
                           live_tokens[:, None, :], s["fin_tokens"])
    fin_len = jnp.where(need_fallback[:, None], live_len[:, None], s["fin_len"])
    fin_logprob = jnp.where(need_fallback[:, None], live_logprob[:, None],
                            s["fin_logprob"])

    # length-penalized selection (GoogleNMT, faster-whisper length_penalty)
    lengths = jnp.maximum(fin_len + 1, 1).astype(jnp.float32)  # + eot
    if opts.length_penalty is None:
        penalty = lengths
    else:
        penalty = ((5.0 + lengths) / 6.0) ** opts.length_penalty
    scores = jnp.where(fin_logprob <= NEG_INF / 2, NEG_INF, fin_logprob / penalty)
    best = jnp.argmax(scores, axis=1)
    out_tokens = fin_tokens[row, best]
    out_len = fin_len[row, best]
    out_logprob = fin_logprob[row, best]
    return {
        "tokens": out_tokens,
        "lengths": out_len,
        "sum_logprob": out_logprob,
        "no_speech_prob": no_speech_prob,
    }


# ---------------------------------------------------------------------------
# Host-side helpers
# ---------------------------------------------------------------------------

# The raw (unjitted) python function, for callers that monkeypatch
# module internals and need a fresh trace (tests); jax.jit provides it
# on _beam_decode via functools.wraps.
beam_decode.__wrapped__ = _beam_decode.__wrapped__


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def build_prompt(tokenizer, *, language: str = "zh", task: str = "transcribe",
                 without_timestamps: bool = False,
                 prefix_tokens: Sequence[int] = (),
                 previous_tokens: Sequence[int] = (),
                 initial_prompt_tokens: Sequence[int] = ()) -> List[int]:
    """Assemble the decoder prompt (faster-whisper get_prompt semantics):
    ``[sot_prev] + (initial_prompt + previous)[-(224):] + sot_seq + prefix``.
    """
    prompt: List[int] = []
    prev = list(initial_prompt_tokens) + list(previous_tokens)
    if prev:
        prompt.append(tokenizer.sot_prev)
        prompt.extend(prev[-(MAX_PROMPT // 2 - 1) :])
    prompt.extend(
        tokenizer.sot_sequence(language, task, predict_timestamps=not without_timestamps)
    )
    if prefix_tokens:
        prompt.extend(prefix_tokens)
    return prompt[-(MAX_PROMPT - 1) :]


def pad_prompts(prompts: Sequence[Sequence[int]], pad_value: int,
                width: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Left-pad prompts to a fixed-width buffer (default MAX_PROMPT).

    Short prompts (no previous-text conditioning) use small buckets
    (16/32) so the prefill pass does no wasted work; a bounded bucket set
    means a bounded number of compiled prefill variants.  The 32 bucket
    matters for streaming: an ``initial_prompt`` like "繁體中文" plus
    specials is ~17 tokens, which previously fell through to the full
    256-wide conditioned-prompt prefill on EVERY chunk.

    The 64/144 buckets serve ``condition_on_previous_text`` carries
    (VERDICT round-2 #7): ``build_prompt`` caps previous context at
    ``MAX_PROMPT//2 - 1`` = 127 tokens, so the steady-state conditioned
    prompt is at most 127 + sot_prev + sot_seq(3) = 131 tokens — bucket
    144 (a sublane multiple), not 256.  Only prefix-heavy prompts pay
    the full 256-wide prefill.
    """
    b = len(prompts)
    if width is None:
        longest = max((len(p) for p in prompts), default=0)
        width = (16 if longest <= 16
                 else 32 if longest <= 32
                 else 64 if longest <= 64
                 else 144 if longest <= 144 else MAX_PROMPT)
    out = np.full((b, width), pad_value, np.int32)
    pad_len = np.zeros((b,), np.int32)
    for i, p in enumerate(prompts):
        p = list(p)[-width:]
        out[i, width - len(p) :] = p
        pad_len[i] = width - len(p)
    return out, pad_len
