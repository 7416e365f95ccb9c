"""Word-level timestamp alignment via cross-attention DTW.

Replaces faster-whisper/openai-whisper's ``word_timestamps=True`` path
(reference streams words through faster_whisper_asr.py:240-255):
teacher-force the decoded tokens, collect decoder cross-attention
weights, average the alignment heads (upper half of decoder layers when
no model-specific head mask is known), median-filter over audio frames,
and run monotonic DTW to assign each token a frame span; tokens merge
into words (CJK chars stand alone, latin sub-tokens merge on the
no-leading-space rule).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ttasr.models.whisper.config import WhisperConfig
from ttasr.models.whisper.model import (
    _attention,
    _cross_attention,
    _embed_lookup,
    _ln,
    _merge_heads,
    _mlp,
    _model_dtype,
    _proj,
    _split_heads,
)

TIME_PER_FRAME = 0.02


def decode_with_cross_attn(params, cfg: WhisperConfig, tokens, enc_out):
    """Teacher-forced pass returning (logits, cross_qk).

    cross_qk: (L, B, H, T_tokens, T_audio) attention probabilities.
    """
    import jax
    import jax.numpy as jnp

    dec = params["decoder"]
    b, t = tokens.shape
    x = _embed_lookup(dec, tokens) + dec["pos"][:t]
    x = x.astype(_model_dtype(dec))
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]

    def block(x, blk):
        # _qkv_proj consumes the fused int8 ``wqkv`` leaf when present
        # (fuse_qkv removes wq/wk/wv — the int8 engine's params)
        from ttasr.models.whisper.decode import _qkv_proj

        h1 = _ln(x, blk["ln1_s"], blk["ln1_b"])
        q1, k1, v1 = _qkv_proj(h1, blk, cfg)
        x = x + _proj(
            _merge_heads(_attention(q1, k1, v1, causal)),
            blk["wo"], blk["bo"],
        )
        hc = _ln(x, blk["lnc_s"], blk["lnc_b"])
        q = _split_heads(_proj(hc, blk["wq_c"], blk["bq_c"]), cfg.decoder_heads)
        k = _split_heads(_proj(enc_out, blk["wk_c"]), cfg.decoder_heads)
        v = _split_heads(_proj(enc_out, blk["wv_c"], blk["bv_c"]), cfg.decoder_heads)
        scale = q.shape[-1] ** -0.5
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        x = x + _proj(
            _merge_heads(
                jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                           preferred_element_type=jnp.float32).astype(q.dtype)
            ),
            blk["wo_c"], blk["bo_c"],
        )
        x = x + _mlp(_ln(x, blk["ln2_s"], blk["ln2_b"]), blk)
        return x, probs

    x, cross_qk = jax.lax.scan(block, x, dec["blocks"])
    return x, cross_qk


def _median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis (audio frames)."""
    if width <= 1:
        return x
    pad = width // 2
    padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(windows, axis=-1)


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW through a (T_text, T_audio) cost matrix.

    Returns (text_indices, time_indices) of the optimal path.
    """
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), dtype=np.int8)
    for i in range(1, n + 1):
        row_cost = cost[i - 1]
        for j in range(1, m + 1):
            c0 = acc[i - 1, j - 1]
            c1 = acc[i - 1, j]
            c2 = acc[i, j - 1]
            best = min(c0, c1, c2)
            acc[i, j] = row_cost[j - 1] + best
            trace[i, j] = 0 if best == c0 else (1 if best == c1 else 2)
    i, j = n, m
    text_idx, time_idx = [], []
    while i > 0 and j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(text_idx[::-1]), np.asarray(time_idx[::-1])


@dataclasses.dataclass
class TokenTiming:
    token: int
    start: float
    end: float
    probability: float


_QK_BUCKETS = (32, 64, 128, 256, 448)


@functools.lru_cache(maxsize=4)
def _jitted_decode_qk(cfg: WhisperConfig):
    import jax

    return jax.jit(
        lambda params, tokens, enc_out: decode_with_cross_attn(
            params, cfg, tokens, enc_out))


def align_tokens(params, cfg: WhisperConfig, tokenizer, text_tokens: List[int],
                 enc_out, *, prompt_len: int = 0, num_frames: int = 1500,
                 medfilt_width: int = 7, qk_scale: float = 1.0,
                 ) -> List[TokenTiming]:
    """Assign (start, end) seconds to each text token of one window."""
    import jax.nn

    sot_seq = tokenizer.sot_sequence("zh", "transcribe", predict_timestamps=False)
    tokens = sot_seq + list(text_tokens) + [tokenizer.eot]
    # bucket-pad + jit: an eager 32-layer teacher-forced pass costs
    # hundreds of per-op dispatches through the remote relay (seconds
    # per window), and jitting without buckets would compile per token
    # count.  Pad rows are causal-masked history for nobody we read.
    real_t = len(tokens)
    width = next((b for b in _QK_BUCKETS if b >= real_t), real_t)
    arr = np.full((1, width), tokenizer.eot, np.int32)
    arr[0, :real_t] = tokens
    _hidden, cross_qk = _jitted_decode_qk(cfg)(params, arr, enc_out)
    qk = np.asarray(cross_qk)[:, :, :, :real_t]  # (L, B, H, T, S)

    n_layers = qk.shape[0]
    use_layers = list(range(n_layers // 2, n_layers)) or [n_layers - 1]
    w = qk[use_layers, 0]                        # (L', H, T, S)
    w = w.reshape(-1, w.shape[-2], w.shape[-1])  # (heads, T, S)
    w = w[:, :, : num_frames]

    # z-norm per head over time, median filter, average heads
    mean = w.mean(axis=-1, keepdims=True)
    std = w.std(axis=-1, keepdims=True) + 1e-8
    w = (w - mean) / std
    w = _median_filter(w, medfilt_width)
    matrix = w.mean(axis=0)                      # (T, S)

    # restrict to the text region (skip sot prefix, keep eot row)
    start_row = len(sot_seq)
    matrix = matrix[start_row - 1 : -1]          # rows predicting text+eot
    text_idx, time_idx = dtw_path(-matrix)

    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    jump_times = time_idx[jumps] * TIME_PER_FRAME
    timings: List[TokenTiming] = []
    for i, tok in enumerate(text_tokens):
        start = float(jump_times[i]) if i < len(jump_times) else 0.0
        end = float(jump_times[i + 1]) if i + 1 < len(jump_times) else start
        timings.append(TokenTiming(tok, start, end, 1.0))
    return timings


def merge_tokens_to_words(tokenizer, timings: Sequence[TokenTiming]
                          ) -> List[dict]:
    """Group token timings into words.

    CJK characters become standalone words; latin BPE pieces merge until
    the next piece starts with a space (GPT-2 byte-level convention).
    """
    words: List[dict] = []
    cur_tokens: List[int] = []
    cur_start: Optional[float] = None
    cur_end: float = 0.0

    def flush():
        nonlocal cur_tokens, cur_start, cur_end
        if cur_tokens:
            text = tokenizer.decode(cur_tokens)
            if text.strip():
                words.append({
                    "word": text,
                    "start": round(cur_start or 0.0, 2),
                    "end": round(cur_end, 2),
                })
        cur_tokens, cur_start = [], None

    for t in timings:
        piece = tokenizer.decode([t.token])
        is_cjk = any("一" <= ch <= "鿿" for ch in piece)
        starts_word = piece.startswith(" ") or is_cjk
        if starts_word and cur_tokens:
            flush()
        if cur_start is None:
            cur_start = t.start
        cur_tokens.append(t.token)
        cur_end = t.end
        if is_cjk:
            flush()
    flush()
    return words
