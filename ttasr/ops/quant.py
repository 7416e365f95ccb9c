"""int8 weight quantization for HBM-resident params.

Decode on TPU is HBM-bandwidth-bound: every step streams the decoder
weights (and cross-KV) from HBM.  Storing matmul weights as int8 with
per-output-channel scales halves that traffic vs bf16 — the same lever
CTranslate2's int8 mode uses on CPU/GPU (reference runs ``compute_type
="int8"`` for the task API, file_asr.py:188).

Scheme: symmetric per-output-channel absmax.  A quantized leaf is
``{"q": int8 (..., in, out), "s": f32 (..., 1, out)}``; the matmul
converts int8->bf16 in registers (XLA fuses the convert into the matmul
read) and applies the scale to the f32 accumulator.  LayerNorms, biases,
conv stems and positional tables stay in bf16/f32 (negligible bytes).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# matmul weight leaves eligible for quantization
QUANT_KEYS = frozenset({
    "wq", "wk", "wv", "wo", "w1", "w2",
    "wq_c", "wk_c", "wv_c", "wo_c", "embed",
})


def quantize_tensor(w, axis: int = -2) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 quantization.

    ``axis`` is the contraction (input) dimension; scales are computed
    over it, leaving one scale per output channel.
    """
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.astype(jnp.float32)}


def dequantize_tensor(leaf: Dict[str, Any], dtype=jnp.float32):
    return (leaf["q"].astype(jnp.float32) * leaf["s"]).astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf.keys()) == {"q", "s"}


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize all matmul weights of a Whisper param tree.

    ``embed`` is quantized over its feature dim (it acts as both an
    embedding gather and the logits projection).
    """

    def walk(tree, out):
        for key, leaf in tree.items():
            if isinstance(leaf, dict):
                out[key] = {}
                walk(leaf, out[key])
            elif key in QUANT_KEYS:
                if key == "embed":  # (V, d): scale per vocab row
                    out[key] = quantize_tensor(leaf, axis=-1)
                else:
                    out[key] = quantize_tensor(leaf, axis=-2)
            else:
                out[key] = leaf
        return out

    return walk(params, {})


def fuse_qkv(params: Dict[str, Any]) -> Dict[str, Any]:
    """Concatenate the decoder self-attn q/k/v projections into one
    ``wqkv`` leaf (int8 (L, D, 3D) + scales) + ``bqkv`` bias.

    Per-output-channel quantization concatenates exactly (each output
    column keeps its own scale), so one (D, 3D) matmul replaces three —
    the layout the fused Pallas decode kernels consume.  The separate
    wq/wk/wv leaves are removed (the incremental paths read wqkv).
    Whisper's k projection has no bias; its slot in bqkv is zero.
    """
    dec = dict(params["decoder"])
    blocks = dict(dec["blocks"])
    wq, wk, wv = blocks["wq"], blocks["wk"], blocks["wv"]
    if not (is_quantized(wq) and is_quantized(wk) and is_quantized(wv)):
        return params
    blocks["wqkv"] = {
        "q": jnp.concatenate([wq["q"], wk["q"], wv["q"]], axis=-1),
        "s": jnp.concatenate([wq["s"], wk["s"], wv["s"]], axis=-1),
    }
    blocks["bqkv"] = jnp.concatenate(
        [blocks["bq"], jnp.zeros_like(blocks["bq"]), blocks["bv"]], axis=-1
    )
    for key in ("wq", "wk", "wv", "bq", "bv"):
        del blocks[key]
    dec["blocks"] = blocks
    out = dict(params)
    out["decoder"] = dec

    # Encoder q/k/v fuse likewise: one (D, 3D) s8 matmul replaces three.
    # Besides the MXU-utilization win, each XLA s8 x s8 dot costs ~77 s
    # of cold compile through the relay (tools/probe_s8_matmul.py), so
    # 6 -> 4 dots/layer takes ~150 s off the cold-start budget.  The
    # dh**-0.5 q-scale stays a post-slice multiply in _self_attn*.
    enc = dict(out.get("encoder", {}))
    eblocks = dict(enc.get("blocks", {}))
    if all(is_quantized(eblocks.get(k)) for k in ("wq", "wk", "wv")):
        ewq, ewk, ewv = eblocks["wq"], eblocks["wk"], eblocks["wv"]
        eblocks["wqkv"] = {
            "q": jnp.concatenate([ewq["q"], ewk["q"], ewv["q"]], axis=-1),
            "s": jnp.concatenate([ewq["s"], ewk["s"], ewv["s"]], axis=-1),
        }
        eblocks["bqkv"] = jnp.concatenate(
            [eblocks["bq"], jnp.zeros_like(eblocks["bq"]), eblocks["bv"]],
            axis=-1)
        for key in ("wq", "wk", "wv", "bq", "bv"):
            del eblocks[key]
        enc["blocks"] = eblocks
        out["encoder"] = enc
    return out


def quantize_kv_sym(x, levels: int):
    """Per (row, slot, head) symmetric K/V-entry quantization.

    x: (B, T, H, Dh) -> (int8 values in [-levels, levels], f32 scales
    (B, T, H)).  ``levels=127`` is the int8 KV cache scheme
    (model.quantize_kv), ``levels=7`` the int4 one (int4.quantize_kv4).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / levels
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -levels, levels
    ).astype(jnp.int8)
    return q, scale


def quantize_act(x):
    """Per-row symmetric int8 activation quantization.

    x (..., K) bf16/f32 -> (int8 (..., K), f32 row scale (..., 1)).
    Dynamic (computed per call): activations have no calibration set and
    their range varies per token — the same scheme CTranslate2's int8
    mode applies to activations on its GPU path.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.round(xf / scale).astype(jnp.int8)
    return xq, scale


def quant_matmul_act8(xq, xs, leaf, b=None, out_dtype=jnp.bfloat16):
    """s8 x s8 -> s32 matmul on the MXU (2x the bf16 rate on v5e).

    xq (..., M, K) int8 with row scales xs (..., M, 1); leaf a quantized
    weight {"q": (K, N) int8, "s": (1, N)}.  K <= ~130k keeps the s32
    accumulator exact (127*127*K < 2^31).  Returns (..., M, N) out_dtype.
    """
    q = leaf["q"]
    acc = jax.lax.dot_general(
        xq, q, (((xq.ndim - 1,), (q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    wscale = leaf["s"].reshape(leaf["s"].shape[:-2] + (leaf["s"].shape[-1],))
    out = acc.astype(jnp.float32) * xs * wscale
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype)


def quant_matmul(x, leaf, preferred=jnp.float32):
    """x @ W for a quantized leaf; int8 streams from HBM, f32 accumulate."""
    q = leaf["q"].astype(x.dtype)
    out = jnp.matmul(x, q, preferred_element_type=preferred)
    # per-output-channel scale: s is (..., 1, out) -> broadcast over rows
    scale = leaf["s"]
    if scale.ndim == out.ndim:
        out = out * scale
    else:
        out = out * scale.reshape(scale.shape[:-2] + (scale.shape[-1],))[..., None, :]
    return out
