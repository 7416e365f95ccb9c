"""Checkpoint import: HF Whisper weights -> ttasr param pytrees.

Replaces the reference's reliance on pre-converted CTranslate2 model dirs
(``model.bin``/``config.json``/``tokenizer.json``, validated at reference
faster_whisper_asr.py:38-51).  We load HF-format checkpoints directly:
``model.safetensors`` (single or sharded) or ``pytorch_model.bin``.

Conversion notes: torch ``Linear.weight`` is (out, in) -> transposed to
(in, out); conv1d weight (out, in, k) -> (k, in, out); per-layer tensors
are stacked on a leading layer axis for the scan-based forward pass.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ttasr.models.whisper.config import WhisperConfig, get_config

_ENC_BLOCK_MAP = {
    "self_attn.q_proj.weight": ("wq", "linear"),
    "self_attn.q_proj.bias": ("bq", "bias"),
    "self_attn.k_proj.weight": ("wk", "linear"),
    "self_attn.v_proj.weight": ("wv", "linear"),
    "self_attn.v_proj.bias": ("bv", "bias"),
    "self_attn.out_proj.weight": ("wo", "linear"),
    "self_attn.out_proj.bias": ("bo", "bias"),
    "self_attn_layer_norm.weight": ("ln1_s", "bias"),
    "self_attn_layer_norm.bias": ("ln1_b", "bias"),
    "fc1.weight": ("w1", "linear"),
    "fc1.bias": ("b1", "bias"),
    "fc2.weight": ("w2", "linear"),
    "fc2.bias": ("b2", "bias"),
    "final_layer_norm.weight": ("ln2_s", "bias"),
    "final_layer_norm.bias": ("ln2_b", "bias"),
}

_DEC_EXTRA_MAP = {
    "encoder_attn.q_proj.weight": ("wq_c", "linear"),
    "encoder_attn.q_proj.bias": ("bq_c", "bias"),
    "encoder_attn.k_proj.weight": ("wk_c", "linear"),
    "encoder_attn.v_proj.weight": ("wv_c", "linear"),
    "encoder_attn.v_proj.bias": ("bv_c", "bias"),
    "encoder_attn.out_proj.weight": ("wo_c", "linear"),
    "encoder_attn.out_proj.bias": ("bo_c", "bias"),
    "encoder_attn_layer_norm.weight": ("lnc_s", "bias"),
    "encoder_attn_layer_norm.bias": ("lnc_b", "bias"),
}


def _convert(tensor: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return np.ascontiguousarray(tensor.T)
    return tensor


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, n_layers: int,
                  mapping: Dict[str, Tuple[str, str]]) -> Dict[str, np.ndarray]:
    out: Dict[str, list] = {}
    for suffix, (name, kind) in mapping.items():
        stack = [
            _convert(sd[f"{prefix}.layers.{i}.{suffix}"], kind)
            for i in range(n_layers)
        ]
        out[name] = np.stack(stack, axis=0)
    return out


def params_from_state_dict(sd: Dict[str, np.ndarray], cfg: WhisperConfig,
                           dtype: Optional[Any] = None) -> Dict[str, Any]:
    """Convert an HF Whisper state dict (numpy values) to a ttasr pytree."""
    import jax.numpy as jnp

    # Normalize key prefixes ("model." present in *ForConditionalGeneration).
    sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}

    enc_blocks = _stack_blocks(sd, "encoder", cfg.encoder_layers, _ENC_BLOCK_MAP)
    dec_map = dict(_ENC_BLOCK_MAP)
    dec_map.update(_DEC_EXTRA_MAP)
    dec_blocks = _stack_blocks(sd, "decoder", cfg.decoder_layers, dec_map)

    params = {
        "encoder": {
            "conv1_w": np.ascontiguousarray(sd["encoder.conv1.weight"].transpose(2, 1, 0)),
            "conv1_b": sd["encoder.conv1.bias"],
            "conv2_w": np.ascontiguousarray(sd["encoder.conv2.weight"].transpose(2, 1, 0)),
            "conv2_b": sd["encoder.conv2.bias"],
            "pos": sd["encoder.embed_positions.weight"],
            "blocks": enc_blocks,
            "ln_s": sd["encoder.layer_norm.weight"],
            "ln_b": sd["encoder.layer_norm.bias"],
        },
        "decoder": {
            "embed": sd["decoder.embed_tokens.weight"],
            "pos": sd["decoder.embed_positions.weight"],
            "blocks": dec_blocks,
            "ln_s": sd["decoder.layer_norm.weight"],
            "ln_b": sd["decoder.layer_norm.bias"],
        },
    }
    import jax

    target = dtype or jnp.float32
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=target), params)


def _numpy_state_dict_from_torch(module) -> Dict[str, np.ndarray]:
    return {k: v.detach().to("cpu").float().numpy() for k, v in module.state_dict().items()}


def params_from_hf_model(hf_model, dtype=None):
    """Convert a live transformers WhisperForConditionalGeneration/WhisperModel."""
    cfg = WhisperConfig.from_hf_config(hf_model.config)
    return params_from_state_dict(_numpy_state_dict_from_torch(hf_model), cfg, dtype), cfg


def _read_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    index_path = os.path.join(path, "model.safetensors.index.json")
    single = os.path.join(path, "model.safetensors")
    sd: Dict[str, np.ndarray] = {}
    if os.path.exists(index_path):
        with open(index_path, encoding="utf-8") as fh:
            index = json.load(fh)
        for shard in sorted(set(index["weight_map"].values())):
            sd.update(load_file(os.path.join(path, shard)))
    elif os.path.exists(single):
        sd.update(load_file(single))
    else:
        raise FileNotFoundError(f"no safetensors weights under {path}")
    return sd


def load_whisper(path_or_name: str, dtype=None) -> Tuple[Dict[str, Any], WhisperConfig]:
    """Load (params, config) from an HF checkpoint dir, or random-init a preset.

    - directory with config.json + model.safetensors / pytorch_model.bin ->
      real weights.
    - preset name ("tiny", "large-v3", ...) -> randomly initialized params
      (weights unavailable offline; used for tests and benchmarks).
    """
    if os.path.isdir(path_or_name):
        cfg = get_config(path_or_name)
        pt = os.path.join(path_or_name, "pytorch_model.bin")
        try:
            sd = _read_safetensors_dir(path_or_name)
        except FileNotFoundError:
            if not os.path.exists(pt):
                raise
            import torch

            sd = {
                k: v.float().numpy()
                for k, v in torch.load(pt, map_location="cpu", weights_only=True).items()
            }
        sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
        return params_from_state_dict(sd, cfg, dtype), cfg

    from ttasr.models.whisper.model import init_params

    cfg = get_config(path_or_name)
    params = init_params(cfg, seed=0)
    if dtype is not None:
        import jax

        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return params, cfg
