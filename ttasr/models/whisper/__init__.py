"""JAX Whisper: config, functional model, checkpoint import, decoding."""

from ttasr.models.whisper.config import WhisperConfig, PRESETS, get_config
from ttasr.models.whisper.model import (
    DecodeCache,
    decode_step,
    decode_train,
    encode,
    forward,
    init_cache,
    init_params,
)
from ttasr.models.whisper.load import (
    load_whisper,
    params_from_hf_model,
    params_from_state_dict,
)

__all__ = [
    "WhisperConfig", "PRESETS", "get_config",
    "DecodeCache", "decode_step", "decode_train", "encode", "forward",
    "init_cache", "init_params",
    "load_whisper", "params_from_hf_model", "params_from_state_dict",
]
