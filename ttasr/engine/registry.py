"""Process-wide engine sharing.

The reference process loads TWO model copies when both APIs run — the
task API's ``whisper_model`` global (file_asr.py:178-193) and the
streaming server's pipeline (streaming_asr.py:89-155).  On a 16 GB TPU
chip a second large-v3 copy is untenable, and separate engines also mean
separate compiled programs and separate batch queues.  This registry
hands every caller with the same (model path, compute type) the same
``WhisperEngine`` — one HBM weight set, one compile cache, and (via
:func:`ttasr.engine.serving.shared_server`) one continuous-batching
queue shared by task uploads and streaming chunks.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Optional, Tuple

_ENGINES: Dict[Tuple[str, str], object] = {}
_LOCK = threading.Lock()


def get_engine(model_path_or_name: str, *, compute_type: str = "int8",
               mesh=None):
    """Shared WhisperEngine per (resolved path, compute type).

    ``mesh`` is part of the identity only in the degenerate sense that a
    meshed engine is never shared with an unmeshed one (sharded vs
    replicated params are different programs).
    """
    from ttasr.engine.transcriber import WhisperEngine

    resolved = (os.path.abspath(model_path_or_name)
                if os.path.isdir(model_path_or_name) else model_path_or_name)
    key = (resolved, compute_type, id(mesh) if mesh is not None else None)
    with _LOCK:
        engine = _ENGINES.get(key)
        if engine is None:
            engine = WhisperEngine(model_path_or_name,
                                   compute_type=compute_type, mesh=mesh)
            _ENGINES[key] = engine
        return engine


def reset_engines() -> None:
    """Drop cached engines (tests)."""
    with _LOCK:
        _ENGINES.clear()
