"""Orbax checkpointing with HF-Trainer-style auto-resume.

Replaces the reference's HF Trainer checkpoint handling
(``get_last_checkpoint`` detection at train_asr.py:374-392,
``resume_from_checkpoint`` precedence at :710-716, ``save_steps``
cadence from run.sh:25).  Checkpoints live at
``{output_dir}/checkpoint-{step}/`` like HF's layout.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def get_last_checkpoint(output_dir: str) -> Optional[str]:
    """Latest ``checkpoint-N`` dir, or None (train_asr.py:374-392 parity)."""
    if not os.path.isdir(output_dir):
        return None
    best_step, best_path = -1, None
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            step = int(m.group(1))
            if step > best_step:
                best_step, best_path = step, os.path.join(output_dir, name)
    return best_path


def save_checkpoint(output_dir: str, step: int, state: Any,
                    keep: int = 3) -> str:
    """Save train state (params/opt_state/step) via orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    _cleanup_old(output_dir, keep)
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a train state saved by :func:`save_checkpoint`."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), item=template)


def save_params(path: str, params: Any) -> str:
    """Save bare params (final model export; HF ``save_model`` analogue)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
    return path


def restore_params(path: str, template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), item=template)


def _cleanup_old(output_dir: str, keep: int) -> None:
    ckpts = []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m:
            ckpts.append((int(m.group(1)), os.path.join(output_dir, name)))
    ckpts.sort()
    import shutil

    for _, path in ckpts[:-keep] if keep else []:
        shutil.rmtree(path, ignore_errors=True)
