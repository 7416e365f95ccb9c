"""SpecAugment on log-mel input features (jitted, static shapes).

Parity surface: reference train_asr.py:139-144 (``apply_spec_augment``
model arg) + :590-619 (attention-mask-guided time masking).  The
reference delegates to HF Whisper's ``_mask_input_features``:
time/feature spans are zeroed with per-row span counts drawn as
``floor(prob * valid_len / span_len + U[0,1))`` bounded below by
``min_masks`` — the SpecAugment policy of Park et al. 2019.  Defaults
match HF WhisperConfig (mask_time_prob 0.05, length 10, min 2;
mask_feature_prob 0.0, length 10, min 0).

TPU-native formulation: everything is fixed-shape tensor math under
jit — a static upper bound of candidate spans per row, activity decided
by the sampled count, the span membership test vectorized over
(batch, span, position).  No per-row Python, no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    """Hashable (jit-static) SpecAugment policy; HF WhisperConfig defaults."""

    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10
    mask_feature_min_masks: int = 0


def _axis_masks(rng, batch: int, axis_size: int, valid_len, *,
                prob: float, span: int, min_masks: int):
    """(batch, axis_size) bool — True where a masked span covers.

    ``valid_len`` (batch,) restricts spans to the real (unpadded) region,
    the role of the reference's forward_attention_mask
    (train_asr.py:590-594).
    """
    max_spans = int(math.ceil(prob * axis_size / span)) + min_masks + 1
    rng_n, rng_s = jax.random.split(rng)
    valid = jnp.maximum(valid_len.astype(jnp.float32), 1.0)
    u = jax.random.uniform(rng_n, (batch,))
    n = jnp.floor(prob * valid / span + u).astype(jnp.int32)
    n = jnp.maximum(n, min_masks)
    # never more spans than fit in the valid region
    n = jnp.minimum(n, jnp.maximum(valid_len // span, 0))
    # per-row start in [0, valid_len - span]; uniform trick since
    # jax.random.randint cannot take per-row maxvals
    start_range = jnp.maximum(valid_len - span + 1, 1).astype(jnp.float32)
    s = jax.random.uniform(rng_s, (batch, max_spans))
    starts = jnp.floor(s * start_range[:, None]).astype(jnp.int32)
    active = jnp.arange(max_spans)[None, :] < n[:, None]
    pos = jnp.arange(axis_size)
    within = (pos[None, None, :] >= starts[:, :, None]) & (
        pos[None, None, :] < (starts + span)[:, :, None]
    )
    return jnp.any(within & active[:, :, None], axis=1)


def spec_augment(rng, mel, num_frames, cfg: SpecAugmentConfig):
    """Apply SpecAugment to ``mel`` (B, n_mels, T); masked spans -> 0.

    ``num_frames`` (B,) int32: valid mel frames per row (time masks stay
    inside real audio, matching the attention-mask-guided reference).
    Feature masks span the whole mel axis (always fully valid).
    """
    b, n_mels, t = mel.shape
    rng_t, rng_f = jax.random.split(rng)
    # HF gates purely on prob > 0 (_mask_input_features): prob == 0
    # disables the axis regardless of min_masks
    if cfg.mask_time_prob > 0.0:
        tmask = _axis_masks(
            rng_t, b, t, num_frames,
            prob=cfg.mask_time_prob, span=cfg.mask_time_length,
            min_masks=cfg.mask_time_min_masks,
        )
        mel = jnp.where(tmask[:, None, :], jnp.zeros((), mel.dtype), mel)
    if cfg.mask_feature_prob > 0.0:
        fmask = _axis_masks(
            rng_f, b, n_mels, jnp.full((b,), n_mels, jnp.int32),
            prob=cfg.mask_feature_prob, span=cfg.mask_feature_length,
            min_masks=cfg.mask_feature_min_masks,
        )
        mel = jnp.where(fmask[:, :, None], jnp.zeros((), mel.dtype), mel)
    return mel
